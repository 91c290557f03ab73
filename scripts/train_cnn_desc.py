"""Train the CNN patch descriptor's default weights (CPU torch).

The net mirrors mods_tpu/descriptors/cnn.py exactly: x=(p-114.67)/128 ->
conv5x5(16) VALID -> relu -> maxpool2 -> conv5x5(32) VALID -> relu ->
maxpool2 -> conv5x5(128) VALID (global head for 32px patches) -> L2.
Training: batch-hard triplet loss on affine+photometric-warped patch
pairs sampled from the reference's example images plus procedural
textures — the standard local-descriptor recipe (cf. the Caffe nets the
reference loads at imagerepresentation.cpp:1343-1534).

Writes mods_tpu/data/cnn_patch128.npz (keys w1,b1,w2,b2,w3,b3, OIHW).
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import cv2
import torch
import torch.nn as nn
import torch.nn.functional as F

P = 32
DIM = 128
MEAN_GRAY = (104.0 + 117.0 + 123.0) / 3.0


def source_images():
    imgs = []
    for f in ("cat.png", "cat2.png", "graf.png"):
        try:
            im = cv2.imread(f"/root/reference/build/examples/{f}",
                            cv2.IMREAD_GRAYSCALE)
            if im is not None:
                imgs.append(im.astype(np.float32))
        except Exception:
            pass
    rng = np.random.default_rng(0)
    for s in range(4):
        base = rng.uniform(0, 255, (40, 40)).astype(np.float32)
        img = cv2.resize(base, (640, 640), interpolation=cv2.INTER_CUBIC)
        img += cv2.resize(rng.uniform(-40, 40, (160, 160)).astype(
            np.float32), (640, 640), interpolation=cv2.INTER_CUBIC)
        imgs.append(np.clip(img, 0, 255))
    return imgs


def sample_pair(rng, img, x, y):
    """Two P x P patches of the same point under different affine +
    photometric warps (support radius ~3x patch like mrSize~12/32*s).

    The pipeline feeds the CNN orientation-NORMALIZED patches (fam
    'sift' routing in _make_desc_fn), so the relative rotation between
    pair members is limited to the orientation-assignment residual
    (~±12°); the base orientation still varies freely across pairs."""
    out = []
    th_base = rng.uniform(0, 2 * np.pi)
    for _ in range(2):
        th = th_base + rng.uniform(-0.2, 0.2)
        sc = np.exp(rng.uniform(-0.35, 0.35))
        ani = np.exp(rng.uniform(-0.2, 0.2))
        sup = 20.0 * sc                       # source half-extent px
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s], [s, c]])
        A = R @ np.diag([sup * ani, sup / ani]) / (P / 2)
        jx, jy = rng.uniform(-1, 1, 2)
        M = np.zeros((2, 3), np.float32)
        Minv = np.linalg.inv(np.vstack([np.hstack([A, [[x + jx], [y + jy]]]),
                                        [0, 0, 1]]))
        # cv2 warpAffine maps dst->src with WARP_INVERSE_MAP
        shift = np.array([[1, 0, P / 2], [0, 1, P / 2], [0, 0, 1]])
        Mfull = np.linalg.inv(shift @ Minv)[:2]
        p = cv2.warpAffine(img, Mfull.astype(np.float32), (P, P),
                           flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                           borderMode=cv2.BORDER_REPLICATE)
        gain = np.exp(rng.uniform(-0.3, 0.3))
        bias = rng.uniform(-25, 25)
        p = np.clip(p * gain + bias + rng.normal(0, 3, p.shape), 0, 255)
        out.append(p.astype(np.float32))
    return out


class Net(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 16, 5)
        self.c2 = nn.Conv2d(16, 32, 5)
        self.c3 = nn.Conv2d(32, DIM, 5)

    def forward(self, x):
        x = (x - MEAN_GRAY) / 128.0
        x = F.max_pool2d(F.relu(self.c1(x)), 2)
        x = F.max_pool2d(F.relu(self.c2(x)), 2)
        v = self.c3(x).flatten(1)
        return F.normalize(v, dim=1)


def main(steps=1500, batch=192, seed=3):
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    imgs = source_images()
    print(f"{len(imgs)} source images")
    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=4e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, steps)
    margin = 1.0
    for it in range(steps):
        a_list, b_list = [], []
        for _ in range(batch):
            img = imgs[rng.integers(len(imgs))]
            h, w = img.shape
            x = rng.uniform(60, w - 60)
            y = rng.uniform(60, h - 60)
            pa, pb = sample_pair(rng, img, x, y)
            a_list.append(pa)
            b_list.append(pb)
        a = torch.from_numpy(np.stack(a_list)[:, None])
        b = torch.from_numpy(np.stack(b_list)[:, None])
        da = net(a)
        db = net(b)
        # batch-hard triplet on the (B, B) distance matrix
        d = torch.cdist(da, db)
        pos = d.diagonal()
        big = torch.eye(batch) * 10.0
        hn = torch.minimum((d + big).min(1).values, (d + big).min(0).values)
        # contrastive hinge (not plain triplet: its pos==hn==0 collapse
        # is a saddle Adam falls into): pull positives to 0, push the
        # batch-hard negative past the margin
        loss = (pos ** 2).mean() + (F.relu(margin - hn) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if it % 100 == 0 or it == steps - 1:
            with torch.no_grad():
                acc = (d.argmin(1) == torch.arange(batch)).float().mean()
            print(f"it {it:5d} loss {loss.item():.4f} "
                  f"pos {pos.mean().item():.3f} hn {hn.mean().item():.3f} "
                  f"nn-acc {acc.item():.3f}", flush=True)
    import os
    os.makedirs("/root/repo/mods_tpu/data", exist_ok=True)
    np.savez(
        "/root/repo/mods_tpu/data/cnn_patch128.npz",
        w1=net.c1.weight.detach().numpy(), b1=net.c1.bias.detach().numpy(),
        w2=net.c2.weight.detach().numpy(), b2=net.c2.bias.detach().numpy(),
        w3=net.c3.weight.detach().numpy(), b3=net.c3.bias.detach().numpy())
    print("saved mods_tpu/data/cnn_patch128.npz")


if __name__ == "__main__":
    main()
