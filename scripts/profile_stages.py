"""Per-stage wall-clock on the real chip at bench shapes.

Times each phase of the flagship two_view_step separately (own jit each,
block_until_ready) to target optimization work.  Not a perfect model of
the fused program, but ranks the hot spots.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def textured(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 16, w // 16)).astype(np.float32)
    img = np.kron(img, np.ones((16, 16), np.float32))
    fine = rng.uniform(0, 1, (h, w)).astype(np.float32)
    return (180 * img + 40 * fine).astype(np.float32)


def bench_fn(name, fn, *args, iters=10):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp
    from mods_tpu.runtime import setup_cache
    setup_cache()
    from mods_tpu.config import CapacityParams, RansacParams
    from mods_tpu.pipeline import EngineConfig
    from mods_tpu.detectors.hessaff import detect_affine_keypoints
    from mods_tpu.descriptors.orientation import (detect_orientations,
                                                  rotate_shapes)
    from mods_tpu.descriptors.describe import extract_descriptor_patches
    from mods_tpu.descriptors.sift import compute_sift
    from mods_tpu.matching.fginn import duplicate_filter, match_fginn
    from mods_tpu.ransac.homography import ransac_h

    cfg = EngineConfig(
        caps=CapacityParams(per_octave=4096, per_view=2048,
                            per_image=4096, max_angles=2),
        ransac=RansacParams(batch_hypotheses=2048, max_rounds=2))

    h, w = 512, 640
    img = jnp.asarray(textured(h, w, 0))
    caps = cfg.caps
    valid_hw = jnp.asarray([[h, w]], jnp.int32)

    regs = bench_fn(
        "detect(hessaff)",
        lambda im: detect_affine_keypoints(im[None], valid_hw, cfg.pyramid,
                                           cfg.affine, caps), img)

    do = cfg.dom_ori
    M = caps.max_angles

    def orient(im, r):
        return detect_orientations(
            im, r.xy[0], r.A[0], r.s[0], r.mask[0],
            do.patch_extraction.mr_size, do.patch_extraction.patch_size,
            M, do.threshold)
    angles, amask = bench_fn("orientation", orient, img, regs)

    K = regs.capacity

    def expand(r, ang, am):
        Arot = rotate_shapes(r.A[0], ang)
        xy = jnp.repeat(r.xy[0][:, None], M, 1).reshape(K * M, 2)
        A = Arot.reshape(K * M, 2, 2)
        s = jnp.repeat(r.s[0][:, None], M, 1).reshape(K * M)
        m = am.reshape(K * M)
        return xy, A, s, m
    xy, A, s, m = jax.jit(expand)(regs, angles, amask)

    pe = cfg.sift.patch_extraction

    def patches_fn(im, xy, A, s):
        return extract_descriptor_patches(im, xy, A, s, pe.mr_size,
                                          pe.patch_size,
                                          photo_norm=pe.photo_norm)
    patches = bench_fn("describe-patches", patches_fn, img, xy, A, s)

    desc = bench_fn("sift", lambda p: compute_sift(p, cfg.sift), patches)

    d1 = desc
    d2 = jnp.roll(desc, 7, axis=0)
    xy2 = xy + 3.0

    def match(d1, m1, d2, m2, xy2):
        return match_fginn(d1, m1, d2, m2, xy2, cfg.match.ratio_threshold,
                           cfg.match.contrad_dist, cfg.match.knn)
    t = bench_fn("fginn-match", match, d1, m, d2, m, xy2)

    txy2 = xy2[t.idx2]

    def dup(xy1, txy2, mask):
        return duplicate_filter(xy1, txy2, mask, cfg.match.duplicate_dist)
    keep = bench_fn("duplicate-filter", dup, xy, txy2, t.mask)

    key = jax.random.PRNGKey(0)
    tmask = t.mask & keep
    bench_fn("ransac-H",
             lambda a, b, mm, k: ransac_h(a, b, mm, cfg.ransac, k),
             xy, txy2, tmask, key)


if __name__ == "__main__":
    main()
