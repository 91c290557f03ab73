"""Parity evidence beyond the cat pair (VERDICT r3 item 5).

Runs BOTH the reference binary and mods_tpu over:
  * the bundled cat pair (approximate GT homography cat.txt), and
  * four synthetic extreme pairs derived from cat.png with EXACT GT H
    (tilt 4, tilt 6 + 45 deg, 90 deg rotation, 2x zoom),
under the CVIU ladder and the WxBS ladder
(build/iters_mods_cviu{,_wxbs}.ini + their configs).

Emits PARITY.md with the side-by-side table: verified matches,
GT-true matches (Sampson <= threshold vs GT H), tentatives, steps.

Usage: python scripts/parity_suite.py [--ours-only|--ref-only]
(ours needs the TPU; the reference runs on CPU — run phases separately
if the chip is busy.)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REF = "/root/reference/build"
RB = "/root/repo/.refbuild"
OUT = "/root/repo/.parity_work"
GT_THR = 3.0

LADDERS = {
    "cviu": (f"{REF}/config_iter_mods_cviu.ini",
             f"{REF}/iters_mods_cviu.ini"),
    "wxbs": (f"{REF}/config_iter_mods_cviu_wxbs.ini",
             f"{REF}/iters_mods_cviu_wxbs.ini"),
}


def _warp_pair(img, H, out_h, out_w):
    """Exact-GT synthetic second view: bilinear warp under H."""
    from scipy import ndimage
    Hi = np.linalg.inv(H)

    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    den = Hi[2, 0] * xs + Hi[2, 1] * ys + Hi[2, 2]
    sx = (Hi[0, 0] * xs + Hi[0, 1] * ys + Hi[0, 2]) / den
    sy = (Hi[1, 0] * xs + Hi[1, 1] * ys + Hi[1, 2]) / den
    out = ndimage.map_coordinates(img, [sy, sx], order=1, cval=128.0)
    return out.astype(np.float32)


def make_pairs():
    from PIL import Image
    os.makedirs(OUT, exist_ok=True)
    cat = np.asarray(Image.open(f"{REF}/examples/cat.png").convert("L"),
                     np.float32)
    h, w = cat.shape
    cx, cy = w / 2.0, h / 2.0

    def about_center(M):
        T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
        T2 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
        return T2 @ M @ T1

    def rot(deg):
        c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    def bbox_crop(M):
        """Translate M so the warped image content fills the output
        canvas (no synthetic gray flanks), return (H, out_h, out_w)."""
        corners = np.array([[0, 0, 1], [w, 0, 1], [0, h, 1], [w, h, 1]],
                           np.float64)
        p = (M @ corners.T).T
        p = p[:, :2] / p[:, 2:3]
        mn = p.min(0)
        mx = p.max(0)
        T = np.array([[1, 0, -mn[0]], [0, 1, -mn[1]], [0, 0, 1.0]])
        return (T @ M, int(np.ceil(mx[1] - mn[1])),
                int(np.ceil(mx[0] - mn[0])))

    pairs = {}
    # cat (the reference's own smoke pair, approximate GT)
    pairs["cat"] = (f"{REF}/examples/cat.png", f"{REF}/examples/cat2.png",
                    np.loadtxt(f"{REF}/examples/cat.txt").reshape(3, 3))
    specs = {
        "tilt4": bbox_crop(np.diag([0.25, 1.0, 1.0])),
        "tilt6_rot45": bbox_crop(np.diag([1 / 6.0, 1.0, 1.0]) @ rot(45)),
        "rot90": bbox_crop(rot(90)),
        # zoom-in: central quarter magnified, full-content canvas
        "zoom2x": (about_center(np.diag([2.0, 2.0, 1.0])), h, w),
    }
    for name, (H, oh, ow) in specs.items():
        img2 = _warp_pair(cat, H, oh, ow)
        p1 = f"{OUT}/{name}_1.png"
        p2 = f"{OUT}/{name}_2.png"
        Image.fromarray(cat.astype(np.uint8)).save(p1)
        Image.fromarray(np.clip(img2, 0, 255).astype(np.uint8)).save(p2)
        np.savetxt(f"{OUT}/{name}_H.txt", H)
        pairs[name] = (p1, p2, H)
    return pairs


def gt_true_count(xy1, xy2, H, thr=2 * GT_THR):
    """Symmetric-transfer check vs GT H at `thr` px (the bundled cat.txt
    H is approximate — true matches carry ~4.4 px median forward error —
    so the cat pair uses a laxer 12 px band; exact synthetic GTs use
    6 px)."""
    if len(xy1) == 0:
        return 0
    ones = np.ones((len(xy1), 1))
    p1 = np.hstack([xy1, ones])
    fw = (H @ p1.T).T
    fw = fw[:, :2] / fw[:, 2:3]
    Hi = np.linalg.inv(H)
    p2 = np.hstack([xy2, ones])
    bw = (Hi @ p2.T).T
    bw = bw[:, :2] / bw[:, 2:3]
    err = np.maximum(np.linalg.norm(fw - xy2, axis=1),
                     np.linalg.norm(bw - xy1, axis=1))
    return int((err <= thr).sum())


def run_reference(pairs):
    res = {}
    run = f"{RB}/run_parity"
    os.makedirs(run, exist_ok=True)
    for lname, (config, iters) in LADDERS.items():
        for pname, (p1, p2, H) in pairs.items():
            np.savetxt(f"{run}/gt.txt", H)
            log = f"{run}/log.txt"
            for stale in (log, f"{run}/m.txt"):
                if os.path.exists(stale):
                    os.remove(stale)
            t0 = time.time()
            proc = subprocess.run(
                [f"{RB}/b/mods", p1, p2, "o1.png", "o2.png", "k1.txt",
                 "k2.txt", "m.txt", "log.txt", "0", "0", "gt.txt",
                 config, iters],
                cwd=run, capture_output=True, timeout=1200)
            dt = time.time() - t0
            crashed = proc.returncode != 0
            row = {}
            try:
                # log.txt (io_mods.cpp:10-68): "total_s true tents
                # inlier% regs1 regs2 steps"
                v = open(log).read().split()
                row = dict(n_matches=int(v[1]), n_tentatives=int(v[2]),
                           steps=int(v[6]), ref_total_s=float(v[0]))
            except (OSError, ValueError, IndexError):
                row = dict(n_matches=0)
            # matchings file: x1 y1 x2 y2 rows, no header
            xy = np.zeros((0, 4))
            try:
                xy = np.loadtxt(f"{run}/m.txt", ndmin=2)
            except (OSError, ValueError):
                pass
            row.update(wall_s=round(dt, 2), crashed=crashed,
                       gt_true=gt_true_count(
                           xy[:, :2], xy[:, 2:4], H,
                           12.0 if pname == "cat" else 6.0)
                       if len(xy) else 0)
            res[(lname, pname)] = row
            print(f"ref {lname}/{pname}: {row['n_matches']} matches, "
                  f"{row['gt_true']} GT-true, {dt:.1f} s"
                  f"{' [CRASHED]' if crashed else ''}", flush=True)
    return res


def run_ours(pairs):
    only = None
    for a in sys.argv:
        if a.startswith("--pairs="):
            only = set(a.split("=", 1)[1].split(","))
    ladders_sel = None
    for a in sys.argv:
        if a.startswith("--ladders="):
            ladders_sel = set(a.split("=", 1)[1].split(","))
    from mods_tpu.runtime import setup_cache
    setup_cache()
    import jax
    from PIL import Image
    from mods_tpu.cli import _build_engine
    from mods_tpu.config import CapacityParams, replace
    from mods_tpu.pipeline import TwoViewMatcher
    res = {}
    for lname, (config, iters) in LADDERS.items():
        if ladders_sel and lname not in ladders_sel:
            continue
        # capacities derive from the INI's region-number modes inside
        # _build_engine (autosize_caps) — no manual bumps
        cfg, ladder = _build_engine(config, iters, ver_type="LORANSACH")
        if lname == "wxbs":
            assert cfg.caps.per_group >= 3072, cfg.caps
        m = TwoViewMatcher(ladder, cfg, stop_mode="sync")
        for pname, (p1, p2, H) in pairs.items():
            if only and pname not in only:
                continue
            i1 = np.asarray(Image.open(p1).convert("L"), np.float32)
            i2 = np.asarray(Image.open(p2).convert("L"), np.float32)
            t0 = time.time()
            for attempt in range(6):
                try:
                    r = m.match(i1, i2)
                    break
                except jax.errors.JaxRuntimeError as e:
                    if "INTERNAL" not in str(e) or attempt == 5:
                        raise
            dt = time.time() - t0
            row = dict(
                n_matches=int(r.n_matches),
                n_tentatives=int(r.n_tentatives),
                steps=int(r.steps_used), wall_s=round(dt, 2),
                gt_true=gt_true_count(r.xy1, r.xy2, H,
                      12.0 if pname == 'cat' else 6.0))
            res[(lname, pname)] = row
            print(f"ours {lname}/{pname}: {row['n_matches']} matches, "
                  f"{row['gt_true']} GT-true, {row['steps']} steps, "
                  f"{dt:.1f} s", flush=True)
    return res


def write_table(ref, ours):
    lines = ["# PARITY — reference binary vs mods_tpu",
             "",
             f"GT-true = symmetric transfer error <= {2*GT_THR} px vs the"
             " pair's GT homography (exact for synthetic pairs, the"
             " bundled approximate cat.txt for cat).",
             "",
             "ref crashes are the reference binary aborting (OpenCV-4"
             " FLANN assert on low-region synthetic pairs); 'ours s'"
             " includes one-time program compiles when shapes are new.",
             "",
             "| ladder | pair | ref matches | ref GT-true | ours matches"
             " | ours GT-true | ours tents | ours steps | ref s | ours s |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for key in sorted(set(ref) | set(ours)):
        r = ref.get(key, {})
        o = ours.get(key, {})
        if r.get("crashed"):
            r = dict(r, n_matches="crash", gt_true="crash")
        lines.append(
            f"| {key[0]} | {key[1]} | {r.get('n_matches', '-')} | "
            f"{r.get('gt_true', '-')} | {o.get('n_matches', '-')} | "
            f"{o.get('gt_true', '-')} | {o.get('n_tentatives', '-')} | "
            f"{o.get('steps', '-')} | {r.get('wall_s', '-')} | "
            f"{o.get('wall_s', '-')} |")
    with open("/root/repo/PARITY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARITY.md")


def main():
    pairs = make_pairs()
    ref = {}
    ours = {}
    if "--ours-only" not in sys.argv:
        ref = run_reference(pairs)
        with open(f"{OUT}/ref.json", "w") as f:
            json.dump({f"{a}/{b}": v for (a, b), v in ref.items()}, f)
    elif os.path.exists(f"{OUT}/ref.json"):
        ref = {tuple(k.split("/")): v for k, v in
               json.load(open(f"{OUT}/ref.json")).items()}
    if "--ref-only" not in sys.argv:
        if os.path.exists(f"{OUT}/ours.json"):
            ours = {tuple(k.split("/")): v for k, v in
                    json.load(open(f"{OUT}/ours.json")).items()}
        ours.update(run_ours(pairs))
        with open(f"{OUT}/ours.json", "w") as f:
            json.dump({f"{a}/{b}": v for (a, b), v in ours.items()}, f)
    write_table(ref, ours)


if __name__ == "__main__":
    main()
