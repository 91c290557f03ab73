"""Feature save/load in the reference's text formats — the framework's
checkpoint/import layer (SURVEY.md §5.4).

Formats:
  * native MODS hierarchical keypoint file (`SaveRegions`/`LoadRegions`,
    imagerepresentation.cpp:2139-2215; per-region record `saveAR` :89-99
    with two `saveKP` keypoint blocks det_kp/reproj_kp
    x y a11 a12 a21 a22 pyramid_scale octave_number s sub_type).
  * match list `x1 y1 x2 y2 [extra]` (`WriteMatchings`,
    matching.cpp:2923-2982) and 3x3 H/F files (`WriteH`).
"""

from __future__ import annotations

import numpy as np


class RegionSet:
    """Host-side region bundle for one (detector, descriptor) pair."""

    def __init__(self, det_xy, det_A, det_s, reproj_xy, reproj_A,
                 reproj_s, sub_type, desc):
        self.det_xy = np.asarray(det_xy, np.float64)
        self.det_A = np.asarray(det_A, np.float64)
        self.det_s = np.asarray(det_s, np.float64)
        self.reproj_xy = np.asarray(reproj_xy, np.float64)
        self.reproj_A = np.asarray(reproj_A, np.float64)
        self.reproj_s = np.asarray(reproj_s, np.float64)
        self.sub_type = np.asarray(sub_type, np.int64)
        self.desc = np.asarray(desc, np.float64)

    @property
    def n(self):
        return self.det_xy.shape[0]


def _fmt(x: float) -> str:
    return f"{x:.10g}"


def save_regions(path: str,
                 store: dict[str, dict[str, RegionSet]]) -> None:
    """store: {detector: {descriptor: RegionSet}}."""
    with open(path, "w") as f:
        f.write(f"{len(store)}\n")
        for det, descs in store.items():
            f.write(f"{det} {len(descs)}\n")
            for desc_name, rs in descs.items():
                f.write(f"{desc_name} {rs.n}\n")
                dim = rs.desc.shape[1] if rs.n else 0
                f.write(f"{dim}\n")
                for i in range(rs.n):
                    rec = [i, 0, 0, -1]
                    for xy, A, s in ((rs.det_xy, rs.det_A, rs.det_s),
                                     (rs.reproj_xy, rs.reproj_A,
                                      rs.reproj_s)):
                        rec += [xy[i, 0], xy[i, 1],
                                A[i, 0, 0], A[i, 0, 1],
                                A[i, 1, 0], A[i, 1, 1],
                                1.0, 0, s[i], int(rs.sub_type[i])]
                    rec += [dim]
                    rec += list(rs.desc[i])
                    f.write(" ".join(_fmt(v) if isinstance(v, float)
                                     else str(v) for v in rec) + "\n")


def load_regions(path: str) -> dict[str, dict[str, RegionSet]]:
    with open(path) as f:
        tok = f.read().split()
    pos = 0

    def nxt():
        nonlocal pos
        v = tok[pos]
        pos += 1
        return v

    out: dict[str, dict[str, RegionSet]] = {}
    n_det = int(nxt())
    for _ in range(n_det):
        det = nxt()
        n_desc = int(nxt())
        out[det] = {}
        for _ in range(n_desc):
            desc_name = nxt()
            n_kp = int(nxt())
            dim = int(nxt())
            det_xy = np.zeros((n_kp, 2))
            det_A = np.zeros((n_kp, 2, 2))
            det_s = np.zeros(n_kp)
            rep_xy = np.zeros((n_kp, 2))
            rep_A = np.zeros((n_kp, 2, 2))
            rep_s = np.zeros(n_kp)
            st = np.zeros(n_kp, np.int64)
            desc = np.zeros((n_kp, dim))
            for i in range(n_kp):
                nxt(); nxt(); nxt(); nxt()  # id img_id reproj_id parent
                for xy, A, s_arr, st_arr in (
                        (det_xy, det_A, det_s, st),
                        (rep_xy, rep_A, rep_s, None)):
                    xy[i, 0] = float(nxt())
                    xy[i, 1] = float(nxt())
                    A[i, 0, 0] = float(nxt())
                    A[i, 0, 1] = float(nxt())
                    A[i, 1, 0] = float(nxt())
                    A[i, 1, 1] = float(nxt())
                    nxt()  # pyramid_scale
                    nxt()  # octave_number
                    s_arr[i] = float(nxt())
                    t = int(float(nxt()))
                    if st_arr is not None:
                        st_arr[i] = t
                d = int(nxt())
                for j in range(d):
                    desc[i, j] = float(nxt())
            out[det][desc_name] = RegionSet(
                det_xy, det_A, det_s, rep_xy, rep_A, rep_s, st, desc)
    return out


def write_matches(path: str, xy1: np.ndarray, xy2: np.ndarray,
                  extra: np.ndarray | None = None) -> None:
    """`WriteMatchings` format: one line per match `x1 y1 x2 y2 [extra]`
    (matching.cpp:2923-2982), preceded by the match count."""
    with open(path, "w") as f:
        f.write(f"{xy1.shape[0]}\n")
        for i in range(xy1.shape[0]):
            line = (f"{xy1[i, 0]:.10g} {xy1[i, 1]:.10g} "
                    f"{xy2[i, 0]:.10g} {xy2[i, 1]:.10g}")
            if extra is not None:
                line += f" {extra[i]:.10g}"
            f.write(line + "\n")


def read_matches(path: str):
    data = np.loadtxt(path, skiprows=1, ndmin=2)
    return data[:, :2], data[:, 2:4]


def write_h(path: str, H: np.ndarray) -> None:
    """3x3 matrix text file (`WriteH`, matching.cpp:3049)."""
    np.savetxt(path, np.asarray(H).reshape(3, 3), fmt="%.10g")


def read_h(path: str) -> np.ndarray:
    return np.loadtxt(path).reshape(3, 3)
