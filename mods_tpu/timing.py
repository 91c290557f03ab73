"""Phase-level wall-clock ledger.

Reference: `TimeLog` (detectors/structures.hpp:51-74) with phases
Synth/Detect/Orient/Desc/SCV/Match/RANSAC/Misc/Total, written by
WriteTimeLog (io_mods.cpp:69-102).  Device work is timed around
block_until_ready at phase boundaries; `jax.profiler` traces can be
layered on top for kernel-level detail.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

PHASES = ("SynthTime", "DetectTime", "OrientTime", "DescTime", "SCVTime",
          "MatchingTime", "RANSACTime", "MiscTime", "TotalTime")


@dataclass
class TimeLog:
    times: dict = field(default_factory=lambda: {p: 0.0 for p in PHASES})

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0

    def add(self, name: str, dt: float):
        self.times[name] += dt

    def finalize(self):
        known = sum(v for k, v in self.times.items()
                    if k not in ("TotalTime", "MiscTime"))
        if self.times["TotalTime"] == 0.0:
            self.times["TotalTime"] = known + self.times["MiscTime"]
        else:
            self.times["MiscTime"] = max(
                0.0, self.times["TotalTime"] - known)
        return self

    def summary(self) -> str:
        t = self.times
        total = max(t["TotalTime"], 1e-9)
        lines = ["Timings: (sec/%)"]
        for p in PHASES:
            lines.append(f"{p[:-4]}: {t[p]:.3f} ({100.0 * t[p] / total:.1f}%)")
        return "\n".join(lines)
