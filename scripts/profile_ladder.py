"""Per-program wall-clock breakdown of ONE steady-state cat pair on the
real CVIU ladder, on the real chip.

Monkeypatches jax.jit so every compiled-program call can be timed with a
block_until_ready after it (only enabled after a full warmup pair), then
prints a sorted per-program total — the committed evidence for where
the pair's seconds actually go (VERDICT r3 item 1)."""
import collections
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

TIMINGS = collections.defaultdict(float)
COUNTS = collections.Counter()
ENABLED = [False]

_orig_jit = jax.jit
def timing_jit(fn, *a, **k):
    prog = _orig_jit(fn, *a, **k)
    name = getattr(fn, "__name__", str(fn))
    import functools
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not ENABLED[0]:
            return prog(*args, **kwargs)
        t0 = time.perf_counter()
        out = prog(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        TIMINGS[name] += dt
        COUNTS[name] += 1
        return out
    wrapper.lower = prog.lower
    return wrapper
jax.jit = timing_jit

from mods_tpu.runtime import setup_cache
setup_cache()
import numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
matcher = TwoViewMatcher(ladder, cfg, stop_mode="pipelined")

for attempt in range(8):
    try:
        t0 = time.perf_counter()
        res = matcher.match(img1, img2)
        break
    except jax.errors.JaxRuntimeError as e:
        if "INTERNAL" not in str(e) or attempt == 7:
            raise
        print(f"warmup retry: {str(e)[:100]}", file=sys.stderr)
print(f"warmup pair: {time.perf_counter()-t0:.1f} s  "
      f"({res.n_matches} matches, {res.steps_used} steps)", flush=True)

# un-instrumented steady pair for the honest total
t0 = time.perf_counter()
res = matcher.match(img1 + 0.25, img2 + 0.25)
steady = time.perf_counter() - t0
print(f"steady pair (no instrumentation): {steady:.1f} s "
      f"({res.n_matches} matches, {res.steps_used} steps)", flush=True)

# instrumented pair: every dispatch blocked + timed
ENABLED[0] = True
t0 = time.perf_counter()
res = matcher.match(img1 + 0.5, img2 + 0.5)
total = time.perf_counter() - t0
ENABLED[0] = False
print(f"instrumented pair: {total:.1f} s\n")
rows = sorted(TIMINGS.items(), key=lambda kv: -kv[1])
acc = sum(TIMINGS.values())
print(f"{'program':<22}{'calls':>7}{'total_s':>10}{'ms/call':>10}")
for name, t in rows:
    print(f"{name:<22}{COUNTS[name]:>7}{t:>10.2f}{t/COUNTS[name]*1e3:>10.1f}")
print(f"{'SUM(blocked)':<22}{sum(COUNTS.values()):>7}{acc:>10.2f}")
print(f"python/host overhead: {total-acc:.2f} s")
with open("/root/repo/PROFILE_ladder.json", "w") as f:
    json.dump({"steady_pair_s": round(steady, 2),
               "instrumented_pair_s": round(total, 2),
               "programs": [
                   {"name": n, "calls": COUNTS[n], "total_s": round(t, 3)}
                   for n, t in rows]}, f, indent=1)
print("wrote PROFILE_ladder.json")
