"""Per-program wall-clock breakdown of steady-state cat pairs on the
real CVIU ladder, on the real chip, plus a sync-granularity experiment.

Finding this script exists to document (VERDICT r3 item 1): the axon
tunnel COLLAPSES under deep async dispatch queues — a free-running
pipelined pair took 800 s where the same pair with a block after every
dispatch took 15.6 s.  So we measure (a) per-program blocked time by
qualname, (b) pair latency at three sync granularities."""
import collections
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

TIMINGS = collections.defaultdict(float)
COUNTS = collections.Counter()
MODE = ["free"]          # "free" | "block"

_orig_jit = jax.jit
def timing_jit(fn, *a, **k):
    prog = _orig_jit(fn, *a, **k)
    name = getattr(fn, "__qualname__", getattr(fn, "__name__", str(fn)))
    import functools
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if MODE[0] != "block":
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

MODE[0] = "block"   # warmup with blocking: keeps the tunnel queue sane
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
TIMINGS.clear(); COUNTS.clear()

results = {}
# per-dispatch blocking, 2 pairs (also collects the per-program table)
t0 = time.perf_counter()
for i in (1, 2):
    res = matcher.match(img1 + 0.25 * i, img2 + 0.25 * i)
results["block_per_dispatch_s"] = round((time.perf_counter() - t0) / 2, 2)
print(f"block-per-dispatch pair: {results['block_per_dispatch_s']} s "
      f"({res.n_matches} matches)", flush=True)

rows = sorted(TIMINGS.items(), key=lambda kv: -kv[1])
acc = sum(TIMINGS.values())
print(f"\n{'program':<44}{'calls':>6}{'total_s':>9}{'ms/call':>9}")
for name, t in rows:
    print(f"{name:<44}{COUNTS[name]:>6}{t:>9.2f}{t/COUNTS[name]*1e3:>9.1f}")
print(f"{'SUM(blocked, 2 pairs)':<44}{sum(COUNTS.values()):>6}{acc:>9.2f}",
      flush=True)

# sync stop mode (one scalar read per rung, otherwise free-running)
MODE[0] = "free"
msync = TwoViewMatcher(ladder, cfg, stop_mode="sync")
msync._prep_cache = matcher._prep_cache
res = msync.match(img1 + 0.33, img2 + 0.33)   # warm any sync-mode progs
t0 = time.perf_counter()
res = msync.match(img1 + 0.75, img2 + 0.75)
results["sync_stop_s"] = round(time.perf_counter() - t0, 2)
print(f"sync-stop pair: {results['sync_stop_s']} s ({res.n_matches})",
      flush=True)

# free-running pipelined (the r3 production mode)
t0 = time.perf_counter()
res = matcher.match(img1 + 0.5, img2 + 0.5)
results["free_pipelined_s"] = round(time.perf_counter() - t0, 2)
print(f"free-pipelined pair: {results['free_pipelined_s']} s "
      f"({res.n_matches} matches)", flush=True)

results["programs"] = [
    {"name": n, "calls": COUNTS[n], "total_s": round(t, 3),
     "ms_per_call": round(t / COUNTS[n] * 1e3, 1)} for n, t in rows]
with open("/root/repo/PROFILE_ladder.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote PROFILE_ladder.json")
