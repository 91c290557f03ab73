"""On-chip: (a) reference-style phase breakdown of the cat ladder via
the split path (sync_timing), (b) per-append compacted-row counts to
right-size CapacityParams, (c) native-MSER host detect wall time."""
import sys, time, collections
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import numpy as np
from PIL import Image
import jax
from mods_tpu.cli import _build_engine
from mods_tpu import pipeline
from mods_tpu.pipeline import TwoViewMatcher, DeviceStore

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
print("caps:", cfg.caps, flush=True)

# (c) time the native MSER host stage
from mods_tpu.detectors import mser as mser_mod
orig_det = mser_mod.detect_msers_padded
mser_t = [0.0, 0]
def timed_det(*a, **k):
    t0 = time.perf_counter()
    out = orig_det(*a, **k)
    mser_t[0] += time.perf_counter() - t0
    mser_t[1] += 1
    return out
mser_mod.detect_msers_padded = timed_det

m = TwoViewMatcher(ladder, cfg, sync_timing=True, stop_mode="sync")
for attempt in range(8):
    try:
        t0 = time.perf_counter()
        res = m.match(img1, img2)
        break
    except jax.errors.JaxRuntimeError as e:
        if "INTERNAL" not in str(e) or attempt == 7:
            raise
        print("retry:", str(e)[:90], file=sys.stderr)
print(f"warmup(split): {time.perf_counter()-t0:.1f} s "
      f"({res.n_matches} m, {res.steps_used} steps)", flush=True)
mser_t[0] = 0.0; mser_t[1] = 0
t0 = time.perf_counter()
res = m.match(img1 + 0.25, img2 + 0.25)
tot = time.perf_counter() - t0
print(f"steady(split,synced): {tot:.1f} s ({res.n_matches} m)")
for k, v in sorted(res.log.times.items()):
    print(f"  {k:>14}: {v:8.2f} s")
print(f"native MSER host detect: {mser_t[0]:.2f} s over {mser_t[1]} views")

