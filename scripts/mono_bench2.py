"""Monolith on the real chip, with automatic fallback to 3 segments if
the full-ladder program faults."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")

def run(segments):
    m = TwoViewMatcher(ladder, cfg, monolith=True,
                       monolith_segments=segments)
    t0 = time.perf_counter()
    for attempt in range(4):
        try:
            res = m.match(img1, img2)
            break
        except jax.errors.JaxRuntimeError as e:
            print(f"seg={segments} attempt {attempt}: {str(e)[:90]}",
                  file=sys.stderr, flush=True)
            if attempt == 3 or "INTERNAL" not in str(e):
                raise
    print(f"warmup seg={segments}: {time.perf_counter()-t0:.1f} s "
          f"({res.n_matches} m, {res.steps_used} steps)", flush=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        a = img1 + rng.uniform(0, 0.5, img1.shape).astype(np.float32)
        b = img2 + rng.uniform(0, 0.5, img2.shape).astype(np.float32)
        t0 = time.perf_counter()
        res = m.match(a, b)
        print(f"seg={segments} pair {i}: {time.perf_counter()-t0:6.2f} s"
              f" ({res.n_matches} m, {res.steps_used} steps)", flush=True)

try:
    run(1)
except Exception as e:
    print(f"full monolith failed: {str(e)[:140]}", flush=True)
    run(3)
