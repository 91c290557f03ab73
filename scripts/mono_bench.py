"""Monolith ladder program on the real chip: compile, verify cat
quality, measure steady-state pairs."""
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
m = TwoViewMatcher(ladder, cfg, monolith=True)
t0 = time.perf_counter()
for attempt in range(8):
    try:
        res = m.match(img1, img2)
        break
    except jax.errors.JaxRuntimeError as e:
        if attempt == 7 or not any(t in str(e) for t in ("INTERNAL", "UNAVAILABLE")):
            raise
        print("retry:", str(e)[:90], file=sys.stderr, flush=True)
print(f"warmup(monolith): {time.perf_counter()-t0:.1f} s "
      f"({res.n_matches} m, {res.steps_used} steps, "
      f"{res.n_tentatives} tents)", flush=True)
rng = np.random.default_rng(0)
for i in range(8):
    a = img1 + rng.uniform(0, 0.5, img1.shape).astype(np.float32)
    b = img2 + rng.uniform(0, 0.5, img2.shape).astype(np.float32)
    t0 = time.perf_counter()
    res = m.match(a, b)
    print(f"pair {i}: {time.perf_counter()-t0:6.2f} s "
          f"({res.n_matches} m, {res.steps_used} steps)", flush=True)
