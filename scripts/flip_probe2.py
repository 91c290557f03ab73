"""Bisect the slow-mode flip across ladder rungs."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher

@jax.jit
def tiny(x):
    return x * 1.0001 + 0.5

seq = [0]
def time_tiny(tag, n=12):
    xs = []
    for i in range(n):
        seq[0] += 1
        xs.append(jax.block_until_ready(jnp.asarray(
            np.full((128,), seq[0] * 1.37, np.float32))))
    t0 = time.perf_counter()
    for x in xs:
        jax.block_until_ready(tiny(x))
    print(f"tiny after {tag:<24}: "
          f"{(time.perf_counter()-t0)/n*1e3:6.1f} ms", flush=True)

jax.block_until_ready(tiny(jnp.zeros((128,))))
time_tiny("start")

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")

for k in (1, 2, 3, 4, 5):
    m = TwoViewMatcher(ladder[:k], cfg, stop_mode="sync")
    for attempt in range(8):
        try:
            res = m.match(img1, img2)
            break
        except jax.errors.JaxRuntimeError as e:
            if "INTERNAL" not in str(e) or attempt == 7:
                raise
    dets = [d.detector for r in
            __import__("mods_tpu.config", fromlist=["as_rungs"])
            .as_rungs(ladder[:k]) for d in r.dets]
    time_tiny(f"rungs<={k} ({dets[-1]})")
    # steady-pair timing at this truncation
    t0 = time.perf_counter()
    res = m.match(img1 + 0.3 * k, img2 + 0.3 * k)
    print(f"   steady pair k={k}: {time.perf_counter()-t0:5.1f} s "
          f"({res.n_matches} m)", flush=True)
