"""Discriminate the in-process dispatch slowdown: is a TRIVIAL program
also slow after ladder warmup?  Does deleting live buffers help?"""
import gc
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

def time_tiny(tag, n=20):
    xs = [jax.block_until_ready(jnp.asarray(
        np.full((128,), i + time.time() % 1000, np.float32)))
        for i in range(n)]
    t0 = time.perf_counter()
    for x in xs:
        jax.block_until_ready(tiny(x))
    print(f"tiny dispatch {tag}: {(time.perf_counter()-t0)/n*1e3:.1f} ms",
          flush=True)

time_tiny("before warmup")

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
m = TwoViewMatcher(ladder, cfg, stop_mode="sync")
for attempt in range(8):
    try:
        res = m.match(img1, img2)
        break
    except jax.errors.JaxRuntimeError as e:
        if "INTERNAL" not in str(e) or attempt == 7:
            raise
print(f"warmed ({res.n_matches} m)", flush=True)

time_tiny("after warmup")
n_live = sum(1 for _ in jax.live_arrays())
print("live arrays:", n_live, flush=True)

# drop the matcher's device state and try again
del m, res
gc.collect()
n_live = sum(1 for _ in jax.live_arrays())
print("live arrays after del:", n_live, flush=True)
time_tiny("after del matcher")
