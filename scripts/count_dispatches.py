"""Count compiled-program dispatches + host->device transfers for ONE
cat pair on the real CVIU ladder (CPU backend — structure only).

The tunnel's per-dispatch/per-transfer latency times these counts is the
serving-latency floor; this script tells us what to merge/batch."""
import os, sys, collections, time
os.environ["JAX_PLATFORMS"] = "cpu"
for k in list(os.environ):
    if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
        del os.environ[k]
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

calls = collections.Counter()
transfers = collections.Counter()
in_call = [False]

_orig_jit = jax.jit
def counting_jit(fn, *a, **k):
    prog = _orig_jit(fn, *a, **k)
    name = getattr(fn, "__name__", str(fn))
    import functools
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        calls[name] += 1
        return prog(*args, **kwargs)
    wrapper.lower = prog.lower
    return wrapper
jax.jit = counting_jit

import jax.numpy as jnp
_orig_asarray = jnp.asarray
def counting_asarray(x, *a, **k):
    import numpy as np
    if isinstance(x, (np.ndarray, np.generic, float, int, list, tuple)):
        transfers["asarray"] += 1
    return _orig_asarray(x, *a, **k)
jnp.asarray = counting_asarray

from mods_tpu.runtime import setup_cache
setup_cache("/root/repo/.jax_cache_tests")
import numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher

REF = "/root/repo/.refbuild/run" if os.path.isdir("/root/repo/.refbuild/run") else "/root/reference/build"
img1 = np.asarray(Image.open("/root/reference/build/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open("/root/reference/build/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine("/root/reference/build/config_iter_mods_cviu.ini",
                            "/root/reference/build/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
matcher = TwoViewMatcher(ladder, cfg, stop_mode="pipelined")
t0 = time.time()
res = matcher.match(img1, img2)
print("match done in", round(time.time() - t0, 1), "s (CPU, incl tracing)")
print("n_matches", res.n_matches, "tent", res.n_tentatives, "steps", res.steps_used)
print("\n-- dispatches by program --")
tot = 0
for name, n in calls.most_common():
    print(f"{n:6d}  {name}")
    tot += n
print(f"{tot:6d}  TOTAL dispatches")
print("\n-- host->device transfers (jnp.asarray of host data) --")
print(transfers)
# second pair: steady-state counts (no store init etc.)
calls.clear(); transfers.clear()
t0 = time.time()
res = matcher.match(img1 + 0.25, img2 + 0.25)
print("\nsecond pair in", round(time.time() - t0, 1), "s")
print("-- steady dispatches --")
tot = 0
for name, n in calls.most_common():
    print(f"{n:6d}  {name}")
    tot += n
print(f"{tot:6d}  TOTAL dispatches")
print(transfers)
