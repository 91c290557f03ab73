"""Quick steady-state pair timing after the partial-read fix."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher

REF = "/root/reference/build"
img1 = np.asarray(Image.open(f"{REF}/examples/cat.png"), np.float32)
img2 = np.asarray(Image.open(f"{REF}/examples/cat2.png"), np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
m = TwoViewMatcher(ladder, cfg, stop_mode="sync")
for attempt in range(8):
    try:
        t0 = time.perf_counter()
        res = m.match(img1, img2)
        break
    except jax.errors.JaxRuntimeError as e:
        if "INTERNAL" not in str(e) or attempt == 7:
            raise
print(f"warmup: {time.perf_counter()-t0:.1f} s ({res.n_matches} m, "
      f"{res.steps_used} steps)", flush=True)
rng = np.random.default_rng(0)
for i in range(6):
    a = img1 + rng.uniform(0, 0.5, img1.shape).astype(np.float32)
    b = img2 + rng.uniform(0, 0.5, img2.shape).astype(np.float32)
    t0 = time.perf_counter()
    res = m.match(a, b)
    print(f"pair {i}: {time.perf_counter()-t0:6.2f} s "
          f"({res.n_matches} m, {res.steps_used} steps, "
          f"{res.n_tentatives} tents)", flush=True)

# diagnose: is the session in slow mode?
@jax.jit
def tiny(x):
    return x * 1.0001 + 0.5
xs = [jax.block_until_ready(jnp.asarray(np.full((128,), i * 1.37,
                                                np.float32)))
      for i in range(12)]
t0 = time.perf_counter()
for x in xs:
    jax.block_until_ready(tiny(x))
print(f"tiny after steady pairs: "
      f"{(time.perf_counter()-t0)/12*1e3:.1f} ms", flush=True)

# per-dispatch cost of one real group program now
gp = None
for key, (prev, preps) in m._prep_cache.items():
    if (key[1], key[2]) != (1000, 598):
        continue
    if not m._device_det(key[0].detector):
        continue
    for cand in preps:
        if not cand["identity"]:
            gp = cand; git = key[0]; break
    if gp is not None:
        break
from mods_tpu.descriptors.registry import spec_for
cap = cfg.caps.per_image
imgs = [jax.block_until_ready(jnp.asarray(
    np.mean(img1, -1).astype(np.float32) + i)) for i in range(8)]
def mk_stores():
    return tuple((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
                  jnp.zeros((cap,)), jnp.zeros((cap,)),
                  jnp.zeros((cap, spec_for(nm, cfg).dim)),
                  jnp.zeros((), jnp.int32)) for nm in git.descriptors)
t0 = time.perf_counter()
for i in range(8):
    out = gp["program"](imgs[i], gp["rot_inv"], gp["squash_inv"],
                        gp["sig_x"], gp["sig_y"], gp["valid_hw"],
                        gp["regn"], gp["hinv"], mk_stores())
    jax.block_until_ready(out)
print(f"group program ({git.detector}): "
      f"{(time.perf_counter()-t0)/8*1e3:.1f} ms", flush=True)
