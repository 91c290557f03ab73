"""Reproduce the 300 ms/dispatch inside a real-ladder process: warm up
the full matcher, then time a single real group program in isolation in
the SAME process, then time one rung's _process_image."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.pipeline import TwoViewMatcher, DeviceStore
from mods_tpu.timing import TimeLog

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
print(f"warmup: {time.perf_counter()-t0:.1f} s ({res.n_matches} m)",
      flush=True)

# pick a real prepped device-detector group
from mods_tpu.config import as_rungs
rungs = as_rungs(ladder)
gp = None
for key, (prev, preps) in m._prep_cache.items():
    print("prep:", key[0].detector, key[1], key[2],
          [(pp["Vb"], pp["hc"], pp["wc"], pp["identity"]) for pp in preps][:3],
          flush=True)
for key, (prev, preps) in m._prep_cache.items():
    it = key[0]
    if (key[1], key[2]) != img1.shape[:2]:
        continue
    if not m._device_det(it.detector):
        continue
    for cand in preps:
        if not cand["identity"]:
            gp = cand; git = it; break
    if gp is not None:
        break
print("probing group:", git.detector, gp["Vb"], gp["hc"], gp["wc"],
      flush=True)

imgs = [jax.block_until_ready(jnp.asarray(np.mean(img1, -1).astype(np.float32) + 0.1 * i))
        for i in range(10)]
spec_dim = 128
def mk_store():
    cap = cfg.caps.per_image
    return tuple((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
                  jnp.zeros((cap,)), jnp.zeros((cap,)),
                  jnp.zeros((cap, d)), jnp.zeros((), jnp.int32))
                 for d in ([128] if len(git.descriptors) == 1 else
                           [128, 128]))
nspec = len(git.descriptors)
def mk_stores():
    cap = cfg.caps.per_image
    from mods_tpu.descriptors.registry import spec_for
    return tuple((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
                  jnp.zeros((cap,)), jnp.zeros((cap,)),
                  jnp.zeros((cap, spec_for(nm, cfg).dim)),
                  jnp.zeros((), jnp.int32)) for nm in git.descriptors)

for tag in ("first", "second"):
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        out = gp["program"](imgs[i], gp["rot_inv"], gp["squash_inv"],
                            gp["sig_x"], gp["sig_y"], gp["valid_hw"],
                            gp["regn"], gp["hinv"], mk_stores())
        jax.block_until_ready(out)
    print(f"real group program, fresh stores ({tag}): "
          f"{(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

# time one full _process_image (all groups of one rung) blocked
stores = {}
log = TimeLog()
t0 = time.perf_counter()
m._process_image(np.mean(img1, -1).astype(np.float32) + 0.77, git, [], stores, log, 0)
jax.block_until_ready([st.buffers() for st in stores.values()])
print(f"_process_image({git.detector} rung): "
      f"{time.perf_counter()-t0:.2f} s", flush=True)

# and a fresh steady pair for reference
t0 = time.perf_counter()
res = m.match(img1 + 0.5, img2 + 0.5)
print(f"steady pair sync: {time.perf_counter()-t0:.1f} s "
      f"({res.n_matches} m)", flush=True)
