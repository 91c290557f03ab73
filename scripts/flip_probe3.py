"""Sub-rung bisect: which stage of rung 2 flips the tunnel slow mode."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from PIL import Image
from mods_tpu.cli import _build_engine
from mods_tpu.config import as_rungs
from mods_tpu.pipeline import TwoViewMatcher
from mods_tpu.timing import TimeLog

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
    print(f"tiny after {tag:<28}: "
          f"{(time.perf_counter()-t0)/n*1e3:6.1f} ms", flush=True)

jax.block_until_ready(tiny(jnp.zeros((128,))))
time_tiny("start")

REF = "/root/reference/build"
img1g = np.asarray(Image.open(f"{REF}/examples/cat.png").convert("L"),
                   np.float32)
img2g = np.asarray(Image.open(f"{REF}/examples/cat2.png").convert("L"),
                   np.float32)
cfg, ladder = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                            f"{REF}/iters_mods_cviu.ini",
                            ver_type="LORANSACH")
rungs = as_rungs(ladder)
print("rung dets:", [[d.detector for d in r.dets] for r in rungs[:3]],
      flush=True)

m = TwoViewMatcher(ladder, cfg, stop_mode="sync")
m._wh = (max(img1g.shape[1], img2g.shape[1]),
         max(img1g.shape[0], img2g.shape[0]))
m._gt_h = None
m._bank = {}
m._stores = ({}, {})
stores1, stores2 = m._stores
log = TimeLog()
prev1, prev2 = {}, {}

for step in (0, 1):
    rung = rungs[step]
    for it in rung.dets:
        prev1[it.detector] = m._process_image(
            img1g, it, prev1.get(it.detector, []), stores1, log, 0)
        time_tiny(f"s{step} process img1 {it.detector}")
        prev2[it.detector] = m._process_image(
            img2g, it, prev2.get(it.detector, []), stores2, log, 1)
        time_tiny(f"s{step} process img2 {it.detector}")
    m._execute_plan(stores1, stores2, rung, log)
    time_tiny(f"s{step} execute_plan")
    out = m._verify_bank(log)
    if out is not None:
        n = int(out["n_inl"])
        time_tiny(f"s{step} verify (n={n})")
