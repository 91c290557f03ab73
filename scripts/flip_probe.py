"""Find WHAT flips the tunnel into slow per-dispatch mode: run ladder
components one at a time, measuring tiny-dispatch latency after each."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

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

time_tiny("nothing")

from mods_tpu.config import CapacityParams, RansacParams, OrsaParams
from mods_tpu.pipeline import EngineConfig
cfg = EngineConfig()
rng = np.random.default_rng(0)

# 1. ransac_h (lax.while_loop inside?)
from mods_tpu.ransac.homography import ransac_h
n = 2048
x1 = rng.uniform(0, 500, (n, 2)).astype(np.float32)
H = np.array([[1, 0.02, 5], [0.01, 1, -3], [0, 0, 1.0]])
x2h = (H @ np.hstack([x1, np.ones((n, 1))]).T).T
x2 = (x2h[:, :2] / x2h[:, 2:3]).astype(np.float32) + \
    rng.normal(0, 1, (n, 2)).astype(np.float32)
mask = np.ones(n, bool)
f = jax.jit(lambda a, b, m, k: ransac_h(a, b, m, cfg.ransac, k))
out = f(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
        jax.random.PRNGKey(0))
jax.block_until_ready(out)
time_tiny("ransac_h")

# 2. fginn match (approx_max_k)
from mods_tpu.matching.fginn import match_fginn
d1 = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
d2 = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
m1 = jnp.ones((8192,), bool)
xy2 = jnp.asarray(rng.uniform(0, 500, (8192, 2)).astype(np.float32))
g = jax.jit(lambda a, b, c, d, e: match_fginn(a, b, c, d, e, 0.8, 10.0,
                                              cfg.match.knn))
out = g(d1, m1, d2, m1, xy2)
jax.block_until_ready(out)
time_tiny("match_fginn")

# 3. duplicate filter (fixed-point loop)
from mods_tpu.matching.fginn import duplicate_filter
dd = jax.jit(lambda a, b, m: duplicate_filter(a, b, m, 0.5))
out = dd(xy2, xy2 + 1.0, m1)
jax.block_until_ready(out)
time_tiny("duplicate_filter")

# 4. orsa
from mods_tpu.ransac.orsa import orsa_f
o = jax.jit(lambda a, b, m, k: orsa_f(a, b, m, 600, 500, cfg.orsa, k))
out = o(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
        jax.random.PRNGKey(1))
jax.block_until_ready(out)
time_tiny("orsa_f")

# 5. a hostdet-style program with big host uploads per call
from mods_tpu.pipeline import _fused_hostdet_program
K = cfg.caps.per_view
p = _fused_hostdet_program(4, 1000, 598, 0, 0, 1024, 640, False, True,
                           K, ("RootSIFT",), cfg)
cap = cfg.caps.per_image
img = jnp.asarray(rng.uniform(0, 255, (1000, 598)).astype(np.float32))
def mk_stores():
    return ((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
             jnp.zeros((cap,)), jnp.zeros((cap,)),
             jnp.zeros((cap, 128)), jnp.zeros((), jnp.int32)),)
out = p(img, jnp.zeros((4, 2, 3)), jnp.zeros((2, 3)), jnp.float32(1),
        jnp.float32(1), jnp.asarray([[1000, 598]] * 4, np.int32),
        jnp.asarray(rng.uniform(50, 500, (4, K, 2)).astype(np.float32)),
        jnp.tile(jnp.eye(2, dtype=jnp.float32), (4, K, 1, 1)) * 3.0,
        jnp.full((4, K), 3.0, jnp.float32), jnp.ones((4, K), jnp.float32),
        jnp.zeros((4, K), bool).at[:, :50].set(True),
        jnp.tile(jnp.asarray([[1, 0, 0], [0, 1, 0]], jnp.float32),
                 (4, 1, 1)), mk_stores())
jax.block_until_ready(out)
time_tiny("hostdet program")
time_tiny("hostdet program (again)")
