"""Bisect INSIDE the verify program: laf_check? concat? the exact
_verify_bank_program? blocked-all vs scalar-only consumption?"""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.pipeline import EngineConfig, _verify_bank_program

@jax.jit
def tiny(x):
    return x * 1.0001 + 0.5

seq = [0]
def time_tiny(tag, n=10):
    xs = []
    for i in range(n):
        seq[0] += 1
        xs.append(jax.block_until_ready(jnp.asarray(
            np.full((128,), seq[0] * 1.37, np.float32))))
    t0 = time.perf_counter()
    for x in xs:
        jax.block_until_ready(tiny(x))
    print(f"tiny after {tag:<30}: "
          f"{(time.perf_counter()-t0)/n*1e3:6.1f} ms", flush=True)

jax.block_until_ready(tiny(jnp.zeros((128,))))
time_tiny("start")
rng = np.random.default_rng(0)
cfg = EngineConfig()

# h_laf_check standalone
from mods_tpu.ransac.laf_check import h_laf_check
n = 2048
xy1 = jnp.asarray(rng.uniform(0, 500, (n, 2)).astype(np.float32))
A = jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1))
s = jnp.full((n,), 3.0)
H = jnp.asarray(np.eye(3, dtype=np.float32))
inl = jnp.ones((n,), bool)
f = jax.jit(lambda *a: h_laf_check(*a, 9.0))
out = f(H, xy1, A, s, xy1 + 2.0, A, s, inl)
jax.block_until_ready(out)
time_tiny("h_laf_check")

# the EXACT verify program on synthetic parts
cap = cfg.caps.per_image
def mk_part():
    return dict(
        xy1=jnp.asarray(rng.uniform(0, 500, (cap, 2)).astype(np.float32)),
        A1=jnp.tile(jnp.eye(2, dtype=jnp.float32), (cap, 1, 1)),
        s1=jnp.full((cap,), 3.0),
        xy2=jnp.asarray(rng.uniform(0, 500, (cap, 2)).astype(np.float32)),
        A2=jnp.tile(jnp.eye(2, dtype=jnp.float32), (cap, 1, 1)),
        s2=jnp.full((cap,), 3.0),
        prio=jnp.zeros((cap,)),
        mask=jnp.zeros((cap,), bool).at[:100].set(True))
parts = (mk_part(),)
vp = _verify_bank_program((cap,), cfg.caps.tentatives, cfg, 600, 500,
                          False, False)
out = vp(parts, jax.random.PRNGKey(0))
jax.block_until_ready(out)
time_tiny("verify program (blocked all)")
out = vp(parts, jax.random.PRNGKey(1))
_ = int(out["n_inl"])
time_tiny("verify (scalar-only consume)")
