"""Is the tunnel's per-execution overhead proportional to program op
count?  Unrolled chain vs lax.scan of the same length."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

# flip the session -> honest timings
x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)

M = 256
mats = [jax.block_until_ready(jnp.asarray(
    np.random.default_rng(i).normal(size=(M, M)).astype(np.float32)
    / M)) for i in range(6)]

def chain_fn(n):
    def f(a, b):
        y = a
        for i in range(n):
            y = jnp.tanh(y @ b)
        return y.sum()
    return jax.jit(f)

def scan_fn(n):
    def f(a, b):
        def body(y, _):
            return jnp.tanh(y @ b), None
        y, _ = jax.lax.scan(body, a, None, length=n)
        return y.sum()
    return jax.jit(f)

for name, mk in (("unrolled", chain_fn), ("scan", scan_fn)):
    for n in (1, 8, 64, 256):
        f = mk(n)
        out = f(mats[0], mats[1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            jax.block_until_ready(f(mats[i % 5], mats[(i + 1) % 5]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:<9} n={n:4d}: {dt:8.1f} ms", flush=True)
