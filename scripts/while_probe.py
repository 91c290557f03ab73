"""Does lax.while_loop cost ~RTT per iteration on the tunnel?"""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)   # flip to honest mode

def wl(n):
    def f(a):
        def cond(s):
            return s[0] < n
        def body(s):
            i, y = s
            return i + 1, jnp.tanh(y @ a)
        _, y = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), a))
        return y.sum()
    return jax.jit(f)

def fl(n):
    def f(a):
        def body(i, y):
            return jnp.tanh(y @ a)
        y = jax.lax.fori_loop(0, n, body, a)
        return y.sum()
    return jax.jit(f)

mats = [jax.block_until_ready(jnp.asarray(
    np.random.default_rng(i).normal(size=(256, 256)).astype(np.float32)
    / 256)) for i in range(6)]
for name, mk in (("while", wl), ("fori", fl)):
    for n in (1, 16, 64, 256):
        f = mk(n)
        jax.block_until_ready(f(mats[0]))
        t0 = time.perf_counter()
        for i in range(4):
            jax.block_until_ready(f(mats[1 + i]))
        print(f"{name:<6} n={n:4d}: "
              f"{(time.perf_counter()-t0)/4*1e3:8.1f} ms", flush=True)
