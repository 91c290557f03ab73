"""In the flipped session: does dispatch cost scale with arg bytes,
output bytes, or buffer count?"""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

# flip the session immediately (any readback)
x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)

def timeit(name, fn, args_fn, n=8):
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        jax.block_until_ready(fn(*args_fn(i)))
    print(f"{name:<44}{(time.perf_counter()-t0)/n*1e3:8.1f} ms",
          flush=True)

@jax.jit
def one_small(a):
    return a.sum()

small = [jax.block_until_ready(jnp.full((128,), i, jnp.float32))
         for i in range(9)]
timeit("1 small arg", one_small, lambda i: (small[i % 9],))

big = [jax.block_until_ready(
    jnp.full((2048, 2048), np.float32(i))) for i in range(9)]  # 16MB
timeit("1 big arg (16MB)", one_small, lambda i: (big[i % 9],))

# same big buffer every call (does content caching help?)
timeit("1 big arg (16MB, SAME buffer)", one_small,
       lambda i: (big[0],))

@jax.jit
def eight_small(*a):
    return sum(x.sum() for x in a)

timeit("8 small args", eight_small,
       lambda i: tuple(small[(i + j) % 9] for j in range(8)))

med = [jax.block_until_ready(jnp.full((512, 512), np.float32(i)))
       for i in range(17)]  # 1MB each
timeit("8 x 1MB args", eight_small,
       lambda i: tuple(med[(i + j) % 17] for j in range(8)))

@jax.jit
def big_out(a):
    return a * 1.000001  # 16MB output

timeit("16MB OUTPUT", big_out, lambda i: (big[i % 9],))

# donated chain: output feeds next call
@jax.jit
def chain(a):
    return a * 1.000001
y = big[8]
t0 = time.perf_counter()
for i in range(8):
    y = chain(y)
    jax.block_until_ready(y)
print(f"{'16MB chained (out->arg)':<44}"
      f"{(time.perf_counter()-t0)/8*1e3:8.1f} ms", flush=True)
