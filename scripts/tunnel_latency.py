"""Measure the axon-tunnel's per-op costs on the real chip with FRESH
buffers per call (the tunnel replays cached executions on repeated
args, so stale-buffer timings read as 0)."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

dev = jax.devices()[0]
print("device:", dev)

@jax.jit
def tiny(x):
    return x * 1.0001 + 0.5

jax.block_until_ready(tiny(jnp.zeros((128,), jnp.float32)))
N = 30
xs = [jnp.asarray(np.full((128,), i, np.float32)) for i in range(N)]
jax.block_until_ready(xs)

t0 = time.perf_counter()
for i in range(N):
    jax.block_until_ready(tiny(xs[i]))
print(f"dispatch+block (fresh arg): {(time.perf_counter()-t0)/N*1e3:.1f} ms")

xs2 = [jnp.asarray(np.full((128,), i + 500, np.float32)) for i in range(N)]
jax.block_until_ready(xs2)
t0 = time.perf_counter()
outs = [tiny(x) for x in xs2]
jax.block_until_ready(outs)
print(f"pipelined dispatch (fresh args): {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# chain: each output feeds the next (serial dependency, fresh values)
y = jnp.asarray(np.full((128,), 777, np.float32))
jax.block_until_ready(y)
t0 = time.perf_counter()
for i in range(N):
    y = tiny(y)
jax.block_until_ready(y)
print(f"chained dispatch: {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# scalar readback of freshly computed values
outs = [tiny(x) for x in xs2]
jax.block_until_ready(outs)
t0 = time.perf_counter()
for o in outs:
    _ = float(o[0])
print(f"scalar readback (indexed): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
souts = [o.sum() for o in outs]
jax.block_until_ready(souts)
t0 = time.perf_counter()
for o in souts:
    _ = float(o)
print(f"scalar readback (ready scalar): {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# np.asarray of a small device buffer
t0 = time.perf_counter()
for o in outs:
    _ = np.asarray(o)
print(f"(128,) readback: {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# medium program with image arg, fresh image each call
img = np.random.default_rng(0).uniform(0, 255, (700, 1000)).astype(np.float32)
@jax.jit
def med(img, a):
    return jnp.tanh(img * a).sum()
jax.block_until_ready(med(jnp.asarray(img), jnp.float32(1.0)))
t0 = time.perf_counter()
outs = []
for i in range(10):
    outs.append(med(jnp.asarray(img + i), jnp.float32(1.0)))
jax.block_until_ready(outs)
print(f"2.8MB upload + med dispatch, pipelined: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
