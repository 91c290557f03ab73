"""Production shear_rotate/separable_scale vs old affine_warp, real
shapes, flipped session."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)

def timeit(name, fn, args_fn, n=4):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args_fn(0)))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        jax.block_until_ready(f(*args_fn(i)))
    print(f"{name:<46}{(time.perf_counter()-t0)/n*1e3:8.1f} ms",
          flush=True)

rng = np.random.default_rng(0)
V = 8
imgs = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (1000, 598)).astype(np.float32) + i))
    for i in range(6)]
from mods_tpu.ops.warp import affine_warp, separable_scale, shear_rotate

rots = np.zeros((V, 2, 3), np.float32)
for v in range(V):
    phi = 0.35 * v            # includes > pi/2 -> flip path
    c, s = np.cos(phi), np.sin(phi)
    rots[v] = [[c, s, 30.0], [-s, c, 40.0]]
rot_d = jnp.asarray(rots)

timeit("OLD affine_warp rot 8x1280^2",
       lambda img: jax.vmap(lambda m: affine_warp(img, m, 1280, 1280))(
           rot_d),
       lambda i: (imgs[i % 6],))
timeit("NEW shear_rotate rot 8x1280^2",
       lambda img: jax.vmap(lambda m: shear_rotate(img, m, 1280, 1280))(
           rot_d),
       lambda i: (imgs[i % 6],))
views = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (V, 1280, 1280)).astype(np.float32) + i))
    for i in range(6)]
sq = jnp.asarray(np.asarray([[1, 0, 0], [0, 0.25, 0]], np.float32))
timeit("OLD affine_warp squash 8x(640,1280)",
       lambda v: jax.vmap(lambda im: affine_warp(im, sq, 640, 1280))(v),
       lambda i: (views[i % 6],))
timeit("NEW separable_scale squash 8x(640,1280)",
       lambda v: jax.vmap(lambda im: separable_scale(
           im, sq[0, 0], sq[1, 1], 640, 1280))(v),
       lambda i: (views[i % 6],))
# no-flip-only variant of shear (all phi < pi/2)
rots2 = np.zeros((V, 2, 3), np.float32)
for v in range(V):
    phi = 0.17 * v
    c, s = np.cos(phi), np.sin(phi)
    rots2[v] = [[c, s, 30.0], [-s, c, 40.0]]
rot2_d = jnp.asarray(rots2)
timeit("NEW shear_rotate (no flips)",
       lambda img: jax.vmap(lambda m: shear_rotate(img, m, 1280, 1280))(
           rot2_d),
       lambda i: (imgs[i % 6],))
