"""Warp formulation shootout at real shapes (flipped session):
4-plane gather bilinear (current) vs row-gather scale vs
vmapped-dynamic-slice shear chain."""
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

from mods_tpu.ops.warp import affine_warp
def warp8(img):
    m = jnp.asarray([[0.9, 0.1, 3.0], [-0.1, 0.9, 5.0]], jnp.float32)
    return jax.vmap(lambda s: affine_warp(img, m + 0.001 * s, 1280, 1280)
                    )(jnp.arange(V, dtype=jnp.float32))
timeit("BASELINE 4-gather warp 8x1280^2", warp8,
       lambda i: (imgs[i % 6],))

def shear_x(img, slope, off, out_w):
    """out[r, c] = img[r, c + slope*r + off]  (bilinear along x).
    Per-row scalar offset -> vmapped dynamic_slice (contiguous)."""
    H, W = img.shape
    pad = out_w + 4
    img_p = jnp.pad(img, ((0, 0), (pad, pad)), constant_values=128.0)
    r = jnp.arange(H, dtype=jnp.float32)
    s = slope * r + off
    o = jnp.floor(s)
    w = (s - o)[:, None]
    oi = o.astype(jnp.int32) + pad

    def row(rowvec, start):
        seg = jax.lax.dynamic_slice(rowvec, (start,), (out_w + 1,))
        return seg
    segs = jax.vmap(row)(img_p, oi)
    return segs[:, :-1] * (1 - w) + segs[:, 1:] * w

def rot3shear(img):
    """rotation ~0.11 rad as shear_x / transpose shear_x / transpose
    shear_x, 8 slightly different angles."""
    outs = []
    for k in range(V):
        phi = 0.1 + 0.001 * k
        t = -jnp.tan(phi / 2)
        s = jnp.sin(phi)
        a = shear_x(img, t, 10.0, 1280)
        b = shear_x(a.T, s, 10.0, 1280).T
        c = shear_x(b, t, 10.0, 1280)
        outs.append(c)
    return jnp.stack(outs)
timeit("3-shear rot (vmap dyn-slice) 8x", rot3shear,
       lambda i: (imgs[i % 6],))

def scale_y(img, sy, out_h):
    """axis-aligned resample along rows via row gather."""
    src = jnp.arange(out_h, dtype=jnp.float32) * sy
    i0 = jnp.floor(src).astype(jnp.int32)
    w = (src - jnp.floor(src))[:, None]
    top = jnp.take(img, i0, axis=0, mode="clip")
    bot = jnp.take(img, i0 + 1, axis=0, mode="clip")
    return top * (1 - w) + bot * w

def squash8(img):
    outs = []
    for k in range(V):
        a = scale_y(img, 2.0 + 0.01 * k, 500)
        b = scale_y(a.T, 1.0, 1280).T
        outs.append(b)
    return jnp.stack(outs)
timeit("separable squash (row gathers) 8x", squash8,
       lambda i: (imgs[i % 6],))
