"""Probe: patch-sampling backends at bench shapes on the real chip.

(a) current one-hot window sampler (136x256 windows, MXU einsum)
(b) small (96,128) windows + XLA einsum
(c) small windows + Pallas kernel (one-hot matmul in VMEM)
(d) extraction gather cost alone, aligned vs unaligned starts
"""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)   # flip session to honest mode

def timeit(name, fn, args_fn, n=6):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args_fn(0)))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        jax.block_until_ready(f(*args_fn(i)))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<52}{dt*1e3:8.2f} ms", flush=True)
    return dt

rng = np.random.default_rng(0)
L, H, W = 4, 640, 1280
K = 4096
P = 41
srcs = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (L, 640, 1280)).astype(np.float32)))
    for _ in range(3)]
xy_np = np.stack([rng.uniform(70, W - 70, K), rng.uniform(70, H - 70, K)],
                 -1).astype(np.float32)
th = rng.uniform(0, 2 * np.pi, K)
sc = rng.uniform(0.6, 1.4, K)
A_np = (np.stack([np.stack([np.cos(th), -np.sin(th)], -1),
                  np.stack([np.sin(th), np.cos(th)], -1)], -2)
        * sc[:, None, None]).astype(np.float32)
lvl_np = rng.integers(0, L, K).astype(np.int32)
xy = jnp.asarray(xy_np); A = jnp.asarray(A_np); lvl = jnp.asarray(lvl_np)
valid_hw = jnp.asarray(np.tile([[640, 1280]], (L, 1)), np.int32)

from mods_tpu.ops import sampler as S

# (a) current
def cur(src):
    return S.sample_affine_patches(src, lvl, xy, A, P, valid_hw)
timeit(f"(a) current 136x256 einsum K={K} P={P}", cur, lambda i: (srcs[i % 3],))

# (d) extraction cost alone
def extract_small(src, ys, xs):
    starts = jnp.stack([lvl, ys, xs], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    return jax.lax.gather(src, starts, dn, slice_sizes=(1, 96, 128),
                          mode=jax.lax.GatherScatterMode.CLIP)

ys_u = jnp.asarray((xy_np[:, 1].astype(np.int32) - 47).clip(0, H - 96))
xs_u = jnp.asarray((xy_np[:, 0].astype(np.int32) - 63).clip(0, W - 128))
ys_a = (ys_u // 8) * 8
xs_a = (xs_u // 128) * 128
timeit("(d) extract (96,128) unaligned", lambda s: extract_small(s, ys_u, xs_u),
       lambda i: (srcs[i % 3],))
timeit("(d) extract (96,128) aligned8/128", lambda s: extract_small(s, ys_a, xs_a),
       lambda i: (srcs[i % 3],))
timeit("(d) extract (136,256) aligned (current)",
       lambda s: S.extract_windows(s, lvl, (ys_u // 8) * 8,
                                   (xs_u // 128) * 128),
       lambda i: (srcs[i % 3],))

# (b) small windows + XLA einsum
def small_xla(src):
    win = extract_small(src, ys_u, xs_u)
    relx = None
    from mods_tpu.ops.warp import patch_grid
    g = patch_grid(P).reshape(-1, 2)
    offs = jnp.einsum("kab,nb->kna", A, g)
    gx = offs[..., 0] + xy[:, None, 0]
    gy = offs[..., 1] + xy[:, None, 1]
    rx = gx - xs_u[:, None].astype(jnp.float32)
    ry = gy - ys_u[:, None].astype(jnp.float32)
    yf = jnp.floor(ry); xf = jnp.floor(rx)
    wy = (ry - yf)[..., None]; wx = (rx - xf)[..., None]
    y0i = jnp.clip(yf.astype(jnp.int32), 0, 94)[..., None]
    x0i = jnp.clip(xf.astype(jnp.int32), 0, 126)[..., None]
    ly = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 96), 2)
    lx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    Wy = ((ly == y0i) * (1.0 - wy) + (ly == y0i + 1) * wy)
    Wx = ((lx == x0i) * (1.0 - wx) + (lx == x0i + 1) * wx)
    rows = jnp.einsum("knw,kwx->knx", Wy, win,
                      preferred_element_type=jnp.float32)
    return jnp.sum(rows * Wx, axis=-1)
timeit(f"(b) small win + XLA einsum", small_xla, lambda i: (srcs[i % 3],))

# (c) pallas kernel over materialized small windows
N = P * P
NP_ = ((N + 127) // 128) * 128

CB = 8   # keypoints per grid step

def kernel(par_ref, win_ref, out_ref):
    # par: (K, 8) = [rx0, ry0, a00, a01, a10, a11, _, _], scalar-prefetched
    k = pl.program_id(0)
    half = P // 2
    n = jax.lax.broadcasted_iota(jnp.int32, (NP_, 1), 0)
    gx = (n % P - half).astype(jnp.float32)
    gy = (n // P - half).astype(jnp.float32)
    ly = jax.lax.broadcasted_iota(jnp.int32, (NP_, 96), 1)
    lx = jax.lax.broadcasted_iota(jnp.int32, (NP_, 128), 1)
    for c in range(CB):
        i = k * CB + c
        rx0 = par_ref[i, 0]; ry0 = par_ref[i, 1]
        a00 = par_ref[i, 2]; a01 = par_ref[i, 3]
        a10 = par_ref[i, 4]; a11 = par_ref[i, 5]
        relx = rx0 + a00 * gx + a01 * gy          # (NP_, 1)
        rely = ry0 + a10 * gx + a11 * gy
        yf = jnp.floor(rely); xf = jnp.floor(relx)
        wy = rely - yf; wx = relx - xf
        y0i = jnp.clip(yf.astype(jnp.int32), 0, 94)
        x0i = jnp.clip(xf.astype(jnp.int32), 0, 126)
        Wy = ((ly == y0i) * (1.0 - wy) + (ly == y0i + 1) * wy)
        Wx = ((lx == x0i) * (1.0 - wx) + (lx == x0i + 1) * wx)
        rows = jnp.dot(Wy, win_ref[c], preferred_element_type=jnp.float32)
        out_ref[c, :] = jnp.sum(rows * Wx, axis=-1)

def pallas_sample(par, win):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // CB,),
        in_specs=[
            pl.BlockSpec((CB, 96, 128), lambda k, par: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, NP_), lambda k, par: (k, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, NP_), jnp.float32),
        grid_spec=grid_spec,
    )(par, win)

par_np = np.zeros((K, 8), np.float32)
par_np[:, 0] = xy_np[:, 0] - np.asarray(xs_u)
par_np[:, 1] = xy_np[:, 1] - np.asarray(ys_u)
par_np[:, 2] = A_np[:, 0, 0]; par_np[:, 3] = A_np[:, 0, 1]
par_np[:, 4] = A_np[:, 1, 0]; par_np[:, 5] = A_np[:, 1, 1]
par = jnp.asarray(par_np)

def pallas_full(src):
    win = extract_small(src, ys_u, xs_u)
    return pallas_sample(par, win)

try:
    timeit(f"(c) small win + pallas K={K} P={P}", pallas_full,
           lambda i: (srcs[i % 3],))
    # correctness vs (b)
    ref = jax.jit(small_xla)(srcs[0])
    got = jax.jit(pallas_full)(srcs[0])[:, :N]
    err = float(jnp.max(jnp.abs(ref - got)))
    print("max |pallas - xla| =", err)
except Exception as e:
    print("pallas failed:", repr(e)[:500])
