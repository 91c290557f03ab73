"""Honest (flipped-session) microbench of the pipeline's op classes at
real ladder shapes — name the hog."""
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
V, H, W = 8, 640, 1280
imgs = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (1000, 598)).astype(np.float32) + i))
    for i in range(6)]
views = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (V, H, W)).astype(np.float32) + i))
    for i in range(6)]

# 1. affine warp (one rotation-canvas warp per view)
from mods_tpu.ops.warp import affine_warp
def warp8(img):
    m = jnp.asarray([[0.9, 0.1, 3.0], [-0.1, 0.9, 5.0]], jnp.float32)
    return jax.vmap(lambda s: affine_warp(img, m + 0.001 * s, 1280, 1280),
                    )(jnp.arange(V, dtype=jnp.float32))
timeit("rot warp 8x(1280x1280)", warp8, lambda i: (imgs[i % 6],))

# 2. shift blur
from mods_tpu.ops.gaussian import gaussian_blur_rt
timeit("shift blur 8x(640x1280)",
       lambda v: gaussian_blur_rt(v, jnp.float32(0.8), jnp.float32(2.6)),
       lambda i: (views[i % 6],))

# 3. pyramid + responses
from mods_tpu.detectors import scale_space as ss
from mods_tpu.config import PyramidParams
p = PyramidParams()
timeit("build_pyramid 8 views",
       lambda v: jax.tree.map(lambda x: x.sum() if hasattr(x, "sum")
                              else x, [(o.blurs.sum(), o.resps.sum())
                                       for o in ss.build_pyramid(v, p)]),
       lambda i: (views[i % 6],))

# 4. nms + candidates + localize (octave 0)
from mods_tpu.config import DetectorType
def cand(v):
    octs = ss.build_pyramid(v, p)
    o = octs[0]
    nms = ss._nms_mask(o.resps, 0.8 * p.threshold, -0.8 * p.threshold)
    outs = []
    for vi in range(V):
        lvl, r, c, valid = ss.candidate_indices(
            nms[vi], p.border, jnp.int32(W), jnp.int32(H), 8192)
        loc = ss.localize_keypoints(o.resps[vi], o.blurs[vi], lvl, r, c,
                                    valid, p, p.threshold ** 2,
                                    p.detector_type)
        outs.append(loc["ok"].sum())
    return jnp.stack(outs)
timeit("nms+candidates+localize oct0 x8", cand,
       lambda i: (views[i % 6],))

# 5. top_k 8192->512, x48 (8 views x 6 octaves)
def topk(v):
    keys = v.reshape(V, -1)[:, :8192]
    outs = []
    for rep in range(6):
        _, idx = jax.lax.top_k(keys + rep, 512)
        outs.append(idx.sum())
    return jnp.stack(outs)
timeit("top_k 8192->512 x48", topk, lambda i: (views[i % 6],))

# 6. Baumberg windows + iterations (one octave, 8 views x 512)
from mods_tpu.detectors.baumberg import baumberg_adapt
from mods_tpu.config import AffineShapeParams
aff = AffineShapeParams()
def baum(v):
    octs = ss.build_pyramid(v, p)
    o = octs[0]
    K = 512
    outs = []
    for vi in range(V):
        lvl = jnp.full((K,), 2, jnp.int32)
        xy = jnp.asarray(
            rng.uniform(50, 500, (K, 2)).astype(np.float32))
        s = jnp.full((K,), 2.0)
        ok = jnp.ones((K,), bool).at[100:].set(False)
        A, okk = baumberg_adapt(o.blurs[vi], lvl, xy, s, ok, aff)
        outs.append(okk.sum())
    return jnp.stack(outs)
timeit("baumberg oct0 8x512 (100 live)", baum,
       lambda i: (views[i % 6],))

# 7. patch sampling + sift at C=768
from mods_tpu.ops.sampler import mip_stack, sample_affine_patches, \
    select_level
from mods_tpu.descriptors.sift import sift_histograms
from mods_tpu.config import SIFTDescriptorParams
def patches(v):
    L = 4
    mips, mhw = jax.vmap(lambda x: mip_stack(x, L))(v)
    src = mips.reshape(V * L, *mips.shape[-2:])
    hwf = mhw.reshape(V * L, 2)
    C = 768
    xy = jnp.asarray(rng.uniform(50, 500, (C, 2)).astype(np.float32))
    A = jnp.tile(jnp.eye(2, dtype=jnp.float32) * 3.0, (C, 1, 1))
    vi = jnp.zeros((C,), jnp.int32)
    lvl, sc = select_level(A, 41, L)
    pt = sample_affine_patches(src, vi * L + lvl, xy / sc[:, None],
                               A / sc[:, None, None], 41, hwf)
    h = sift_histograms(pt, SIFTDescriptorParams())
    return h.sum()
timeit("mips+768 patches+sift", patches, lambda i: (views[i % 6],))

# 8. FGINN knn at 8192x8192x128
from mods_tpu.matching.fginn import match_fginn
descs = [jax.block_until_ready(jnp.asarray(
    rng.normal(size=(8192, 128)).astype(np.float32))) for _ in range(6)]
mask = jnp.ones((8192,), bool)
xy2 = jnp.asarray(rng.uniform(0, 500, (8192, 2)).astype(np.float32))
timeit("fginn 8192x8192x128",
       lambda a, b: match_fginn(a, mask, b, mask, xy2, 0.8, 10.0,
                                5).mask.sum(),
       lambda i: (descs[i % 6], descs[(i + 1) % 6]))

# 9. ransac_h at bench config
from mods_tpu.ransac.homography import ransac_h
from mods_tpu.cli import _build_engine
REF = "/root/reference/build"
cfg, _ = _build_engine(f"{REF}/config_iter_mods_cviu.ini",
                       f"{REF}/iters_mods_cviu.ini",
                       ver_type="LORANSACH")
print("ransac cfg:", cfg.ransac.batch_hypotheses, cfg.ransac.max_rounds,
      flush=True)
x1s = [jnp.asarray(rng.uniform(0, 500, (2048, 2)).astype(np.float32))
       for _ in range(6)]
mask2 = jnp.zeros((2048,), bool).at[:100].set(True)
timeit("ransac_h (bench cfg)",
       lambda a, k: ransac_h(a, a + 3.0, mask2, cfg.ransac, k)[2],
       lambda i: (x1s[i % 6], jax.random.PRNGKey(i)))
