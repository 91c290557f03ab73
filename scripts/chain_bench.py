"""Honest per-op microbench: serial dependency chains inside ONE
program remove the ~26 ms tunnel RTT that poisons per-dispatch timing
(every earlier op_bench number includes it)."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np

x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)

REPS = 6


def timeit_chain(name, fn, arg, n=3):
    def chained(a):
        for _ in range(REPS):
            r = fn(a)
            r = jax.lax.optimization_barrier(r)
            lead = jax.tree.leaves(r)[0]
            a = a + 1e-6 * lead.reshape(-1)[0].astype(jnp.float32)
        return a
    f = jax.jit(chained)
    jax.block_until_ready(f(arg))
    t0 = time.perf_counter()
    for i in range(n):
        jax.block_until_ready(f(arg + np.float32(i)))
    per = ((time.perf_counter() - t0) / n - 0.026) / REPS
    print(f"{name:<52}{per*1e3:8.2f} ms/op", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    V, H, W = 8, 640, 1280
    views = jnp.asarray(rng.uniform(0, 255, (V, H, W)).astype(np.float32))
    jax.block_until_ready(views)

    from mods_tpu.detectors import scale_space as ss
    from mods_tpu.config import PyramidParams, AffineShapeParams, \
        CapacityParams
    p = PyramidParams()

    def pyr(v):
        octs = ss.build_pyramid(v, p)
        return [(o.blurs, o.resps) for o in octs]
    timeit_chain("build_pyramid 8 views (all octaves)", pyr, views)

    def nms_only(v):
        octs = ss.build_pyramid(v, p)
        o = octs[0]
        return ss._nms_mask(o.resps, 0.8 * p.threshold, -0.8 * p.threshold)
    t_nms = timeit_chain("pyramid + nms oct0", nms_only, views)

    def cand_only(v):
        octs = ss.build_pyramid(v, p)
        o = octs[0]
        nms = ss._nms_mask(o.resps, 0.8 * p.threshold, -0.8 * p.threshold)
        outs = []
        for vi in range(V):
            lvl, r, c, valid = ss.candidate_indices(
                nms[vi], p.border, jnp.int32(W), jnp.int32(H), 8192)
            outs.append((lvl, r, c, valid))
        return outs
    timeit_chain("pyr + nms + candidate_indices x8", cand_only, views)

    def loc_full(v):
        octs = ss.build_pyramid(v, p)
        o = octs[0]
        nms = ss._nms_mask(o.resps, 0.8 * p.threshold, -0.8 * p.threshold)
        outs = []
        for vi in range(V):
            lvl, r, c, valid = ss.candidate_indices(
                nms[vi], p.border, jnp.int32(W), jnp.int32(H), 8192)
            loc = ss.localize_keypoints(o.resps[vi], o.blurs[vi], lvl, r,
                                        c, valid, p, p.threshold ** 2,
                                        p.detector_type)
            outs.append(loc["ok"])
        return outs
    timeit_chain("pyr + nms + cand + localize x8 (oct0)", loc_full, views)

    # full detect program (all octaves) as the fused path runs it
    from mods_tpu.detectors.hessaff import detect_affine_keypoints
    caps = CapacityParams()
    aff = AffineShapeParams()
    vhw = jnp.asarray(np.tile([[H, W]], (V, 1)), np.int32)
    regn = jnp.full((V,), 10 ** 9, jnp.int32)

    def det(v):
        return detect_affine_keypoints(v, vhw, p, aff, caps, regn)
    timeit_chain("detect_affine_keypoints full (8 views)", det, views)

    # sampler at desc shapes
    from mods_tpu.ops import sampler as S
    L = 4
    src = jnp.asarray(rng.uniform(0, 255, (L * V, 640, 1280))
                      .astype(np.float32))
    jax.block_until_ready(src)
    K = 768
    P = 41
    xy = jnp.asarray(np.stack([rng.uniform(70, W - 70, K),
                               rng.uniform(70, H - 70, K)], -1)
                     .astype(np.float32))
    th = rng.uniform(0, 2 * np.pi, K)
    sc = rng.uniform(0.6, 1.4, K)
    A = jnp.asarray((np.stack([
        np.stack([np.cos(th), -np.sin(th)], -1),
        np.stack([np.sin(th), np.cos(th)], -1)], -2)
        * sc[:, None, None]).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L * V, K).astype(np.int32))
    valid_hw = jnp.asarray(np.tile([[640, 1280]], (L * V, 1)), np.int32)

    def samp(s):
        return S.sample_affine_patches(s, lvl, xy, A, P, valid_hw)
    timeit_chain(f"sample_affine_patches K={K} P={P}", samp, src)

    def samp19(s):
        return S.sample_affine_patches(s, lvl, xy, A, 19, valid_hw)
    timeit_chain(f"sample_affine_patches K={K} P=19", samp19, src)

    # baumberg at per-octave shapes
    from mods_tpu.detectors.baumberg import baumberg_adapt
    KB = 2048
    blurs = jnp.asarray(rng.uniform(0, 255, (5, 640, 1280))
                        .astype(np.float32))
    jax.block_until_ready(blurs)
    lvlb = jnp.asarray(rng.integers(0, 5, KB).astype(np.int32))
    xyb = jnp.asarray(np.stack([rng.uniform(30, W - 30, KB),
                                rng.uniform(30, H - 30, KB)], -1)
                      .astype(np.float32))
    sb = jnp.asarray(rng.uniform(1.6, 6.0, KB).astype(np.float32))
    vb = jnp.asarray(rng.uniform(0, 1, KB) < 0.2)

    def baum(b):
        return baumberg_adapt(b, lvlb, xyb, sb, vb, AffineShapeParams())
    timeit_chain(f"baumberg_adapt K={KB} (20% live)", baum, blurs)

    # separable_scale + blur at render shapes
    from mods_tpu.ops.warp import separable_scale
    from mods_tpu.ops.gaussian import gaussian_blur_rt

    def squash(v):
        return jax.vmap(lambda im: separable_scale(
            im, jnp.float32(1.4), jnp.float32(1.0), 640, 1280))(v)
    timeit_chain("separable_scale x8", squash, views)

    def blur(v):
        return gaussian_blur_rt(v, jnp.float32(0.8), jnp.float32(2.6))
    timeit_chain("gaussian_blur_rt x8", blur, views)


if __name__ == "__main__":
    main()
