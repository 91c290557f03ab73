"""Anti-aliased descriptor patch extraction, batched and static-shape.

Reference: `DescribeRegions` (synth-detection.hpp:169-255).  Per region the
reference samples a native-resolution patch of dynamic size
patchImageSize = 2*ceil(s*mrSize)+1, blurs it with sigma
1.5*imageToPatchScale and subsamples to patchSize (the AA path taken
whenever imageToPatchScale > 0.4).

Dynamic patch sizes don't exist on TPU, so the same math is re-expressed
with a fixed 2x-oversampled grid: sample a (2P+1)^2 patch with step
t*P/(2P+1) <= 1 image px, blur with the *constant* sigma
1.5 * (2P+1)/P patch px (== 1.5*t image px), and resample the P^2 patch
at the constant stride (2P+1)/P.  This is algebraically the reference
pipeline for t <= (2P+1)/P (≈2); larger regions take the mip-level
windowed path below (extract_descriptor_patches_mip + ops/sampler
mip_stack), which bounds the per-step sampling stride via level
selection — the production pipeline uses that path exclusively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.ops.gaussian import gauss_kernel_1d
from mods_tpu.ops.image import circular_gauss_mask
from mods_tpu.ops.warp import bilinear_sample, extract_patches, patch_grid


def image_to_patch_scale(s: jax.Array, mr_size: float,
                         patch_size: int) -> jax.Array:
    """t = (2*ceil(s*mrSize)+1) / patchSize (synth-detection.hpp:187-189)."""
    return (2.0 * jnp.ceil(s * mr_size) + 1.0) / patch_size


def blur_patches(patches: jax.Array, sigma: float) -> jax.Array:
    """(K, P, P) separable blur with replicate borders, as two batched
    banded matmuls (MXU path; see ops/gaussian.blur_band_matrix)."""
    from mods_tpu.ops.gaussian import blur_band_matrix
    P = patches.shape[-1]
    M = jnp.asarray(blur_band_matrix(P, float(sigma)))
    out = jnp.einsum("ij,kjc->kic", M, patches,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("kic,jc->kij", out, M,
                     preferred_element_type=jnp.float32)
    return out


def _resample_matrix(P: int, SP: int):
    """(P, SP) bilinear row-interpolation matrix for the fixed resample
    grid c_i = (i - P//2) * SP/P + SP//2 — the constant-stride subsample
    of the oversampled patch.  Static (numpy) so it folds into the blur
    band matrix at trace time."""
    import numpy as np
    half = P >> 1
    c = (np.arange(P) - half) * (SP / P) + (SP >> 1)
    i0 = np.clip(np.floor(c).astype(np.int64), 0, SP - 2)
    w = (c - i0).astype(np.float32)
    R = np.zeros((P, SP), np.float32)
    R[np.arange(P), i0] = 1.0 - w
    R[np.arange(P), i0 + 1] = w
    return R


def extract_descriptor_patches(img: jax.Array, xy: jax.Array, A: jax.Array,
                               s: jax.Array, mr_size: float,
                               patch_size: int,
                               photo_norm: bool = False) -> jax.Array:
    """(K,) regions on (H, W) view image -> (K, P, P) float patches."""
    P = patch_size
    SP = 2 * P + 1
    t = image_to_patch_scale(s, mr_size, P)          # (K,)

    # AA path: oversampled native patch -> fixed blur -> fixed resample.
    # Blur (band matrix) and bilinear resample are both separable linear
    # maps on the fixed SP grid, so they fold into ONE (P, SP) matrix and
    # the whole AA step is two batched MXU matmuls — no per-patch gather.
    step = (t * P / SP)[:, None, None]
    over = extract_patches(img, xy, A * step, SP)    # (K, SP, SP)
    from mods_tpu.ops.gaussian import blur_band_matrix
    import numpy as np
    M2 = jnp.asarray(
        _resample_matrix(P, SP) @ np.asarray(
            blur_band_matrix(SP, 1.5 * SP / P), np.float32))  # (P, SP)
    aa = jnp.einsum("ps,ksq->kpq", M2, over,
                    preferred_element_type=jnp.float32)
    aa = jnp.einsum("kpq,rq->kpr", aa, M2,
                    preferred_element_type=jnp.float32)

    # direct path for heavy oversampling (t <= 0.4)
    direct = extract_patches(img, xy, A * t[:, None, None], P)
    patches = jnp.where((t > 0.4)[:, None, None], aa, direct)

    if photo_norm:
        patches = photometric_normalize(patches)
    return patches


DESC_MIP_LEVELS = 4


def extract_descriptor_patches_mip(mips: jax.Array, valid_hw: jax.Array,
                                   xy: jax.Array, A: jax.Array,
                                   s: jax.Array, mr_size: float,
                                   patch_size: int,
                                   photo_norm: bool = False) -> jax.Array:
    """Mip-level windowed patch extraction (the fast TPU path).

    Same AA semantics as extract_descriptor_patches, restructured: per
    keypoint pick the mip level that bounds the sampling step, sample the
    P x P patch directly, then apply the reference's 1.5-step Gaussian
    (constant in patch px) as a band-matrix matmul.  Level >= 1 sources
    already carry ~MIP_SIGMA of prefilter, so their post-blur is reduced
    to keep the total near 1.5 sampling steps.  t <= 0.4 keeps the
    reference's direct unblurred path (synth-detection.hpp:196-200).

    mips/valid_hw from mods_tpu.ops.sampler.mip_stack(img, DESC_MIP_LEVELS).
    """
    from mods_tpu.ops.sampler import sample_affine_patches, select_level
    P = patch_size
    t = image_to_patch_scale(s, mr_size, P)          # (K,)
    As = A * t[:, None, None]
    lvl, scale = select_level(As, P, mips.shape[0])
    raw = sample_affine_patches(
        mips, lvl, xy / scale[:, None], As / scale[:, None, None],
        P, valid_hw)
    return aa_filter_patches(raw, lvl, t, photo_norm=photo_norm)


def aa_filter_patches(raw: jax.Array, lvl: jax.Array, t: jax.Array,
                      photo_norm: bool = False) -> jax.Array:
    """The post-sampling half of the AA pipeline (shared by the
    per-view and cross-view-compacted paths): the reference's
    1.5-sampling-step Gaussian as a band-matrix matmul, reduced for
    mip levels that already carry prefilter, plus the direct path for
    t <= 0.4 (synth-detection.hpp:196-200)."""
    from mods_tpu.ops.gaussian import blur_band_matrix
    import numpy as np
    P = raw.shape[-1]
    B15 = jnp.asarray(np.asarray(blur_band_matrix(P, 1.5), np.float32))
    B09 = jnp.asarray(np.asarray(blur_band_matrix(P, 0.9), np.float32))

    def band(Bm, x):
        y = jnp.einsum("ij,kjc->kic", Bm, x,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("kic,jc->kij", y, Bm,
                          preferred_element_type=jnp.float32)

    aa = jnp.where((lvl == 0)[:, None, None], band(B15, raw),
                   band(B09, raw))
    patches = jnp.where((t > 0.4)[:, None, None], aa, raw)
    if photo_norm:
        patches = photometric_normalize(patches)
    return patches


def photometric_normalize(patches: jax.Array) -> jax.Array:
    """reference photometricallyNormalize (helpers.cpp:712-760): shift to
    mean 128, scale to std 50, clip 0..255, masked by the circular
    Gaussian support."""
    P = patches.shape[-1]
    mask = jnp.asarray(circular_gauss_mask(P)) > 0
    n = jnp.sum(mask)
    mean = jnp.sum(jnp.where(mask[None], patches, 0.0),
                   axis=(1, 2), keepdims=True) / n
    var = jnp.sum(jnp.where(mask[None], (patches - mean) ** 2, 0.0),
                  axis=(1, 2), keepdims=True) / n
    std = jnp.sqrt(var)
    out = 128.0 + (50.0 / jnp.maximum(std, 1e-4)) * (patches - mean)
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.where(std < 1e-4, patches, out)
