"""SIFT-family descriptors as batched tensor contractions.

Reference: `SIFTDescriptor` (matching/siftdesc.{h,cpp}).  The per-pixel
trilinear binning loop (siftdesc.cpp:73-131) becomes, per orientation bin,
a pair of small matmuls: desc[b, d, o] = Wr[r, b] * V_o[r, c] * Wc[c, d],
batched over thousands of patches — MXU work instead of scalar scatter.

Variants (selected by SIFTDescriptorParams): SIFT, RootSIFT, HalfSIFT,
HalfRootSIFT, MagnLessSIFT; all normalized and quantized to the
"length-512, clip-255" integer convention of the reference
(siftdesc.cpp:247-278).  DSP-SIFT pooling is in `describe.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.config import SIFTDescriptorParams
from mods_tpu.ops.image import circular_gauss_mask, patch_gradient


@functools.lru_cache(maxsize=16)
def spatial_bin_weights(patch_size: int, spatial_bins: int) -> np.ndarray:
    """(P, B) weight matrix from the reference's precomputeBinsAndWeights
    (siftdesc.cpp:22-70): each pixel contributes to <=2 spatial bins with
    linear weights; outside bins get weight 0."""
    half = patch_size >> 1
    step = float(spatial_bins + 1) / (2 * half)
    W = np.zeros((patch_size, spatial_bins), np.float32)
    for i in range(patch_size):
        x = step * i
        xi = int(x)
        b0, b1 = xi - 1, xi
        w1 = x - xi
        w0 = 1.0 - w1
        if 0 <= b0 < spatial_bins:
            W[i, b0] += w0
        if 0 <= b1 < spatial_bins:
            W[i, b1] += w1
    return W


def sift_histograms(patches: jax.Array, p: SIFTDescriptorParams
                    ) -> jax.Array:
    """(K, P, P) -> unnormalized (K, spatial, spatial, ori) histograms."""
    k, pS, _ = patches.shape
    mask = jnp.asarray(circular_gauss_mask(pS))
    gx, gy = patch_gradient(patches)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    if p.magn_less:
        val = jnp.ones_like(mag)
    else:
        val = mask[None] * mag

    ob = p.orientation_bins
    o = ob * (ori + 2.0 * jnp.pi) / (2.0 * jnp.pi)
    bo0 = o.astype(jnp.int32)
    wo1 = o - bo0.astype(o.dtype)
    bo0 = bo0 % ob
    bo1 = (bo0 + 1) % ob
    wo0 = 1.0 - wo1

    W = jnp.asarray(spatial_bin_weights(pS, p.spatial_bins))  # (P, B)
    out = []
    for b in range(ob):
        vo = val * (jnp.where(bo0 == b, wo0, 0.0)
                    + jnp.where(bo1 == b, wo1, 0.0))  # (K, P, P)
        out.append(jnp.einsum("rb,krc,cd->kbd", W, vo, W,
                              preferred_element_type=jnp.float32))
    return jnp.stack(out, axis=-1)  # (K, B, B, ob)


def _l2_normalize(v: jax.Array) -> jax.Array:
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.where(n > 0, n, 1.0)


def sift_norm(v: jax.Array, max_bin: float, root: bool) -> jax.Array:
    """SIFTnorm / RootSIFTnorm (siftdesc.cpp:199-278): L2 -> clip ->
    re-L2 -> (root: L1+sqrt) -> round(512*v) clipped to [0, 255]."""
    v = _l2_normalize(v)
    v = jnp.minimum(v, max_bin)
    v = _l2_normalize(v)
    if root:
        s = jnp.sum(jnp.abs(v), axis=-1, keepdims=True)
        v = jnp.sqrt(v / jnp.where(s > 0, s, 1.0))
    q = jnp.clip(jnp.floor(512.0 * v + 0.5), 0.0, 255.0)
    return q


def compute_sift(patches: jax.Array, p: SIFTDescriptorParams) -> jax.Array:
    """(K, P, P) float patches -> (K, dims) quantized descriptors."""
    h = sift_histograms(patches, p)
    k = h.shape[0]
    if p.half_sift:
        ob = p.orientation_bins
        half = ob // 2
        h = h[..., :half] + h[..., half:]
    v = h.reshape(k, -1)
    if p.do_norm:
        v = sift_norm(v, p.max_bin_value, p.root_sift)
    return v
