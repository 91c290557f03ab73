"""Image primitives: grayscale, padding, resampling, gradients.

TPU-native equivalents of the reference's OpenCV/`detectors/helpers.cpp`
image utilities (grayscale mean at synth-detection.cpp:257-262, halfImage
via cv::resize 0.5 at pyramid.cpp:516, computeGradient helpers.cpp).
Everything is float32, value range 0..255, NHW layout (no channel axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_gray_np(img: np.ndarray) -> np.ndarray:
    """Host-side to_gray twin: RGB (H, W, 3) or gray (H, W) -> float32
    equal-weight mean gray (synth-detection.cpp:257-262).  Input images
    live on the host; converting there avoids a pointless
    host->device->host round trip of the full image."""
    img = np.asarray(img, np.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1, dtype=np.float32)
    return img


def to_gray(img: jax.Array) -> jax.Array:
    """RGB (H, W, 3) or gray (H, W) uint8/float -> float32 mean-gray.

    The reference averages the three planes equally
    (synth-detection.cpp:257-262), not a luma-weighted mix.
    """
    img = img.astype(jnp.float32)
    if img.ndim == 3:
        img = jnp.mean(img, axis=-1)
    return img


def pad_to(img: jax.Array, h: int, w: int, value: float = 0.0) -> jax.Array:
    """Pad a (H, W) image at bottom/right to static canvas (h, w)."""
    ph, pw = h - img.shape[-2], w - img.shape[-1]
    assert ph >= 0 and pw >= 0, (img.shape, h, w)
    cfg = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(img, cfg, constant_values=value)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def half_image(img: jax.Array) -> jax.Array:
    """2x downsample by 2x2 mean pooling (≈ cv::resize 0.5 INTER_LINEAR
    on even sizes, the reference's next-octave step pyramid.cpp:516-518).

    Works on (..., H, W); H and W must be even.
    """
    h, w = img.shape[-2], img.shape[-1]
    if (h % 2) or (w % 2):              # crop odd tail (cv halfImage)
        img = img[..., :h - (h % 2), :w - (w % 2)]
    x = img.reshape(img.shape[:-2] + (h // 2, 2, w // 2, 2))
    return x.mean(axis=(-3, -1))


def double_image(img: jax.Array) -> jax.Array:
    """2x bilinear upsample matching the reference's doubleImage
    (helpers.cpp): output (2H-1, 2W-1) with in-between averaging, applied
    over (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    # rows: interleave original and averaged rows
    a = img
    row_avg = 0.5 * (a[..., :-1, :] + a[..., 1:, :])
    rows = jnp.zeros(a.shape[:-2] + (2 * h - 1, w), a.dtype)
    rows = rows.at[..., 0::2, :].set(a)
    rows = rows.at[..., 1::2, :].set(row_avg)
    col_avg = 0.5 * (rows[..., :, :-1] + rows[..., :, 1:])
    out = jnp.zeros(a.shape[:-2] + (2 * h - 1, 2 * w - 1), a.dtype)
    out = out.at[..., :, 0::2].set(rows)
    out = out.at[..., :, 1::2].set(col_avg)
    return out


def gradient(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradient, zero on the 1px border
    (reference computeGradient, helpers.cpp:800-838). (..., H, W)."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[..., 1:-1, 1:-1].set(img[..., 1:-1, 2:] - img[..., 1:-1, :-2])
    gy = gy.at[..., 1:-1, 1:-1].set(img[..., 2:, 1:-1] - img[..., :-2, 1:-1])
    return gx, gy


def patch_gradient(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gradient with one-sided differences at the borders, as used on
    descriptor patches (reference siftdesc.cpp:300-325). (..., H, W)."""
    gx = jnp.concatenate([
        p[..., :, 1:2] - p[..., :, 0:1],
        p[..., :, 2:] - p[..., :, :-2],
        p[..., :, -1:] - p[..., :, -2:-1],
    ], axis=-1)
    gy = jnp.concatenate([
        p[..., 1:2, :] - p[..., 0:1, :],
        p[..., 2:, :] - p[..., :-2, :],
        p[..., -1:, :] - p[..., -2:-1, :],
    ], axis=-2)
    return gx, gy


def circular_gauss_mask(size: int, sigma: float = 0.0) -> np.ndarray:
    """The reference's computeCircularGaussMask (helpers.cpp): Gaussian
    weights exp(-d^2/sigma2), zero outside the strictly inscribed circle.
    sigma==0 selects sigma2 = 0.9 * halfSize^2."""
    half = size >> 1
    r2 = float(half * half)
    sigma2 = 0.9 * r2 if sigma == 0 else 2.0 * float(sigma) * float(sigma)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float64)
    d2 = (xs - half) ** 2 + (ys - half) ** 2
    mask = np.where(d2 < r2, np.exp(-d2 / sigma2), 0.0)
    return mask.astype(np.float32)


def gauss_mask(size: int) -> np.ndarray:
    """Separable Gaussian mask with 3*sigma fit into halfSize —
    the reference's computeGaussMask used for the Baumberg SMM window
    (helpers.cpp; wrap-around correction term omitted, it is ~exp(-18))."""
    half = size >> 1
    scale = half / 3.0
    i = np.arange(-half, size - half, dtype=np.float64)
    t = np.exp(-(i * i) / (2.0 * scale * scale))
    return np.outer(t, t).astype(np.float32)
