"""Separable Gaussian blur as XLA convolutions.

Mirrors the reference's `gaussianBlur` (helpers.cpp): kernel size
``int(6*sigma+1)`` forced odd, replicate border, sampled-Gaussian taps
(OpenCV ``getGaussianKernel`` semantics).  XLA fuses the two 1-D convs and
maps them onto the VPU/MXU; the batch axis carries synthetic views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def gauss_kernel_1d(sigma: float) -> np.ndarray:
    """OpenCV-style sampled Gaussian taps, normalized to sum 1."""
    size = int(2.0 * 3.0 * float(sigma) + 1.0)
    if size % 2 == 0:
        size += 1
    size = max(size, 3)
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * float(sigma) * float(sigma)))
    k /= k.sum()
    return k.astype(np.float32)


@functools.lru_cache(maxsize=256)
def blur_band_matrix(n: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix M with out = M @ x == replicate-border
    Gaussian filtering of a length-n signal.

    XLA lowers single-channel 2-D convolutions poorly on TPU (they miss
    the MXU); expressing the separable blur as two banded matmuls runs at
    matrix-unit speed instead.  Border replication is absorbed into the
    clamped column indices.
    """
    taps = gauss_kernel_1d(sigma)
    half = len(taps) // 2
    M = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for k, t in enumerate(taps):
        j = np.clip(idx + k - half, 0, n - 1)
        np.add.at(M, (idx, j), t)
    return M


def _conv1d(img: jax.Array, taps: jax.Array, axis: int) -> jax.Array:
    """Convolve (..., H, W) along `axis` (-1 or -2) with replicate border."""
    half = taps.shape[0] // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (half, half)
    x = jnp.pad(img, pad, mode="edge")
    # windowed dot: use conv_general_dilated on a flattened batch
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    x4 = x.reshape((-1, 1, h, w))
    if axis == -1 or axis == img.ndim - 1:
        rhs = taps.reshape(1, 1, 1, -1)
    else:
        rhs = taps.reshape(1, 1, -1, 1)
    y = jax.lax.conv_general_dilated(
        x4, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return y.reshape(lead + y.shape[-2:])


def _band_matrix_rt(n: int, sigma: jax.Array, radius: int) -> jax.Array:
    """(n, n) replicate-border Gaussian band matrix built IN-GRAPH from a
    traced sigma — so one compiled render program serves every view
    group's anti-alias blur (sigmas vary per tilt/zoom;
    synth-detection.cpp:349-363).  Tap support is the reference's
    ``int(6*sigma+1)`` odd window, zero-padded to the static 2*radius+1
    band."""
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    size = jnp.floor(6.0 * sigma + 1.0)
    size = size + (1.0 - jnp.mod(size, 2.0))      # force odd
    size = jnp.maximum(size, 3.0)
    half = (size - 1.0) / 2.0
    taps = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    taps = jnp.where(jnp.abs(x) <= half, taps, 0.0)
    taps = taps / jnp.sum(taps)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]
    M = jnp.zeros((n, n), jnp.float32)
    for k in range(2 * radius + 1):
        j = jnp.clip(rows + (k - radius), 0, n - 1)
        M = M + jnp.where(cols == j, taps[k], 0.0)
    return M


# static band radius for the runtime-sigma blur: covers int(6*sigma+1)
# for every sigma the synthesis grids produce (tilt<=12 at initSigma 0.8
# -> sigma_aa 4.8 -> half-window 14)
RT_BLUR_RADIUS = 15


def gaussian_blur_rt(img: jax.Array, sigma_x: jax.Array,
                     sigma_y: jax.Array,
                     radius: int = RT_BLUR_RADIUS) -> jax.Array:
    """Anisotropic replicate-border blur of (..., H, W) with TRACED
    sigmas, as two banded matmuls (MXU path)."""
    h, w = img.shape[-2], img.shape[-1]
    My = _band_matrix_rt(h, sigma_y, radius)
    Mx = _band_matrix_rt(w, sigma_x, radius)
    out = jnp.einsum("ij,...jk->...ik", My, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("...ij,kj->...ik", out, Mx,
                     preferred_element_type=jnp.float32)
    return out


def gaussian_blur(img: jax.Array, sigma: float,
                  sigma_y: float | None = None) -> jax.Array:
    """Blur (..., H, W) with replicate-border separable Gaussian.

    ``sigma_y`` enables the anisotropic anti-alias blur used by view
    synthesis (reference synth-detection.cpp:404-414).

    On accelerators this runs as two banded matmuls (MXU path); the CPU
    test backend keeps the cheaper sliding conv.
    """
    if sigma_y is None:
        sigma_y = sigma
    if jax.default_backend() == "cpu":
        kx = jnp.asarray(gauss_kernel_1d(float(sigma)))
        ky = jnp.asarray(gauss_kernel_1d(float(sigma_y)))
        out = _conv1d(img, ky, axis=-2)
        out = _conv1d(out, kx, axis=-1)
        return out
    h, w = img.shape[-2], img.shape[-1]
    My = jnp.asarray(blur_band_matrix(h, float(sigma_y)))
    Mx = jnp.asarray(blur_band_matrix(w, float(sigma)))
    out = jnp.einsum("ij,...jk->...ik", My, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("...ij,kj->...ik", out, Mx,
                     preferred_element_type=jnp.float32)
    return out
