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


def _taps_rt(sigma: jax.Array, radius: int) -> jax.Array:
    """(2*radius+1,) Gaussian taps from a TRACED sigma, windowed to the
    reference's ``int(6*sigma+1)`` odd support (taps outside are zero)."""
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    size = jnp.floor(6.0 * sigma + 1.0)
    size = size + (1.0 - jnp.mod(size, 2.0))      # force odd
    size = jnp.maximum(size, 3.0)
    half = (size - 1.0) / 2.0
    taps = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    taps = jnp.where(jnp.abs(x) <= half, taps, 0.0)
    return taps / jnp.sum(taps)


def _shift_blur(img: jax.Array, taps: jax.Array, axis: int) -> jax.Array:
    """Replicate-border 1-D blur along `axis` as a shift-and-add sum:
    out = Σ_k taps[k] · img shifted by (k - r).

    O(taps · H · W) elementwise work on the VPU — the previous dense
    (n, n) band-matrix matmul did O(n · H · W), ~40-100x more FLOPs at
    canvas sizes, and profiled as the Synth/Detect phase floor
    (PROFILE_ladder.json r4: Synth 5.1 s vs reference 1.2 s).  XLA fuses
    the shifted adds into a few passes; taps may be traced values."""
    r = taps.shape[0] // 2
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    out = None
    for k in range(taps.shape[0]):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(k, k + n)
        term = taps[k] * x[tuple(sl)]
        out = term if out is None else out + term
    return out


# static band radius for the runtime-sigma blur: covers int(6*sigma+1)
# for every sigma the synthesis grids produce (tilt<=12 at initSigma 0.8
# -> sigma_aa 4.8 -> half-window 14)
RT_BLUR_RADIUS = 15


def gaussian_blur_rt(img: jax.Array, sigma_x: jax.Array,
                     sigma_y: jax.Array,
                     radius: int = RT_BLUR_RADIUS) -> jax.Array:
    """Anisotropic replicate-border blur of (..., H, W) with TRACED
    sigmas (one compiled program serves every view group's anti-alias
    blur; sigmas vary per tilt/zoom, synth-detection.cpp:349-363)."""
    out = _shift_blur(img, _taps_rt(sigma_y, radius), axis=-2)
    return _shift_blur(out, _taps_rt(sigma_x, radius), axis=-1)


def gaussian_blur(img: jax.Array, sigma: float,
                  sigma_y: float | None = None) -> jax.Array:
    """Blur (..., H, W) with replicate-border separable Gaussian.

    ``sigma_y`` enables the anisotropic anti-alias blur used by view
    synthesis (reference synth-detection.cpp:404-414).

    Static-sigma path: shift-and-add with exactly the reference's
    ``int(6*sigma+1)`` sampled taps (helpers.cpp gaussianBlur); the CPU
    test backend uses the sliding conv (same taps, same result).
    """
    if sigma_y is None:
        sigma_y = sigma
    kx = jnp.asarray(gauss_kernel_1d(float(sigma)))
    ky = jnp.asarray(gauss_kernel_1d(float(sigma_y)))
    if jax.default_backend() == "cpu":
        out = _conv1d(img, ky, axis=-2)
        out = _conv1d(out, kx, axis=-1)
        return out
    out = _shift_blur(img, ky, axis=-2)
    return _shift_blur(out, kx, axis=-1)
