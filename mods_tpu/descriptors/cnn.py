"""CNN patch descriptor — the TPU-native counterpart of the reference's
Caffe descriptor slot (imagerepresentation.cpp:1343-1534, WITH_CAFFE).

The reference extracts patches from the original image at
CaffeDescParam.{mrSize,patchSize}, mean-subtracts per channel, runs a
batched Caffe forward, reads a named layer blob, and L1/L2/RootL2
normalizes (GetCaffePars, io_mods.cpp:467-485).  Here the patch batch is
already a device tensor, so the forward is a fused conv stack on the
MXU — the single most TPU-native descriptor in the inventory.

Weights come from an ``.npz`` (keys w1,b1,w2,b2,w3,b3 — the analogue of
WeightsFile) or, by default, from a procedural deterministic bank (Gabor
first layer + orthogonalized random deeper layers) so the slot works
and is testable without external files, like the TILDE procedural bank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# input patches are uint8-quantized gray in the reference (cvMatToDatum
# of CV_8U); per-channel means B104 G117 R123 average to this
MEAN_GRAY = (104.0 + 117.0 + 123.0) / 3.0


def _gabor_bank(k: int, n: int, rng) -> np.ndarray:
    """(n, 1, k, k) oriented Gabor + center-surround filters."""
    half = k // 2
    y, x = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float64)
    out = []
    n_ori = max(n - 2, 1)
    for i in range(n):
        if i == n - 1:          # DoG center-surround
            f = (np.exp(-(x**2 + y**2) / (2 * 1.0**2))
                 - 0.55 * np.exp(-(x**2 + y**2) / (2 * 2.0**2)))
        elif i == n - 2:        # low-pass
            f = np.exp(-(x**2 + y**2) / (2 * 1.5**2))
        else:
            th = np.pi * i / n_ori
            lam = 3.0 + 2.0 * (i % 2)
            xr = x * np.cos(th) + y * np.sin(th)
            yr = -x * np.sin(th) + y * np.cos(th)
            f = (np.exp(-(xr**2 + 0.5 * yr**2) / (2 * 1.8**2))
                 * np.cos(2 * np.pi * xr / lam))
        f = f - f.mean()
        f = f / max(np.abs(f).sum(), 1e-9)
        out.append(f)
    return np.asarray(out, np.float32)[:, None]


def _ortho(rng, shape) -> np.ndarray:
    """Random matrix with orthonormal rows (QR), reshaped to `shape`."""
    fan_out = shape[0]
    fan_in = int(np.prod(shape[1:]))
    n = max(fan_out, fan_in)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    return (q[:fan_out, :fan_in] * np.sqrt(2.0)).reshape(shape) \
        .astype(np.float32)


@functools.lru_cache(maxsize=8)
def procedural_weights(patch_size: int = 32, dim: int = 128,
                       seed: int = 0):
    """Deterministic default net: 5x5 Gabor conv (16ch) -> pool2 ->
    5x5 conv (32ch) -> pool2 -> global conv head to ``dim``."""
    rng = np.random.default_rng(seed)
    c1, c2 = 16, 32
    w1 = _gabor_bank(5, c1, rng)                      # (16,1,5,5)
    b1 = np.zeros((c1,), np.float32)
    w2 = _ortho(rng, (c2, c1, 5, 5)) / 5.0
    b2 = np.zeros((c2,), np.float32)
    s = patch_size
    s = (s - 4)  # conv1 VALID
    s = s // 2   # pool
    s = (s - 4)  # conv2 VALID
    s = s // 2   # pool
    w3 = _ortho(rng, (dim, c2, s, s)) / float(s)
    b3 = np.zeros((dim,), np.float32)
    return (w1, b1, w2, b2, w3, b3)


@functools.lru_cache(maxsize=8)
def load_weights(path: str):
    """WeightsFile analogue: an .npz with w1,b1,w2,b2,w3,b3 (OIHW)."""
    z = np.load(path)
    return tuple(np.asarray(z[k], np.float32)
                 for k in ("w1", "b1", "w2", "b2", "w3", "b3"))


DEFAULT_WEIGHTS = __file__.replace(
    "descriptors/cnn.py", "data/cnn_patch128.npz")


def weights_for(path: str, patch_size: int, dim: int):
    """WeightsFile resolution: explicit path > packaged trained net
    (mods_tpu/data/cnn_patch128.npz, trained by
    scripts/train_cnn_desc.py on affine/photometric patch pairs) >
    procedural Gabor bank (always available)."""
    if path:
        return load_weights(path)
    import os
    if (patch_size == 32 and dim == 128
            and os.path.exists(DEFAULT_WEIGHTS)):
        return load_weights(DEFAULT_WEIGHTS)
    return procedural_weights(patch_size, dim)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return y + jnp.asarray(b)[None, :, None, None]


def _pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def cnn_forward(patches: jax.Array, weights, normalization: str = "L2"
                ) -> jax.Array:
    """(N, P, P) gray patches in [0,255] -> (N, dim) descriptors.

    Forward + blob normalization per imagerepresentation.cpp:1497-1527
    (L2 / L1 / RootL2 / none)."""
    w1, b1, w2, b2, w3, b3 = weights
    x = (patches[:, None] - MEAN_GRAY) / 128.0
    x = jax.nn.relu(_conv(x, w1, b1))
    x = _pool2(x)
    x = jax.nn.relu(_conv(x, w2, b2))
    x = _pool2(x)
    x = _conv(x, w3, b3)                    # (N, dim, 1, 1)
    v = x.reshape(x.shape[0], -1)
    if normalization == "L2":
        v = v / jnp.maximum(
            jnp.sqrt(jnp.sum(v * v, -1, keepdims=True)), 1e-9)
    elif normalization == "L1":
        v = v / jnp.maximum(jnp.sum(jnp.abs(v), -1, keepdims=True), 1e-9)
    elif normalization == "RootL2":
        v = v / jnp.maximum(jnp.sum(jnp.abs(v), -1, keepdims=True), 1e-9)
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return v
