"""Geometric residuals for H and F, batched over (hypotheses, points).

Reference error functions: degensac/Htools.c (HDs/HDsSym/HDsSymMax) and
degensac/Ftools.c (FDs/FDsSym).  Convention here: H maps image1 -> image2
homogeneous coords (x2 ~ H x1); F is the fundamental matrix with
x2^T F x1 = 0.  The reference's internal transposed storage is an
implementation detail we do not reproduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv_3x3(H: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 3, 3)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)], -2)
    return adj / det[..., None, None]


def h_transfer(H: jax.Array, xy: jax.Array) -> jax.Array:
    """Apply (..., 3, 3) H to (N, 2) points -> (..., N, 2)."""
    x, y = xy[..., 0], xy[..., 1]
    w = H[..., 2:3, 0] * x + H[..., 2:3, 1] * y + H[..., 2:3, 2]
    u = (H[..., 0:1, 0] * x + H[..., 0:1, 1] * y + H[..., 0:1, 2]) / w
    v = (H[..., 1:2, 0] * x + H[..., 1:2, 1] * y + H[..., 1:2, 2]) / w
    return jnp.stack([u, v], axis=-1)


def h_error_symm(H: jax.Array, xy1: jax.Array, xy2: jax.Array,
                 Hinv: jax.Array | None = None,
                 mode: str = "sum") -> jax.Array:
    """Symmetric transfer error (HDsSym / HDsSymMax, Htools.c:26-39).

    H: (..., 3, 3); xy1, xy2: (N, 2).  Returns (..., N) squared px error:
    |x2 - H x1|^2 (+|max) |x1 - H^-1 x2|^2.
    """
    if Hinv is None:
        Hinv = inv_3x3(H)
    f = h_transfer(H, xy1) - xy2
    b = h_transfer(Hinv, xy2) - xy1
    d1 = jnp.sum(f * f, axis=-1)
    d2 = jnp.sum(b * b, axis=-1)
    if mode == "max":
        return jnp.maximum(d1, d2)
    return d1 + d2


def h_error_forward(H: jax.Array, xy1: jax.Array,
                    xy2: jax.Array) -> jax.Array:
    """One-directional transfer |x2 - H x1|^2 (HDsi-style)."""
    f = h_transfer(H, xy1) - xy2
    return jnp.sum(f * f, axis=-1)


def f_epipolar_lines(F: jax.Array, xy1: jax.Array) -> jax.Array:
    """l2 = F x1 for (..., 3, 3) x (N, 2) -> (..., N, 3)."""
    ones = jnp.ones_like(xy1[..., :1])
    x1 = jnp.concatenate([xy1, ones], axis=-1)  # (N, 3)
    return jnp.einsum("...ij,nj->...ni", F, x1)


def f_error_sampson(F: jax.Array, xy1: jax.Array,
                    xy2: jax.Array) -> jax.Array:
    """Sampson distance^2 (FDs, degensac/Ftools.c)."""
    ones = jnp.ones_like(xy1[..., :1])
    x1 = jnp.concatenate([xy1, ones], axis=-1)
    x2 = jnp.concatenate([xy2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, x2)
    num = jnp.einsum("ni,...ni->...n", x2, Fx1)
    den = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
           + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return num * num / jnp.maximum(den, 1e-20)


def f_error_symepi(F: jax.Array, xy1: jax.Array,
                   xy2: jax.Array) -> jax.Array:
    """Symmetric squared epipolar distance (FDsSym, Ftools.c)."""
    ones = jnp.ones_like(xy1[..., :1])
    x1 = jnp.concatenate([xy1, ones], axis=-1)
    x2 = jnp.concatenate([xy2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, x2)
    num = jnp.einsum("ni,...ni->...n", x2, Fx1)
    d1 = num * num / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-20)
    d2 = num * num / jnp.maximum(
        Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-20)
    return d1 + d2
