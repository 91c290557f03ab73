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


def h_error_sampson(H: jax.Array, xy1: jax.Array,
                    xy2: jax.Array) -> jax.Array:
    """Sampson (first-order geometric) H error — the reference's `HDs`
    (Htools.c:158-200), used when the config's ErrorType is Sampson.

    Algebraic residual e = [x2*w - u, y2*w - v] with (u, v, w) = H x1;
    sampson^2 = e^T (J J^T)^{-1} e over the Jacobian in (x1,y1,x2,y2).
    Noticeably SMALLER than the symmetric transfer error, so a 3 px
    Sampson threshold admits more points than 3 px symmetric-sum.
    """
    x1, y1 = xy1[..., 0], xy1[..., 1]
    x2, y2 = xy2[..., 0], xy2[..., 1]

    def row(i):   # H[..., i, :] applied to homog x1 -> (..., N)
        return (H[..., i:i + 1, 0] * x1 + H[..., i:i + 1, 1] * y1
                + H[..., i:i + 1, 2])

    def hij(i, j):  # entry broadcast against (..., N)
        return H[..., i:i + 1, j]

    u, v, w = row(0), row(1), row(2)
    e1 = x2 * w - u
    e2 = y2 * w - v
    # J rows: d e1/d(x1,y1,x2,y2), d e2/d(x1,y1,x2,y2)
    j11 = x2 * hij(2, 0) - hij(0, 0)
    j12 = x2 * hij(2, 1) - hij(0, 1)
    j21 = y2 * hij(2, 0) - hij(1, 0)
    j22 = y2 * hij(2, 1) - hij(1, 1)
    # JJ^T with the w terms from d/dx2, d/dy2
    a = j11 * j11 + j12 * j12 + w * w
    b = j11 * j21 + j12 * j22
    c = j21 * j21 + j22 * j22 + w * w
    det = jnp.maximum(a * c - b * b, 1e-12)
    return (c * e1 * e1 - 2.0 * b * e1 * e2 + a * e2 * e2) / det


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
