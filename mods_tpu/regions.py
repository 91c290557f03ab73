"""Fixed-capacity SoA container for affine-covariant regions.

The reference stores per-keypoint ``AffineKeypoint`` structs in
``std::vector`` (reference detectors/structures.hpp:208-218,
``AffineRegion`` :227-246).  On TPU, dynamic-length vectors are replaced by
static-capacity arrays plus a validity mask; counts are ``mask.sum()``.

A region is an affine frame: center ``xy``, unit-determinant 2x2 shape
matrix ``A`` (maps the unit circle to the region ellipse, "a11..a22" in the
reference), isotropic scale ``s`` in pixels, detector response, and a
point sub-type (dark/bright/saddle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Regions:
    """SoA batch of affine regions. All arrays share the leading shape.

    Leading shape is typically ``(K,)`` or ``(V, K)`` (views x capacity).
    """

    xy: jax.Array        # (..., 2) float32 — subpixel center, image coords
    A: jax.Array         # (..., 2, 2) float32 — unit-det affine shape matrix
    s: jax.Array         # (...,) float32 — scale in pixels
    response: jax.Array  # (...,) float32 — detector response
    sub_type: jax.Array  # (...,) int32 — dark/bright/saddle point type
    mask: jax.Array      # (...,) bool — validity

    @property
    def capacity(self) -> int:
        return self.mask.shape[-1]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(shape, dtype=jnp.float32) -> "Regions":
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        return Regions(
            xy=jnp.zeros(shape + (2,), dtype),
            A=jnp.broadcast_to(jnp.eye(2, dtype=dtype), shape + (2, 2)),
            s=jnp.ones(shape, dtype),
            response=jnp.zeros(shape, dtype),
            sub_type=jnp.zeros(shape, jnp.int32),
            mask=jnp.zeros(shape, bool),
        )

    def flatten(self) -> "Regions":
        """Collapse all leading axes into one capacity axis."""
        def f(x, extra):
            return x.reshape((-1,) + x.shape[x.ndim - extra:])
        return Regions(
            xy=f(self.xy, 1), A=f(self.A, 2), s=f(self.s, 0),
            response=f(self.response, 0), sub_type=f(self.sub_type, 0),
            mask=f(self.mask, 0),
        )

    def take(self, idx: jax.Array) -> "Regions":
        """Gather regions along the capacity axis.

        ``idx`` has the same leading (batch) shape as ``mask`` with the
        capacity axis replaced by the gather size (take_along_axis
        semantics, so it also works on ``(V, K)`` batched region sets).
        """
        cap_axis = self.mask.ndim - 1

        def g(x):
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim))
            return jnp.take_along_axis(x, ix, axis=cap_axis)
        return jax.tree.map(g, self)

    def masked_where(self, keep: jax.Array) -> "Regions":
        return self.replace(mask=self.mask & keep)


def concat_regions(rs: list[Regions]) -> Regions:
    """Concatenate region sets along the capacity (last mask) axis."""
    axis = rs[0].mask.ndim - 1
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *rs)


def compact_topk(r: Regions, k: int, by: str = "mask") -> Regions:
    """Compact valid regions to the front and truncate capacity to ``k``.

    ``by='response'`` additionally orders by |response| descending (the
    reference's sortKeys, scale-space-detector.hpp:124-127); ``by='mask'``
    keeps original order among valid entries.
    """
    if k > r.capacity:
        # pad capacity up to k (e.g. fewer candidates than the budget)
        axis = r.mask.ndim - 1
        pad = k - r.capacity

        def padfn(x):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, pad)
            return jnp.pad(x, widths)
        r = jax.tree.map(padfn, r)
    if by == "response":
        key = jnp.where(r.mask, jnp.abs(r.response), -jnp.inf)
    else:
        n = r.capacity
        key = jnp.where(r.mask, -jnp.arange(n, dtype=jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(key, k)
    out = r.take(idx)
    kk = jnp.take_along_axis(key, idx, axis=key.ndim - 1)
    return out.replace(mask=out.mask & (kk > -jnp.inf))
