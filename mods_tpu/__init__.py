"""mods_tpu — a TPU-native wide-baseline matching and two-view geometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MODS
(Matching On Demand with view Synthesis; reference C++ at /root/reference):
on-demand affine view synthesis, affine-covariant detection, SIFT-family
description, FGINN matching and LO-RANSAC/DEGENSAC geometric verification —
expressed as dense, batched, fixed-shape programs that XLA can tile onto the
MXU, with views/pairs sharded over a `jax.sharding.Mesh`.

Design stance (vs the reference's per-keypoint C++ loops):
  * keypoint sets are fixed-capacity SoA arrays with validity masks
  * the per-synthetic-view OpenMP loop becomes a leading batch axis
  * FLANN kNN becomes a tiled distance matmul + on-chip top-k
  * the serial hypothesize-and-verify RANSAC loop becomes vmapped
    hypothesis batches with batched local optimization
"""

__version__ = "0.1.0"

import jax as _jax

# float32 matmuls MUST run at f32 precision on TPU: the default bf16
# MXU passes corrupt the Gaussian band-matrix blurs, windowed patch
# samplers, and scale-space responses (4th-order image derivatives) —
# measured on the cat pair, bf16 detection finds 2.3x spurious regions
# and descriptor ranks collapse (rank0 0.68 -> 0.03).  The hot distance
# matmuls are a negligible share of total runtime at f32.
_jax.config.update("jax_default_matmul_precision", "highest")

from mods_tpu.regions import Regions  # noqa: F401
