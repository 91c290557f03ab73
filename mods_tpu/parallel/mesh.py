"""Device-mesh sharding for multi-chip / multi-host matching.

The reference's parallel axes are OpenMP loops (SURVEY.md §2.6); here they
become mesh axes (SURVEY.md §5.8):

  * ``pair`` — independent image pairs (the `mods_multi` axis, embarrass-
    ingly parallel; DP-equivalent).
  * ``view`` — synthetic views of one image (the hot OpenMP loop
    imagerepresentation.cpp:621; batch-sharded detection).
  * ``kp``  — keypoint tiles inside the matching distance matmul
    (context/tensor-parallel equivalent: descriptors are sharded, each
    shard computes local top-k, candidates are merged with all_gather
    over ICI).

The escalation stop decision (`curr_matches < minMatches`, mods.cpp:229)
is a psum-reduced scalar across pair shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    axis_sizes e.g. {"pair": 4, "kp": 2}; defaults to all devices on one
    ``pair`` axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"pair": n}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    need = int(np.prod(sizes))
    assert need <= n, (sizes, n)
    arr = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(arr, names)


def sharded_knn(mesh: Mesh, knn: int = 8):
    """Cross-shard exact kNN: desc2 sharded over the ``kp`` axis.

    Each shard computes its local top-k against its slice of list2, then
    the (k * n_shards) candidates are all_gathered over ICI and merged —
    the tiled/ring design of SURVEY.md §5.7-5.8.

    Returns a function (desc1 (N1, D), desc2 (N2, D)) -> (dists, idx)
    with idx into the GLOBAL list2.
    """
    from jax.experimental.shard_map import shard_map

    def local_block(d1, d2_shard):
        # d1 replicated, d2_shard: (N2/s, D)
        shard = jax.lax.axis_index("kp")
        n2s = d2_shard.shape[0]
        sq1 = jnp.sum(d1 * d1, axis=-1, keepdims=True)
        sq2 = jnp.sum(d2_shard * d2_shard, axis=-1)
        dist = sq1 + sq2[None, :] - 2.0 * jnp.dot(
            d1, d2_shard.T, preferred_element_type=jnp.float32)
        nd, ni = jax.lax.top_k(-dist, knn)
        ni = ni + shard * n2s                      # global indices
        # merge across shards: gather candidates, re-top-k
        nd_all = jax.lax.all_gather(nd, "kp", axis=1, tiled=True)
        ni_all = jax.lax.all_gather(ni, "kp", axis=1, tiled=True)
        md, sel = jax.lax.top_k(nd_all, knn)
        mi = jnp.take_along_axis(ni_all, sel, axis=1)
        return -md, mi

    f = shard_map(
        local_block, mesh=mesh,
        in_specs=(P(None, None), P("kp", None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False)

    def run(desc1, desc2):
        # desc2 rows sharded over kp
        return f(desc1, desc2)

    return run


def pair_sharded(mesh: Mesh, fn):
    """jit ``fn`` with its leading axis sharded over the ``pair`` axis."""
    spec = NamedSharding(mesh, P("pair"))

    def wrapper(*args):
        args = [jax.device_put(a, NamedSharding(
            mesh, P(*(("pair",) + (None,) * (a.ndim - 1))))) for a in args]
        return jax.jit(fn)(*args)

    return wrapper


def global_stop_decision(local_counts: jax.Array, min_matches: int):
    """Cross-shard escalation decision: all pairs done?
    (psum over the pair axis inside shard_map contexts, or a plain
    reduction after gather)."""
    return jnp.all(local_counts >= min_matches)
