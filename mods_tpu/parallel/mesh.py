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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Multi-host runtime startup (SURVEY.md §5.8).

    Arguments default from the environment so launchers just export
    MODS_COORDINATOR / MODS_NUM_PROCESSES / MODS_PROCESS_ID (or rely on
    the TPU-pod autodetection built into jax.distributed.initialize).
    After this, jax.devices() spans every host and make_mesh() builds
    DCN+ICI-spanning meshes; pair shards ride DCN, view/kp shards ICI.
    """
    coordinator = coordinator or os.environ.get("MODS_COORDINATOR")
    kw = {}
    if coordinator:
        kw = dict(
            coordinator_address=coordinator,
            num_processes=int(num_processes
                              or os.environ["MODS_NUM_PROCESSES"]),
            process_id=int(process_id
                           if process_id is not None
                           else os.environ["MODS_PROCESS_ID"]))
        if local_device_ids is not None:
            kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def host_local_array(mesh: Mesh, spec: P, local_np: np.ndarray):
    """Assemble a GLOBAL sharded array from each process's local rows —
    the multi-host feed path for pair-sharded galleries (every host
    loads only its own images; nothing is replicated over DCN)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_np)


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh over available devices.  After init_distributed()
    this spans every process: jax.devices() is the global device list.

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
