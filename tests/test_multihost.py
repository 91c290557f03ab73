"""Multi-host runtime (SURVEY.md §5.8): two local CPU processes joined
by jax.distributed over localhost, pair axis spanning both.

Each subprocess forces 2 virtual CPU devices, so the 2-process mesh has
4 global devices; the test asserts the mesh spans processes, a psum
crosses the process boundary, and a pair-sharded gather assembles
host-local data into the global array.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
from mods_tpu.parallel.mesh import (host_local_array, init_distributed,
                                    make_mesh)
from jax.sharding import PartitionSpec as P

pid = int(sys.argv[1])
init_distributed(coordinator=sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()
mesh = make_mesh({"pair": 4})

# every process contributes ITS OWN rows (2 local pairs each)
local = np.full((2, 8), float(pid + 1), np.float32)
g = host_local_array(mesh, P("pair"), local)
assert g.shape == (4, 8)

# a cross-process reduction: sum over the pair axis must see both hosts
total = jax.jit(lambda x: x.sum())(g)
np.testing.assert_allclose(float(total), 8 * (2 * 1.0 + 2 * 2.0))
print(f"proc {pid} ok", flush=True)
"""


def test_two_process_cpu_mesh(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    # a clean CPU environment: the axon sitecustomize registers the TPU
    # tunnel backend whenever PALLAS_AXON_POOL_IPS is set, which would
    # initialize jax before the worker's distributed startup
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} ok" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
