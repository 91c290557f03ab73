"""Test harness: force a virtual 8-device CPU mesh (no TPU needed).

Must set env vars before the first jax import (SURVEY.md §4 test plan).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already with JAX_PLATFORMS=axon;
# override before the first backend initialization.  Set
# MODS_TEST_PLATFORM=axon to run the suite on the real TPU chip.
jax.config.update("jax_platforms",
                  os.environ.get("MODS_TEST_PLATFORM", "cpu"))

# persistent compilation cache: repeated suite runs skip recompiles
# (the cache dir is gitignored)
import platform  # noqa: E402

from mods_tpu.runtime import setup_cache  # noqa: E402

# keyed by machine: CPU AOT cache entries embed host ISA features, and a
# cache written on another machine would SIGILL here
setup_cache(f"/root/repo/.jax_cache_tests_{platform.machine()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def cat_pair_paths():
    base = "/root/reference/build/examples"
    return f"{base}/cat.png", f"{base}/cat2.png", f"{base}/cat.txt"
