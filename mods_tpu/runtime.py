"""Runtime/backend helpers: persistent compile cache, platform selection."""

from __future__ import annotations

import os


def setup_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache — TPU compiles through
    the remote service are expensive (tens of seconds per program); the
    cache makes them one-time across processes."""
    import jax
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERYTHING: through the remote-compile tunnel even a
        # sub-second compile costs seconds of RTT per process, and the
        # ladder dispatches dozens of small helper programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def force_cpu(n_devices: int = 8) -> None:
    import jax
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={n_devices}")
    jax.config.update("jax_platforms", "cpu")
