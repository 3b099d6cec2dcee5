"""Test configuration: force CPU backend with a virtual 8-device mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count), as real multi-chip TPU hardware is
not available in CI — this is the strategy SURVEY.md §4 calls for, going
beyond the reference (which never tests multi-node without real sockets).

Note: the shell environment pins JAX_PLATFORMS=axon (a TPU tunnel) and a
pytest plugin imports jax before this conftest runs, so we override via
jax.config (the backend initializes lazily, so this still takes effect).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
