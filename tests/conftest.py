"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic is tested on a host-platform device mesh (the
standard JAX fake-multi-device trick) per SURVEY.md §4; real-TPU benchmarking
happens in bench.py, not the unit suite.

Note: this environment's boot hook registers a TPU PJRT plugin and calls
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, which
overrides the JAX_PLATFORMS env var — so the CPU selection must itself be a
config update, made before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
