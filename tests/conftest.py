"""Test configuration.

Runs the suite on the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the TPU analogue of
multi-node testing; SURVEY.md §4).  Must configure the environment before
JAX initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ("axon") plugin
# and forces jax_platforms="axon,cpu" at interpreter start, which silently
# overrides the env var; pin CPU explicitly so tests run locally.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
