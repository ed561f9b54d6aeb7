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
import pytest  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ("axon") plugin
# and forces jax_platforms="axon,cpu" at interpreter start, which silently
# overrides the env var; pin CPU explicitly so tests run locally.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound XLA CPU compile-cache/memory growth across the suite.

    Under x64 + 8 virtual devices the CPU client accumulates compiled
    executables across hundreds of tests; two independent full-suite
    runs segfaulted inside ``backend_compile_and_load`` after ~330
    green tests (every surrounding test passes in a fresh process).
    Dropping the jit/pjit executable caches — and the library's own
    ``lru_cache``-held solver kernels, which pin executables — at every
    module boundary keeps the live-executable set at single-module
    scale.  (The suite additionally runs under pytest-xdist loadscope
    workers, see pyproject addopts; this fixture keeps each worker
    bounded too.)
    """
    yield
    import spectralelementmethod_tpu.solver.cg as _cg
    import spectralelementmethod_tpu.solver.gmres as _gmres

    for mod in (_cg, _gmres):
        for obj in vars(mod).values():
            if callable(obj) and hasattr(obj, "cache_clear"):
                obj.cache_clear()
    jax.clear_caches()
