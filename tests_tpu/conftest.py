"""Opt-in TPU-hardware test tier.

The main suite (tests/) pins the CPU backend and exercises Pallas kernels
in interpret mode only; real-Mosaic compilation was previously covered
only by bench.py runs (VERDICT round-1 weakness).  This tier runs the
kernel-vs-XLA equivalences on the actual device:

    python -m pytest tests_tpu/ -q        # on a TPU host

Everything here is skipped automatically when the default JAX backend is
not a TPU.  Keep problems small: each pallas_call compile costs tens of
seconds through a remote tunnel.
"""

import jax
import pytest

from spectralelementmethod_tpu.config import enable_compilation_cache

# ~40 kernel-variant compiles per full run at tens of seconds each
# through the tunnel — persist them across invocations
enable_compilation_cache()


def pytest_configure(config):
    # the repo-level addopts run the CPU suite under two xdist workers
    # (memory isolation, see pyproject.toml); this tier talks to ONE
    # physical TPU, which two processes must not share
    n = getattr(config.option, "numprocesses", None)
    if n:
        raise pytest.UsageError(
            "tests_tpu shares one TPU device: run with -n 0 "
            "(python -m pytest tests_tpu/ -n 0 -q)")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a TPU backend")
        for item in items:
            item.add_marker(skip)
