"""Global configuration for the TPU-native spectral element framework.

The reference library (``/root/reference``) has no config system at all —
configuration is constructor kwargs (SURVEY.md §5).  We keep that spirit
(everything is an explicit argument) but centralize the two global switches
that genuinely must be process-wide in JAX:

* ``enable_x64()`` — float64 mode.  The correctness target (BASELINE.md:
  "solution matches reference to 1e-10") requires float64 accumulation;
  benchmarks on real TPU hardware run float32/bfloat16 instead, so x64 is
  opt-in rather than forced at import.
* default dtypes for solver/geometry work.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_X64_ENABLED = False


def enable_x64() -> None:
    """Switch JAX to float64 mode (idempotent).

    Required for solver paths that must match the float64 numpy reference to
    1e-10; benchmarks use float32/bf16 and do not call this.
    """
    global _X64_ENABLED
    if not _X64_ENABLED:
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def solver_dtype():
    """Preferred dtype for solver-accuracy work under the current config."""
    return np.float64 if x64_enabled() else np.float32


_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Cold-start compile time is the dominant first-run cost of the
    nonlinear solver stack (squirmer cold Newton measured 119-157 s of
    XLA compiles, BASELINE.md round-2i); the persistent cache replays
    them from disk on every later process.  ``path`` defaults to
    ``$SEM_TPU_CACHE_DIR`` or ``~/.cache/spectralelementmethod_tpu/xla``.
    The size threshold is removed and the compile-time threshold lowered
    to 0.5 s: every executable worth a disk round-trip caches (the
    squirmer pipeline compiles many medium-size kernels, not one giant
    one); sub-0.5 s compiles are cheaper to redo than to persist.

    Set ``SEM_TPU_CACHE_DIR=off`` to disable.  Returns the cache dir
    (None when disabled).
    """
    global _CACHE_ENABLED
    env = os.environ.get("SEM_TPU_CACHE_DIR", "")
    if env.lower() == "off":
        return None
    if _CACHE_ENABLED:
        return jax.config.jax_compilation_cache_dir
    path = path or env or os.path.expanduser(
        "~/.cache/spectralelementmethod_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_ENABLED = True
    return path


def host_device_count(n: int = 8) -> None:
    """Request ``n`` virtual CPU devices (must run before JAX backends init).

    This is the TPU analogue of the reference's absent "multi-node test"
    story (SURVEY.md §4): multi-chip sharding is validated on a virtual CPU
    mesh via ``--xla_force_host_platform_device_count``.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    token = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + token).strip()


_SETUP_CACHE_DIR: str | None = None


def enable_setup_cache(path: str | None = None) -> str | None:
    """Enable the on-disk setup-artifact cache (idempotent).

    One-time host setup (the batched geometry precompute: mapping
    coefficients, Jacobians, detJ, inverse Jacobians) dominates
    time-to-solution at scale — 6.8 s at 100k-2D, 22.5 s at 19.7k-3D,
    minutes at 1M (round-4 setup roofline, BASELINE.md).  This cache
    persists those arrays keyed by a hash of the mesh bytes + mapping
    basis, the setup-side twin of the compilation cache (and of the
    reference's own precomputed ``basis-data.hdf5``,
    ``sem/basis_data.py:112-129``).  ``path`` defaults to
    ``$SEM_TPU_SETUP_CACHE_DIR`` or
    ``~/.cache/spectralelementmethod_tpu/setup``.

    Set ``SEM_TPU_SETUP_CACHE_DIR=off`` to disable.  Returns the cache
    dir (None when disabled).
    """
    global _SETUP_CACHE_DIR
    env = os.environ.get("SEM_TPU_SETUP_CACHE_DIR", "")
    if env.lower() == "off":
        return None
    if _SETUP_CACHE_DIR is not None:
        return _SETUP_CACHE_DIR
    path = path or env or os.path.expanduser(
        "~/.cache/spectralelementmethod_tpu/setup")
    os.makedirs(path, exist_ok=True)
    _SETUP_CACHE_DIR = path
    return path


def setup_cache_dir() -> str | None:
    """Active setup-cache directory (None = caching disabled)."""
    if os.environ.get("SEM_TPU_SETUP_CACHE_DIR", "").lower() == "off":
        return None
    return _SETUP_CACHE_DIR
