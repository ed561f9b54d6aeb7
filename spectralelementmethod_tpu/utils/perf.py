"""Performance instrumentation: timers, FLOP/byte counters, profiler hooks.

The reference has **zero** tracing/profiling (SURVEY.md §5: its only
``time`` import is unused).  This module is the first-class perf subsystem
the TPU build needs for the BASELINE north-star metric:

* :class:`Timer` / :func:`timed` — wall-clock blocks with
  ``block_until_ready`` synchronization so device work is actually counted;
* :func:`roofline` — arithmetic-intensity analysis of a kernel against the
  device's peak FLOP/s and HBM bandwidth;
* :func:`trace` — context manager around ``jax.profiler`` for TensorBoard
  traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


def _sync(x):
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass
    return x


@dataclass
class Timer:
    """Accumulating named wall-clock timer (device-synchronized)."""

    name: str = ""
    total: float = 0.0
    count: int = 0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return (f"{self.name}: {self.total * 1e3:.2f} ms total, "
                f"{self.mean * 1e3:.3f} ms/call over {self.count} calls")


def timed(fn, *args, reps: int = 10, warmup: int = 1, **kwargs):
    """(result, seconds_per_call) for a device function, compile excluded."""
    for _ in range(warmup):
        result = _sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(reps):
        result = _sync(fn(*args, **kwargs))
    return result, (time.perf_counter() - t0) / reps


#: published peak numbers for known devices (per chip)
DEVICE_PEAKS = {
    # name fragments -> (peak FP32-equiv MXU TFLOP/s, HBM GB/s)
    "v5 lite": (197.0, 819.0),   # TPU v5e: 197 bf16 TFLOP/s, 819 GB/s
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "cpu": (0.5, 50.0),
}


def device_peaks(device=None):
    """(peak_tflops, hbm_gbps) for the current (or given) JAX device."""
    import jax

    name = str(device if device is not None else jax.devices()[0]).lower()
    for frag, peaks in DEVICE_PEAKS.items():
        if frag in name:
            return peaks
    return (100.0, 500.0)  # conservative default


@dataclass
class Roofline:
    flops: int
    bytes_moved: int
    seconds: float
    peak_tflops: float
    hbm_gbps: float

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def intensity(self) -> float:
        """Arithmetic intensity, FLOP per byte."""
        return self.flops / max(self.bytes_moved, 1)

    @property
    def bound(self) -> str:
        ridge = self.peak_tflops * 1e3 / self.hbm_gbps
        return "compute" if self.intensity > ridge else "memory"

    @property
    def roofline_gflops(self) -> float:
        """Attainable GFLOP/s at this intensity."""
        return min(self.peak_tflops * 1e3, self.intensity * self.hbm_gbps)

    @property
    def efficiency(self) -> float:
        """Fraction of the attainable (roofline) rate achieved."""
        return self.gflops / self.roofline_gflops

    def __str__(self):
        return (f"{self.gflops:.1f} GFLOP/s ({self.gbps:.1f} GB/s), "
                f"intensity {self.intensity:.2f} FLOP/B -> {self.bound}-"
                f"bound; {100 * self.efficiency:.1f}% of roofline "
                f"({self.roofline_gflops:.0f} GFLOP/s attainable)")


def roofline(flops: int, bytes_moved: int, seconds: float,
             device=None) -> Roofline:
    peak_tflops, hbm = device_peaks(device)
    return Roofline(flops, bytes_moved, seconds, peak_tflops, hbm)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block with the JAX profiler (view in TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
