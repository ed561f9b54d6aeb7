"""Host memory-allocator tuning for large-mesh setup pipelines.

On this class of VM, faulting in freshly mmap'd pages costs ~70us per 4KB
page (~100 MB/s), while touching already-mapped heap memory streams at
multiple GB/s.  glibc malloc serves every allocation above the mmap
threshold (128KB default) with a fresh mmap and munmaps it on free — so
each multi-hundred-MB numpy temporary in the geometry/exchange setup
pipeline pays full fault-in cost *every time* (measured: 400MB fill =
14.2s first touch vs 0.07s reused; ~7x end-to-end setup inflation at 1M
elements).

:func:`tune_host_allocator` raises the mmap and trim thresholds via
``mallopt`` so large blocks live in the (reused, stays-mapped) heap.
Called automatically at package import; opt out with
``SEMTPU_NO_MALLOC_TUNING=1``.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_host_allocator(threshold: int = 1 << 33) -> bool:
    """Keep large allocations in the reusable heap (glibc only).

    Returns True if mallopt succeeded.  Idempotent.
    """
    global _done
    if _done:
        return True
    if os.environ.get("SEMTPU_NO_MALLOC_TUNING"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold)
        _done = bool(ok1 and ok2)
    except (OSError, AttributeError):
        _done = False
    return _done
