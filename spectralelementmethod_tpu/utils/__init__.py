"""Auxiliary subsystems: perf, logging, checkpointing, invariant checks.

The reference has none of these (SURVEY.md §5); each module documents the
nearest reference analogue it generalizes.
"""

from . import checkpoint, checks, logging, perf

__all__ = ["perf", "logging", "checkpoint", "checks"]
