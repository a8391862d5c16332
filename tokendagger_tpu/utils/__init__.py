"""Utility subsystems: profiling, metrics, logging."""

from .profiling import Timer, profile_trace, RateMeter  # noqa: F401
