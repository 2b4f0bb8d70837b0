"""Auxiliary subsystems: debug checks and profiling (SURVEY.md §5.1-5.2)."""

from . import debug, profiling  # noqa: F401
