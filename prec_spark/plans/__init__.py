"""Shared plan-building machinery (template pattern compilation)."""

from .patterns import compile_term, substitute  # noqa: F401
