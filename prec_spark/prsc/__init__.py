"""Distributed PRSC rule application (and reversion)."""

from .apply import apply_prsc, elements_df  # noqa: F401
