"""PREC-C: fine-grained find-filter-replace context application."""

from .context import PreccContext  # noqa: F401
from .apply import apply_precc  # noqa: F401
