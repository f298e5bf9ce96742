"""Structured Streaming operators over the `events` table."""

from .events import run_windowed_counts_stream, windowed_counts_batch  # noqa: F401
