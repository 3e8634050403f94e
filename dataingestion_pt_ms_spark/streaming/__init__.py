"""Structured Streaming jobs (SURVEY.md §2.B "Streaming-only") + the
reference-shaped ingest pipeline (batch and streaming)."""

from .ingest import normalize_bars, run_batch_ingest
from .jobs import (
    sessionized_stream,
    sliding_counts_stream,
    stateful_dedup_stream,
    tumbling_counts_stream,
)

__all__ = [
    "normalize_bars",
    "run_batch_ingest",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionized_stream",
    "stateful_dedup_stream",
]
