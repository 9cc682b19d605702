"""Structured Streaming operators (SURVEY.md §2.10 gap list / §7
Phase 4): windowed aggregations with watermarks, streaming dedup, and
custom stateful processing over the ``events`` table re-read as a file
stream."""
