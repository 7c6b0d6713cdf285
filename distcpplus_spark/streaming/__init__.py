"""Structured Streaming surface: windowed aggs, stateful dedup,
incremental file sync (the streaming twin of the copy engine)."""
