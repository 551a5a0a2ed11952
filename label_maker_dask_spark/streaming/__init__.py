"""Structured Streaming surface (SURVEY.md Part B; the reference is batch-only,
section 1.4) — windowed aggregations, watermarks, stateful dedup."""
