"""Engine-extension operators (SURVEY.md Part B): deduplication, similarity
search, semantic clustering, per-group top-k, as-of joins, CDC merge,
salted skew-joins, time-series rollups, curation pipeline stages, and
data-quality expectations — the LLM-data-pipeline surface, designed for
100 TB scale (shuffle-minimal, broadcast-aware, no driver materialization).
"""
