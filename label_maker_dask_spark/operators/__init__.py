"""Engine-extension operators (SURVEY.md Part B): deduplication, similarity
search, per-group top-k — the LLM-data-pipeline surface, designed for
100 TB scale (shuffle-minimal, broadcast-aware, no driver materialization).
"""
