"""Multimodal columns (SURVEY.md Part B): image/audio/video as opaque
binary columns with typed metadata, processed via Arrow-batched pandas UDFs."""
