"""Incremental ingestion (Structured Streaming).

The reference is strictly batch (SURVEY §2.9) — this package is new
capability: a file-source stream over the images table feeding the mask
pipeline, with per-batch snapshot commits providing exactly-once-style
resume on top of the Iceberg-style manifest layer."""
