"""Structured-Streaming surface.

The reference is strictly batch (SURVEY §2.10); its incremental notions
(append-only processing, retry-aware re-download) are kept as batch
anti-joins. This package adds the genuine streaming layer a continuous
ingest would use: windowed aggregation with watermarks and stateful
per-key processing — written against the unified DataFrame API so every
transformation also runs on batch frames (that is how the DuckDB oracle
checks them).
"""
