"""Structured Streaming ingestion + rollups.

The reference is purely request/response (SURVEY.md §2.9 — no
watermarks, windows, or state anywhere); streaming integration is the
north-star's added capability. Batch twins of these aggregations live
in ``..queries.streaming_shapes`` so the DuckDB oracle can check the
semantics; tests assert streaming output == batch output.
"""
