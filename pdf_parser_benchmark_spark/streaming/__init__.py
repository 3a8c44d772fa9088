"""Structured Streaming surface.

The reference has NO streaming semantics (SURVEY.md §2.9) — its only
asynchrony is a FastAPI background task and cache TTLs. This module is the
engine extension for continuous ingestion at web scale: the same extraction
stage bolted onto a file-source stream, plus watermarked windowed
aggregations and a custom stateful operator, all with availableNow triggers
so batch backfills and streaming share one code path.
"""
