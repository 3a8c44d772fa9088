"""Deterministic (seed=42, no wall clock, no external data) synthetic-corpus
generators for the Common-Crawl-style input table described by
BASELINE.json input_hint: (url, warc_ts, html:binary, text, lang).
"""
