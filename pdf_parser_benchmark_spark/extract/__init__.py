"""From-scratch extractors (stdlib-only Python) that run inside
Arrow-vectorized pandas UDFs: HTML main-content extraction and PDF layout
parsing. These are the engine's replacements for the reference's external
services (LLMSherpa layout server, /root/reference/src/ingest.py:163;
GPT-4o vision path, ingest.py:72-115) — re-expressed as deterministic,
distributable pure functions.
"""
