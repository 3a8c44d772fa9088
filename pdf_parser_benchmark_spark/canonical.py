"""Canonical JSON encoding — the SINGLE serialization point for extracted
output.

The north_star requires byte-identical extracted text per url against
canonical-JSON fixtures, so every byte that leaves the engine goes through
``encode_doc``. Rules: UTF-8, sorted keys, compact separators, trailing
newline, no NaN, ints stay ints. The reference's nearest analog is
``save_nodes`` (/root/reference/src/ingest.py:213-217 — ``json.dumps(...,
indent=2, default=str)``); we deliberately use a stricter, byte-stable
encoding because our fixtures are compared with ``==`` on bytes.
"""

from __future__ import annotations

import json
from typing import Any

_SEPARATORS = (",", ":")


def canonical_json(obj: Any) -> str:
    """Deterministic JSON text: sorted keys, compact, ensure_ascii=False."""
    return json.dumps(
        obj,
        sort_keys=True,
        separators=_SEPARATORS,
        ensure_ascii=False,
        allow_nan=False,
    )


def encode_doc(
    url: str,
    text: str,
    spans: list[dict[str, Any]],
    meta: dict[str, Any],
) -> str:
    """Canonical record for one extracted document (FIXTURES.md §F3).

    spans entries: {start, end, kind, page, chapter, section}; kind values are
    the reference ChunkType literals (/root/reference/src/schema.py:5-13).
    Returns text WITH trailing newline — callers write bytes verbatim.
    """
    record = {"url": url, "text": text, "spans": spans, "meta": meta}
    return canonical_json(record) + "\n"
