"""P4 — ordered substring tag→ChunkType mapping as a chained
when/otherwise expression.

Semantics (/root/reference/src/ingest.py:32-39,118-124): iterate the map in
insertion order, first key CONTAINED in the lowered/stripped tag wins,
default 'body_text'. Order is semantic: a tag 'table_row' hits the 'table'
rule first — we preserve exactly that by chaining whens in dict order.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TAG_MAP: tuple[tuple[str, str], ...] = (
    ("header", "title"),
    ("para", "body_text"),
    ("list_item", "list"),
    ("table", "table"),
    ("table_row", "table"),
)


def chunk_type(tag: Column) -> Column:
    t = F.lower(F.trim(tag))
    expr = None
    for key, val in TAG_MAP:
        cond = t.contains(key)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise("body_text")


def chunk_type_sql_case(tag_expr: str) -> str:
    """The same mapping as ANSI SQL (oracle text)."""
    t = f"lower(trim({tag_expr}))"
    whens = "\n".join(
        f"WHEN {t} LIKE '%{key}%' THEN '{val}'" for key, val in TAG_MAP
    )
    return f"CASE {whens} ELSE 'body_text' END"
