"""A1 — the flagship boilerplate line-frequency aggregation, as pure
DataFrame algebra (the grouped-UDF twin lives in extract/assemble.py for
use inside the extraction pipeline).

Rule (/root/reference/CLAUDE.md:195-211, pinned by
/root/reference/tests/test_ingest.py:24-43): counting every occurrence of
each stripped non-empty line across a document's pages, a line is
boilerplate iff  count > n_pages * 0.4  AND  len(line) < 100  — both
strict. Removal drops lines whose *stripped* form is boilerplate, keeping
original line order.

Plan shape: posexplode(split(text,'\\n')) → count lines per doc →
broadcast-friendly anti-join back → ordered re-assembly via
array_sort(collect_list(struct(pos,line))). Two shuffles (count + regroup),
both partial-aggregated map-side; scales linearly in total line count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BOILER_FRACTION = 0.4
BOILER_MAX_LEN = 100


def explode_lines(
    pages: DataFrame, doc_col: str, page_col: str, text_col: str
) -> DataFrame:
    """pages(doc, page, text) → one row per (doc, page, pos, line)."""
    return pages.select(
        F.col(doc_col).alias("doc"),
        F.col(page_col).alias("page"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


# full-whitespace-class strip matching Python str.strip() (the in-UDF twin
# in extract/assemble.py and the reference both strip tabs etc., while
# Spark's F.trim strips spaces only). The class is an EXPLICIT codepoint
# list — Python's str.isspace() set, which Java 17's (?U)\s also matches —
# rendered in both Java-regex and RE2 syntax so the Spark plan and the
# DuckDB oracle twin strip the exact same characters (ADVICE r2: RE2's \s
# is ASCII-only, so NBSP-edged lines would strip differently on the two
# sides under the old (?U)\s / \s pairing).
_WS_RANGES = [
    (0x09, 0x0D), (0x1C, 0x1F), (0x20, 0x20), (0x85, 0x85), (0xA0, 0xA0),
    (0x1680, 0x1680), (0x2000, 0x200A), (0x2028, 0x2029), (0x202F, 0x202F),
    (0x205F, 0x205F), (0x3000, 0x3000),
]


def _ws_class(esc) -> str:
    return "".join(
        esc(lo) if lo == hi else f"{esc(lo)}-{esc(hi)}" for lo, hi in _WS_RANGES
    )


WS_CLASS_JAVA = _ws_class(lambda c: f"\\u{c:04X}")
WS_CLASS_RE2 = _ws_class(lambda c: f"\\x{{{c:04X}}}")  # DuckDB oracle twin

_STRIP_RE = f"^[{WS_CLASS_JAVA}]+|[{WS_CLASS_JAVA}]+$"
STRIP_RE_RE2 = f"^[{WS_CLASS_RE2}]+|[{WS_CLASS_RE2}]+$"


def stripped(col) -> F.Column:
    return F.regexp_replace(col, _STRIP_RE, "")


def boilerplate_lines(
    pages: DataFrame, doc_col: str, page_col: str, text_col: str
) -> DataFrame:
    """→ (doc, line, cnt): the boilerplate set per document."""
    lines = explode_lines(pages, doc_col, page_col, text_col).withColumn(
        "sline", stripped(F.col("line"))
    )
    page_counts = pages.groupBy(F.col(doc_col).alias("doc")).agg(
        F.count("*").alias("n_pages")
    )
    return (
        lines.filter(F.col("sline") != "")
        .groupBy("doc", "sline")
        .agg(F.count("*").alias("cnt"))
        .join(page_counts, "doc")
        .filter(
            (F.col("cnt") > F.col("n_pages") * BOILER_FRACTION)
            & (F.length("sline") < BOILER_MAX_LEN)
        )
        .select("doc", F.col("sline").alias("line"), "cnt")
    )


def strip_boilerplate(
    pages: DataFrame, doc_col: str, page_col: str, text_col: str
) -> DataFrame:
    """→ (doc, page, clean_text): every page with boilerplate lines removed,
    original line order preserved."""
    lines = explode_lines(pages, doc_col, page_col, text_col)
    boiler = boilerplate_lines(pages, doc_col, page_col, text_col).select(
        "doc", F.col("line").alias("sline")
    )
    kept = lines.withColumn("sline", stripped(F.col("line"))).join(
        boiler, ["doc", "sline"], "left_anti"
    )
    agg = kept.groupBy("doc", "page").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    # pages whose every line was boilerplate must survive as empty text
    # (reference keeps the document with text='', CLAUDE.md:205-210)
    all_pages = pages.select(
        F.col(doc_col).alias("doc"), F.col(page_col).alias("page")
    )
    return all_pages.join(agg, ["doc", "page"], "left").select(
        "doc", "page", F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )
