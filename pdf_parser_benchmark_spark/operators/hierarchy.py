"""W1 — running chapter/section propagation with reset-on-chapter, as
window algebra.

Reference semantics (/root/reference/src/ingest.py:167-205): iterating
chunks in document order, a header with level None/≤1 sets current_chapter
and CLEARS current_section; a deeper header sets current_section; every
chunk (headers included) carries the current values.

Spark shape: ordered window per document —
  chapter = last(chapter_marker, ignorenulls) over (doc, ≤current)
  epoch   = running count of chapter markers (the reset boundary)
  section = last(section_marker, ignorenulls) over (doc+epoch, ≤current)
One shuffle on doc (both windows share the partitioning; the second window
key (doc, epoch) is a refinement, so Catalyst reuses the sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def propagate_hierarchy(
    chunks: DataFrame,
    doc_col: str = "doc",
    seq_col: str = "seq",
    tag_col: str = "tag",
    level_col: str = "level",
    text_col: str = "text",
) -> DataFrame:
    is_header = F.lower(F.col(tag_col)).contains("header")
    is_chapter = is_header & (
        F.col(level_col).isNull() | (F.col(level_col) <= 1)
    )
    is_section = is_header & F.col(level_col).isNotNull() & (F.col(level_col) > 1)

    w = (
        Window.partitionBy(doc_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = chunks.withColumn(
        "chapter",
        F.last(F.when(is_chapter, F.col(text_col)), ignorenulls=True).over(w),
    ).withColumn("chapter_epoch", F.sum(is_chapter.cast("int")).over(w))

    w2 = (
        Window.partitionBy(doc_col, "chapter_epoch")
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn(
        "section",
        F.last(F.when(is_section, F.col(text_col)), ignorenulls=True).over(w2),
    ).drop("chapter_epoch")
