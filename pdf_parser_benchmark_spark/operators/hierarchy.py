"""W1 — running chapter/section propagation with reset-on-chapter, as
window algebra.

Reference semantics (/root/reference/src/ingest.py:167-205): iterating
chunks in document order, a header with level None/≤1 sets current_chapter
and CLEARS current_section; a deeper header sets current_section; every
chunk (headers included) carries the current values.

Spark shape (r7): ONE window pass per document —
  chapter      = last(chapter_marker, ignorenulls) over (doc, ≤current)
  last_section = last((seq, text) of section markers)  over the same window
  last_chap_seq= last(seq of chapter markers)          over the same window
  section      = last_section.text iff it arrived AFTER the last chapter
The seq comparison replaces the former second window keyed on
(doc, chapter_epoch): "section set in the current epoch" ≡ "the latest
section marker's seq is greater than the latest chapter marker's seq"
(markers are mutually exclusive and `seq` is the window order, assumed
unique per doc as in the reference loop). Dropping the second window
removes a full extra Sort + Window pass over every chunk (the exchange
was already shared; the sort on the refined key was not).
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
    last_section = F.last(
        F.when(
            is_section,
            F.struct(F.col(seq_col).alias("s"), F.col(text_col).alias("t")),
        ),
        ignorenulls=True,
    ).over(w)
    last_chap_seq = F.last(
        F.when(is_chapter, F.col(seq_col)), ignorenulls=True
    ).over(w)
    return chunks.withColumn(
        "chapter",
        F.last(F.when(is_chapter, F.col(text_col)), ignorenulls=True).over(w),
    ).withColumn(
        "section",
        F.when(
            last_section.isNotNull()
            & (last_chap_seq.isNull() | (last_section["s"] > last_chap_seq)),
            last_section["t"],
        ),
    )
