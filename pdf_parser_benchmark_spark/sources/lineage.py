"""Per-partition lineage + counters table (north_rule obligation).

Reference analogs: the rename audit CSV (K4,
/root/reference/data/pdfs/rename_pdfs.py:164-169) and the per-sku ingestion
summary (A2, /root/reference/src/ingest.py:220-252). Ours is computed as a
plain aggregation over the extracted output — map-side partial aggregation
means this costs one cheap shuffle of pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LINEAGE_COLS = (
    "split_id",
    "docs_out",
    "docs_err",
    "html_docs",
    "pdf_docs",
    "bytes_in",
    "chars_out",
)


def lineage_counters(extracted: DataFrame) -> DataFrame:
    """Counters per split: docs in/out/err, per-parser counts, byte volumes."""
    return (
        extracted.groupBy("split_id")
        .agg(
            F.count("*").alias("docs_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "docs_err"
            ),
            F.sum(F.when(F.col("parser") == "html", 1).otherwise(0)).alias(
                "html_docs"
            ),
            F.sum(F.when(F.col("parser") == "pdf", 1).otherwise(0)).alias(
                "pdf_docs"
            ),
            F.sum("n_bytes_in").alias("bytes_in"),
            F.sum(F.length("text")).alias("chars_out"),
        )
        .orderBy("split_id")
    )
