"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship extraction pipeline on a deterministic synthetic
pages corpus keyed by sf0.001 documents; queries()/oracle_sql() expose every
implemented operator from SURVEY.md §2 (see
pdf_parser_benchmark_spark/queries.py for the implementations + citations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_benchmark_spark.queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full HTML+PDF main-content extraction over a synthesized
    Common-Crawl-style pages table (url, warc_ts, html:binary, text, lang)
    derived deterministically from sf0.001 doc_ids."""
    return QUERIES["extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
