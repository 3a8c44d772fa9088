"""Bucketed co-located join: both sides bucketed on the key ⇒ the join plan
has NO Exchange (the 100 TB join story, paid once at write time)."""

from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.sources.bucketing import read_table, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    import shutil

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "source", "lang")
    right = docs.select("doc_id", "n_chars")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(left, "bkt_left", "doc_id", 8)
    write_bucketed(right, "bkt_right", "doc_id", 8)

    joined = read_table(spark, "bkt_left").join(
        read_table(spark, "bkt_right").hint("merge"), "doc_id"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle

    # and it is correct
    assert joined.count() == docs.count()


def test_unbucketed_join_needs_exchange(spark, sf_dir):
    """Control: the same join without bucketing shuffles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "source")
    right = docs.select("doc_id", "n_chars")
    plan = _plan(left.join(right.hint("merge"), "doc_id"))
    assert "Exchange" in plan
