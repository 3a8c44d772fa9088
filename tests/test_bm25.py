"""BM25 operator tests: self-retrieval, idf ordering, tie determinism."""

from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.operators.bm25 import bm25_topk


def _q(spark, qid, terms):
    return spark.createDataFrame(
        [(qid, t) for t in terms], "qid long, term string"
    )


def test_full_match_ranks_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "q1 q2 q3 q4 pad1 pad2 pad3 pad4"),
            (1, "q1 pad5 pad6 pad7 pad8 pad9 padA padB"),
            (2, "q2 q3 padC padD padE padF padG padH"),
            (3, "padI padJ padK padL padM padN padO padP"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, _q(spark, 0, ["q1", "q2", "q3", "q4"]),
                     "doc_id", "text", k=4).collect()
    ranked = sorted(rows, key=lambda r: r["rank"])
    assert ranked[0]["doc_id"] == 0              # matches all four terms
    assert {r["doc_id"] for r in rows} == {0, 1, 2}  # doc 3 never matches


def test_rare_term_beats_common_term(spark):
    # 'common' appears in every doc (idf → 0 floor); 'rare' in one
    docs = spark.createDataFrame(
        [
            (0, "common rare aa bb cc dd"),
            (1, "common ee ff gg hh ii"),
            (2, "common jj kk ll mm nn"),
            (3, "common oo pp qq rr ss"),
            (4, "common tt uu vv ww xx"),
            (5, "common yy zz a2 b2 c2"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, _q(spark, 0, ["rare", "common"]),
                     "doc_id", "text", k=6).collect()
    best = min(rows, key=lambda r: r["rank"])
    assert best["doc_id"] == 0
    # the rare-term doc's margin comes from idf: every other doc scores
    # identically (common-only) and ties break by doc_id
    others = sorted((r for r in rows if r["doc_id"] != 0),
                    key=lambda r: r["rank"])
    assert [r["doc_id"] for r in others] == [1, 2, 3, 4, 5]
    assert len({r["score"] for r in others}) == 1


def test_tf_saturation_not_linear(spark):
    # 5x the tf must score higher, but far less than 5x (k1 saturation)
    docs = spark.createDataFrame(
        [
            (0, "t t t t t x1 x2 x3 x4 x5"),
            (1, "t y1 y2 y3 y4 y5 y6 y7 y8 y9"),
            (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"]
            for r in bm25_topk(docs, _q(spark, 0, ["t"]),
                               "doc_id", "text", k=3).collect()}
    assert rows[0] > rows[1]
    assert rows[0] < 5 * rows[1]
