"""C4 curation filter tests: rule firing per class, edge cases, and the
zero-shuffle plan pin."""

from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.operators.curation import (
    c4_doc_signals,
    c4_line_kept,
    c4_lines,
)
from pdf_parser_benchmark_spark.queries import QUERIES


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def _doc(spark, doc_id: int, text: str):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def _signals(spark, doc_id: int, text: str) -> dict:
    df = _doc(spark, doc_id, text)
    s = c4_doc_signals(c4_lines(F.col("doc_id"), F.col("text")))
    row = df.select(
        *[v.alias(k) for k, v in s.items()]
    ).collect()[0]
    return row.asDict()


def test_line_rules(spark):
    df = spark.createDataFrame(
        [
            ("one two three four five.",),       # kept
            ("one two three four.",),            # <5 words
            ("one two three four five",),        # no terminal punct
            ("one two javascript four five.",),  # javascript
            ("read our cookie policy now ok.",), # policy phrase
            ('he said "stop right there now."',),# quote counts as terminal
        ],
        "line string",
    )
    got = [r[0] for r in df.select(c4_line_kept(F.col("line"))).collect()]
    assert got == [True, False, False, False, False, True]


def test_doc_rules_fire_by_class(spark):
    text = " ".join(["tok"] * 60)  # 10 lines of 6 words
    # doc_id 62 = 2*31: lorem ipsum on line 0 → page killed
    s = _signals(spark, 62, text)
    assert s["keep"] is False and s["fail_reason"] == "lorem_ipsum"
    assert s["clean_text"] is None
    # doc_id 58 = 2*29: curly brace on line 2 → page killed
    s = _signals(spark, 58, text)
    assert s["keep"] is False and s["fail_reason"] == "curly_brace"
    # doc_id 1: no injections, punctuation on 3 of every 4 lines → keep
    s = _signals(spark, 1, text)
    assert s["keep"] is True and s["fail_reason"] is None
    assert s["n_lines"] == 10 and s["n_kept"] >= 3
    assert s["clean_text"].count("\n") == s["n_kept"] - 1
    # short doc (one line) → too few sentences
    s = _signals(spark, 1, "a b c d e f")
    assert s["keep"] is False and s["fail_reason"] == "too_few_sentences"


def test_javascript_kills_line_not_doc(spark):
    text = " ".join(["tok"] * 60)  # 10 lines of 6 words
    js = _signals(spark, 7, text)  # javascript injected on line 1
    # doc 7 punct schedule: no '.' on lines {0,4,8} → 7 punctuated lines;
    # the javascript rule kills punctuated line 1 → 6 kept, doc survives
    assert js["n_kept"] == 6 and js["keep"] is True


def test_empty_and_tiny_text(spark):
    s = _signals(spark, 3, "   ")
    assert s["n_lines"] == 1 and s["keep"] is False
    s = _signals(spark, 3, "word")
    assert s["n_lines"] == 1 and s["n_kept"] == 0


def test_c4_plan_is_shuffle_free(spark, sf_dir):
    plan = _plan(QUERIES["c4_filters"](spark, sf_dir))
    assert "Exchange" not in plan


def test_domain_mix_budgets_and_greedy_maximality(spark):
    from pdf_parser_benchmark_spark.operators.curation import (
        domain_mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, "hostA" if i % 2 == 0 else "hostB", "w " * (5 + i % 7))
         for i in range(40)],
        "doc_id long, source string, text string",
    )
    weights = spark.createDataFrame(
        [("hostA", 1), ("hostB", 3)], "source string, w int"
    )
    rows = domain_mixture_sample(docs, weights).collect()
    t_total = sum(r["n_tokens"] for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        w = 1 if src == "hostA" else 3
        budget = (t_total * w) // (4 * 2)  # W=4, frac=1/2
        assert all(r["budget"] == budget for r in rs)
        rs.sort(key=lambda r: (r["priority"], r["doc_id"]))
        kept = [r for r in rs if r["keep"]]
        # kept is exactly the maximal prefix that fits the budget
        assert kept == [r for r in rs if r["cum_tokens"] <= budget]
        if len(kept) < len(rs):
            first_dropped = rs[len(kept)]
            assert first_dropped["cum_tokens"] > budget


def test_perplexity_tiers_hand_computed(spark):
    # counts: a=7 b=2 c=d=e=1; N=12 V=5 → N+V=17
    # bits: a=floor(log2(17//8))=1, b=floor(log2(17//3))=2, cde=3
    from pdf_parser_benchmark_spark.operators.curation import (
        unigram_surprisal_tiers,
    )

    docs = spark.createDataFrame(
        [(0, "a a a a"), (1, "a a a b"), (2, "b c d e")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict()
            for r in unigram_surprisal_tiers(docs).collect()}
    assert rows[0]["bits"] == 4 and rows[0]["score_milli"] == 1000
    assert rows[1]["bits"] == 5 and rows[1]["score_milli"] == 1250
    assert rows[2]["bits"] == 11 and rows[2]["score_milli"] == 2750
    assert [rows[i]["tier"] for i in (0, 1, 2)] == ["head", "middle", "tail"]


def test_dup_spans_detect_merge_and_split(spark):
    from pdf_parser_benchmark_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (0, "a b p q r s t u v w"),            # phrase at tokens 2..6
            (1, "p q r s t x y z n1 n2"),          # phrase at 0..4
            (2, "p q r s t m1 m2 m3 m4 m5 m6 p q r s t"),  # two regions
            (3, "p q r s t u2 v2 w2 x2 y2"),       # adjacent dup windows
            (4, "u2 v2 w2 x2 y2 k1 k2 k3"),
            (5, "too short"),                       # < k tokens
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in duplicate_spans(docs, "doc_id", "text", k=5).collect()
    }
    assert spans[(0, 2, 6)] == 1
    assert spans[(1, 0, 4)] == 1
    # doc 2: gap of 11 > k → two separate maximal spans
    assert spans[(2, 0, 4)] == 1 and spans[(2, 11, 15)] == 1
    # doc 3: windows at 0 and 5 (gap == k) merge into one span 0..9
    assert spans[(3, 0, 9)] == 2
    assert spans[(4, 0, 4)] == 1
    assert not any(k[0] == 5 for k in spans)


def test_curation_hostile_inputs_survive(spark):
    """Unicode, control chars, huge tokens, emoji — the funnel must not
    throw and must stay deterministic."""
    from pdf_parser_benchmark_spark.operators.curation import (
        curation_funnel,
    )

    hostile = [
        (0, "éüß " * 40, "en"),          # accents
        (1, "\U0001f600 " * 50, "en"),                   # emoji tokens
        (2, "a" * 100000 + " b c", "en"),                # 100 kB token
        (3, "tab\tand\nnewline mixed " * 10, "en"),     # controls
        (4, "中文文本 " * 40, "zh"),    # CJK
        (5, "", "en"),                                    # empty
        (6, "   ", "en"),                                 # whitespace only
        (7, "normal words here the and that have with " * 8, "en"),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in curation_funnel(df).collect()}
    assert len(rows) == 8
    assert rows[4]["stage"] == "lang"
    assert rows[5]["stage"] in ("gopher", "c4")  # empty fails a quality gate
    # two identical runs → identical verdicts
    rows2 = {r["doc_id"]: r for r in curation_funnel(df).collect()}
    assert all(rows[i]["stage"] == rows2[i]["stage"] for i in rows)


def test_strip_dup_spans_keeper_and_conservation(spark):
    from pdf_parser_benchmark_spark.operators.dedup import strip_dup_spans

    docs = spark.createDataFrame(
        [
            (0, "p q r s t a1 a2 a3 a4 a5"),   # keeper of "p q r s t"
            (1, "b1 b2 p q r s t b3 b4 b5"),   # later occurrence → cut
            (2, "p q r s t c1 c2 p q r s t"),  # two occurrences, both cut
            (3, "d1 d2 d3 d4 d5 d6 d7 d8"),    # untouched
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r.asDict()
           for r in strip_dup_spans(docs, "doc_id", "text", k=5).collect()}
    # doc 0 holds the globally-first occurrence → untouched
    assert got[0]["n_tokens_after"] == 10 and got[0]["n_spans_removed"] == 0
    # doc 1 loses exactly the 5-token phrase
    assert got[1]["n_tokens_after"] == 5
    assert got[1]["clean_text"] == "b1 b2 b3 b4 b5"
    # doc 2 loses both occurrences (neither is the keeper)
    assert got[2]["n_tokens_after"] == 2
    assert got[2]["clean_text"] == "c1 c2"
    # untouched doc round-trips byte-identically
    assert got[3]["clean_text"] == "d1 d2 d3 d4 d5 d6 d7 d8"
    # conservation: tokens removed == sum of merged span lengths
    for r in got.values():
        assert r["n_tokens_before"] >= r["n_tokens_after"]


def test_semdedup_min_id_wins(spark):
    from pdf_parser_benchmark_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0], 1),   # kept (no smaller close neighbor)
        (1, [0.999, 0.01, 0.0], 1),  # near-dup of 0 → dropped
        (2, [0.0, 1.0, 0.0], 1),   # orthogonal → kept
        (3, [0.0, 0.99, 0.1], 1),  # near-dup of 2 → dropped
        (4, [1.0, 0.0, 0.0], 2),   # same vec as 0, other block → kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["id"]: r for r in semantic_dedup(
        df, "vec_id", "embedding", "label", threshold=0.9).collect()}
    assert [got[i]["keep"] for i in range(5)] == [
        True, False, True, False, True]
    assert got[1]["n_close_predecessors"] == 1
    assert got[1]["max_predecessor_cosine"] >= 0.99
    assert got[0]["max_predecessor_cosine"] is None


def test_perplexity_tiers_ties_share_tier(spark):
    from pdf_parser_benchmark_spark.operators.curation import (
        unigram_surprisal_tiers,
    )

    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(6)], "doc_id long, text string"
    )
    tiers = {r["tier"] for r in unigram_surprisal_tiers(docs).collect()}
    assert tiers == {"head"}
