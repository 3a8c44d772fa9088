"""J2 — fuzzy title ⋈ filename similarity join.

Reference semantics (/root/reference/data/pdfs/rename_pdfs.py):
normalize both sides (:30-39) → score every (book, file) pair with
SequenceMatcher.ratio (:42-43,78-90) → per book keep the best match only if
score ≥ 0.86 AND best−second ≥ 0.05 (:108-110,146) → greedy dedup so a file
is claimed once (:135-152, iteration order = book order).

Spark shape: the dim sides are small (a manifest), so the theta-join is a
broadcast crossJoin; scoring is the exact difflib metric in an Arrow UDF;
best/second and the greedy claim are two windows. At web scale one would
block candidates first (operators/dedup.py minhash buckets do exactly
that) — `blocked=True` applies a cheap shared-token prefilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.similarity import seq_ratio, jaccard_words
from ..functions.text import normalize_title


def fuzzy_match(
    books: DataFrame,
    files: DataFrame,
    book_key: str = "sku",
    title_col: str = "title",
    file_col: str = "filename",
    min_score: float = 0.86,
    min_gap: float = 0.05,
    metric: str = "seq_ratio",
    blocked: bool = False,
) -> DataFrame:
    """→ (book_key, filename, score, status) — status OK|SKIP mirrors the
    reference's plan rows."""
    b = books.select(
        F.col(book_key).alias("bk"),
        F.col(title_col).alias("btitle"),
        normalize_title(F.col(title_col)).alias("bnorm"),
    )
    f = files.select(
        F.col(file_col).alias("fname"),
        normalize_title(F.col(file_col)).alias("fnorm"),
    )
    pairs = b.crossJoin(F.broadcast(f))
    if blocked:
        pairs = pairs.filter(
            F.arrays_overlap(F.split("bnorm", " "), F.split("fnorm", " "))
        )
    score = (
        seq_ratio("bnorm", "fnorm")
        if metric == "seq_ratio"
        else jaccard_words(F.col("bnorm"), F.col("fnorm"))
    )
    scored = pairs.withColumn("score", F.round(score, 6))

    wb = Window.partitionBy("bk").orderBy(F.desc("score"), F.asc("fname"))
    best = (
        scored.withColumn("rn", F.row_number().over(wb))
        .withColumn("second_score", F.lead("score").over(wb))
        .filter(F.col("rn") == 1)
        .withColumn(
            "gap", F.col("score") - F.coalesce(F.col("second_score"), F.lit(0.0))
        )
    )
    qualified = best.withColumn(
        "qualified",
        (F.col("score") >= min_score) & (F.col("gap") >= min_gap),
    )
    # greedy claim: among qualified books wanting the same file, the one
    # earliest in book order wins (reference iterates books in order, :139);
    # qualified rows rank ahead of unqualified so the latter never block
    wf = Window.partitionBy("fname").orderBy(F.desc("qualified"), F.asc("bk"))
    claimed = qualified.withColumn("claim_rank", F.row_number().over(wf))
    return claimed.select(
        F.col("bk"),
        F.col("btitle"),
        F.col("fname"),
        F.col("score"),
        F.round(F.col("gap"), 6).alias("gap"),
        F.when(F.col("qualified") & (F.col("claim_rank") == 1), "OK")
        .otherwise("SKIP")
        .alias("status"),
    )
