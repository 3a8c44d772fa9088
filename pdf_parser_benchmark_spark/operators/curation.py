"""Webtext curation filters — C4 line/document rules (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning...", §2.2) as zero-shuffle
in-row array expressions.

The C4 rules implemented (paper wording → rule):
- "retained only lines that ended in a terminal punctuation mark"
- "only retained lines that contained at least 5 words"
- "removed any line with the word Javascript"
- "removed any lines containing ... 'cookie policy'" (policy boilerplate)
- "discarded any page with fewer than 3 sentences" (kept lines stand in
  for sentences)
- "removed any page where the phrase 'lorem ipsum' appeared"
- "removed any pages that contained a curly bracket"

The driver corpus (documents.text) is a flat token stream with no line
structure or punctuation, so — like q:robots_txt_gate synthesizes URL
paths — `c4_lines` derives a deterministic line view (fixed words-per-line
chunking, arithmetic-scheduled punctuation and trigger phrases) that both
engines construct identically; the FILTER rules on top are the real C4
rules. On real web text, feed actual lines into `c4_doc_signals` instead.

Scale shape: everything is per-row `transform`/`filter`/`array_join` over
the split token array — no explode, no shuffle, whole rows never leave
their input partition. Survives 10^12 docs by construction.

Reference scoped: the reference repo has no curation stage (it ingests
curated book PDFs, /root/reference/src/ingest.py); this is part of the
engine's training-data-pipeline extension surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

WORDS_PER_LINE = 6
MIN_WORDS_PER_LINE = 5
MIN_SENTENCES = 3
POLICY_PHRASE = "cookie policy"


def unigram_surprisal_tiers(docs, text_col: str = "text",
                            id_col: str = "doc_id"):
    """CCNet-style perplexity tier bucketing (Wenzek et al. 2020): score
    every document by language-model surprisal, then bucket the corpus
    into head / middle / tail terciles — the tier-extraction stage of a
    webtext curation pipeline.

    Adaptations for a deterministic two-engine gate:
    - the LM is an add-one-smoothed unigram over the corpus itself
      (CCNet uses a pretrained KenLM 5-gram; same pipeline shape);
    - surprisal is integer bits: s(w) = floor(log2((N+V)/(c(w)+1)))
      computed as length(bin((N+V) div (c(w)+1))) - 1 — transcendental-
      free, so Spark and DuckDB agree bit-exactly;
    - doc score = (1000 * sum bits) div n_tokens (milli-bits/token);
    - tier cutoffs are the smallest scores whose cumulative doc count
      reaches ceil(n/3) / ceil(2n/3); ties share a tier.

    Scale shape: token counts are one map-side-combined shuffle; scoring
    joins tokens to the LM on token hash (AQE may broadcast a small
    vocab); the tercile thresholds come from the SCORE HISTOGRAM — a
    relation bounded by the score range (~64k milli-bit values), never by
    corpus size — via a broadcast self-join cumsum, so there is no global
    sort and no unpartitioned window at 10^12 docs.
    """
    from .dedup import _scoped_persist

    toks = docs.select(
        id_col,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = counts.agg(F.sum("cnt").alias("n_total"),
                        F.count("*").alias("vocab"))
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        (F.length(F.bin(F.expr("(n_total + vocab) DIV (cnt + 1)"))) - 1)
        .cast("long").alias("tok_bits"),
    )
    # scored is referenced by the histogram branch AND the final select;
    # without materialization every reference re-derives the token
    # explode + LM join (and, composed downstream of the curation funnel,
    # the full filter-stage expression tree) — measured 10× wall blowup
    # at 20k docs. localCheckpoint (row blocks, lineage truncated), not
    # persist — the columnar cache builder is the slow path (see
    # curation_funnel). Doc-granularity rows only.
    scored = (
        toks.join(lm, "tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"),
             F.sum("tok_bits").alias("bits"))
        .select(id_col, "n_tokens", "bits",
                F.expr("(bits * 1000) DIV n_tokens").alias("score_milli"))
        .localCheckpoint(eager=False)
    )
    hist = _scoped_persist(
        scored.groupBy("score_milli").agg(F.count("*").alias("cnt"))
    )
    cum = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")),
              F.col("b.score_milli") <= F.col("a.score_milli"))
        .groupBy(F.col("a.score_milli").alias("score_milli"))
        .agg(F.sum("b.cnt").alias("cum"))
    )
    thr = (
        cum.crossJoin(F.broadcast(cum.agg(F.max("cum").alias("n"))))
        .agg(
            F.min(F.when(F.col("cum") >= F.expr("(n + 2) DIV 3"),
                         F.col("score_milli"))).alias("t1"),
            F.min(F.when(F.col("cum") >= F.expr("(2 * n + 2) DIV 3"),
                         F.col("score_milli"))).alias("t2"),
        )
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col, "n_tokens", "bits", "score_milli",
        F.when(F.col("score_milli") <= F.col("t1"), "head")
         .when(F.col("score_milli") <= F.col("t2"), "middle")
         .otherwise("tail").alias("tier"),
    )


def domain_mixture_sample(docs, weights, frac_num: int = 1,
                          frac_den: int = 2, text_col: str = "text",
                          id_col: str = "doc_id",
                          domain_col: str = "source"):
    """Domain-mixture sampling (the data-mixing stage of The Pile /
    DoReMi-style corpus assembly): give each domain a token budget
    proportional to its target mixture weight, then fill each budget with
    a deterministic hash-priority scan of that domain's documents.

    budget(s) = (T * w_s * frac_num) div (W * frac_den), where T = total
    corpus tokens, W = sum of weights — i.e. a frac_num/frac_den slice of
    the corpus, re-apportioned by the target mixture. Within a domain,
    docs are ranked by md5(doc_id) (stable, uniform, engine-agnostic) and
    kept while the inclusive running token total fits the budget.

    Scale shape: one per-domain window (partitioned by domain — skewed
    hosts can be pre-salted upstream), one token-total aggregate, budgets
    joined back on domain (AQE broadcasts when small). All-integer math ⇒
    bit-exact vs the SQL twin.

    `weights`: DataFrame(domain_col, w:int).
    """
    toks = docs.select(
        id_col, domain_col,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("n_tokens"),
    )
    tot = toks.agg(F.sum("n_tokens").alias("t_total"))
    wsum = weights.agg(F.sum("w").alias("w_total"))
    budgets = (
        weights.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(wsum))
        .select(
            domain_col,
            F.expr(
                f"(t_total * w * {int(frac_num)}) "
                f"DIV (w_total * {int(frac_den)})"
            ).alias("budget"),
        )
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy(domain_col)
        .orderBy("priority", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = toks.withColumn(
        "priority", F.md5(F.col(id_col).cast("string"))
    ).withColumn("cum_tokens", F.sum("n_tokens").over(win))
    return ranked.join(budgets, domain_col).select(
        id_col, domain_col, "n_tokens", "priority", "cum_tokens", "budget",
        (F.col("cum_tokens") <= F.col("budget")).alias("keep"),
    )


def curation_funnel(docs, target_lang: str = "en",
                    min_words: int = 30, min_stop: int = 1):
    """The composed FineWeb/RefinedWeb-shaped curation funnel: target-
    language select → Gopher quality rules → C4 filters → leading-content
    exact dedup (keep min id per 3-token-prefix md5) → CCNet perplexity
    tiers over the survivors. Input: (doc_id, text, lang). Output:
    (doc_id, stage, tier) where stage ∈ lang|gopher|c4|dup|kept and tier
    is non-null only for kept docs. Stage predicates are in-row; the only
    shuffles are the dedup groupBy and the tier LM."""
    from ..functions.text import gopher_signals_from
    from .dedup import _scoped_persist

    # Staged-projection structure, for two measured reasons (250k-doc
    # probes, BENCH/BASELINE.md):
    # 1. expression sharing — inlining the predicates re-embeds every
    #    signal subtree (higher-order lambdas defeat Catalyst CSE),
    #    3× slower; the split arrays and signals are each projected ONCE;
    # 2. codegen unit size — one mega-projection generates a class large
    #    enough that HotSpot JIT compilation itself dominates fresh-JVM
    #    runs (126 s cold vs 12.6 s warm at 32 cores). Several moderate
    #    projections compile quickly and run stably.
    toks = docs.select(
        "doc_id", "text",
        (F.col("lang") == target_lang).alias("p_lang"),
        F.split(F.trim(F.col("text")), r"\s+").alias("_w"),
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_lw"),
    )
    s = gopher_signals_from(F.col("_w"), F.col("_lw"), F.col("text"))
    sig = toks.select(
        "doc_id", "text", "p_lang",
        s["n_words"].alias("_nw"),
        s["mean_word_len"].alias("_mwl"),
        s["alpha_frac"].alias("_af"),
        s["symbol_ratio"].alias("_sr"),
        s["n_stop"].alias("_ns"),
        c4_lines_from(F.col("doc_id"), F.col("_w")).alias("_lines"),
        F.md5(F.array_join(F.slice(F.col("_w"), 1, 3), " ")).alias("pk"),
    )
    c4s = c4_doc_signals(F.col("_lines"))
    p_gopher = (
        (F.col("_nw") >= min_words) & (F.col("_nw") <= 100000)
        & (F.col("_mwl") >= 3) & (F.col("_mwl") <= 10)
        & (F.col("_sr") < 0.1) & (F.col("_af") > 0.8)
        & (F.col("_ns") >= min_stop)
    )
    # The predicate columns feed the keeper census, the stage labeling,
    # and (through `staged`) the tier LM — materialize once at doc
    # granularity. localCheckpoint, NOT persist(): the in-memory COLUMNAR
    # cache builder is pathological on this wide text frame (measured
    # 110 s vs 5.7 s at 250k docs / 32 cores — row-block storage skips
    # the columnar build+compress entirely), and it also truncates the
    # lineage so downstream branches reuse blocks, like the CC/pagerank
    # rounds. Lazy (eager=False) keeps the returned plan unevaluated.
    # Cluster caveat (same as dedup CC): localCheckpoint blocks don't
    # survive executor loss; a reliable checkpoint dir restores that.
    base = sig.select(
        "doc_id", "text", "p_lang",
        p_gopher.alias("p_gopher"), c4s["keep"].alias("p_c4"), "pk",
    ).localCheckpoint(eager=False)
    keepers = (
        base.filter("p_lang AND p_gopher AND p_c4")
        .groupBy("pk").agg(F.min("doc_id").alias("keep_id"))
    )
    staged = base.join(keepers, "pk", "left").select(
        "doc_id", "text",
        F.when(~F.col("p_lang"), "lang")
         .when(~F.col("p_gopher"), "gopher")
         .when(~F.col("p_c4"), "c4")
         .when(F.col("doc_id") != F.col("keep_id"), "dup")
         .otherwise("kept").alias("stage"),
    )
    tiers = unigram_surprisal_tiers(
        staged.filter(F.col("stage") == "kept").select("doc_id", "text")
    ).select("doc_id", "tier")
    return staged.select("doc_id", "stage").join(tiers, "doc_id", "left")


def c4_lines_from(doc_id: Column, words: Column,
                  wpl: int = WORDS_PER_LINE) -> Column:
    """c4_lines over a pre-split token array (see c4_lines)."""
    n_lines = F.greatest(
        F.floor((F.size(words) + wpl - 1) / F.lit(wpl)).cast("int"), F.lit(1)
    )

    def build(i: Column) -> Column:
        base = F.array_join(F.slice(words, i * wpl + 1, F.lit(wpl)), " ")
        return F.concat(
            base,
            F.when((doc_id % 31 == 0) & (i == 0), " lorem ipsum")
             .otherwise(""),
            F.when((doc_id % 29 == 0) & (i == 2), " {x}").otherwise(""),
            F.when((doc_id % 7 == 0) & (i == 1), " javascript")
             .otherwise(""),
            F.when((doc_id % 23 == 0) & (i == 3), F.lit(" " + POLICY_PHRASE))
             .otherwise(""),
            F.when((doc_id + i) % 4 != 3, ".").otherwise(""),
        )

    return F.transform(F.sequence(F.lit(0), n_lines - 1), build)


def c4_lines(doc_id: Column, text: Column,
             wpl: int = WORDS_PER_LINE) -> Column:
    """Deterministic line view of a flat token stream: chunks of `wpl`
    words, with punctuation and C4 trigger phrases scheduled by
    (doc_id, line_no) arithmetic so both engines build identical lines.

    Schedule (all mutually exclusive by line index):
      line 0 of doc_id%31==0  += " lorem ipsum"   (page-kill phrase)
      line 2 of doc_id%29==0  += " {x}"           (curly-bracket page kill)
      line 1 of doc_id%7==0   += " javascript"    (line kill)
      line 3 of doc_id%23==0  += " cookie policy" (policy-line kill)
      terminal '.' on every line where (doc_id + i) % 4 != 3
    """
    return c4_lines_from(doc_id, F.split(F.trim(text), r"\s+"), wpl)


def c4_line_kept(line: Column) -> Column:
    """C4 line-level rule: terminal punctuation, >=5 words, no
    'javascript', no policy phrase."""
    return (
        line.rlike(r'[.!?"]$')
        & (F.size(F.split(line, " ")) >= MIN_WORDS_PER_LINE)
        & ~F.contains(F.lower(line), F.lit("javascript"))
        & ~F.contains(F.lower(line), F.lit(POLICY_PHRASE))
    )


def c4_doc_signals(lines: Column) -> dict[str, Column]:
    """C4 document-level signals over a line array: kept-line view, the
    page-kill flags, the keep decision, and the first failed rule.
    (r7 note: a struct-of-(line, lower(line)) rewrite that shares the
    lowercase across the three rules measured a wash interleaved — the
    per-line struct materialization cancels the saved lower() calls — so
    the simpler shape stays.)"""
    kept = F.filter(lines, c4_line_kept)
    has_lorem = F.exists(
        lines, lambda x: F.contains(F.lower(x), F.lit("lorem ipsum")))
    has_brace = F.exists(lines, lambda x: F.contains(x, F.lit("{")))
    n_kept = F.size(kept)
    keep = ~has_lorem & ~has_brace & (n_kept >= MIN_SENTENCES)
    reason = (
        F.when(has_lorem, "lorem_ipsum")
        .when(has_brace, "curly_brace")
        .when(n_kept < MIN_SENTENCES, "too_few_sentences")
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "n_lines": F.size(lines),
        "n_kept": n_kept,
        "keep": keep,
        "fail_reason": reason,
        "clean_text": F.when(keep, F.array_join(kept, "\n"))
                       .otherwise(F.lit(None).cast("string")),
    }
