"""Text scalar functions (reference §2.8 + training-data-pipeline text ops).

All built-in-expression implementations (codegen'd, no Python in the hot
path) unless noted. Each cites the reference behavior it reproduces.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# reference scalar semantics
# --------------------------------------------------------------------------

REPRO_PATTERN = r"[Rr]eproducible\s+([\d]+\.[\d]+|[\d]+[A-Za-z]?)"


def reproducible_id(col: Column) -> Column:
    """P3: first reproducible id or '' (/root/reference/src/ingest.py:66-69)."""
    return F.regexp_extract(col, REPRO_PATTERN, 1)


def sku_from_stem(stem: Column) -> Column:
    """P11: sku = stem[:6] (/root/reference/CLAUDE.md:186-192; pinned by
    tests/test_ingest.py:10-22)."""
    return F.substring(stem, 1, 6)


def title_from_stem(stem: Column) -> Column:
    """P11: slug after 'sku_' → spaces → Title Case."""
    slug = F.when(F.length(stem) > 7, F.substring(stem, 8, 10_000)).otherwise(stem)
    return F.initcap(F.regexp_replace(slug, r"[-_]", " "))


def normalize_title(col: Column) -> Column:
    """P12 normalize chain (/root/reference/data/pdfs/rename_pdfs.py:30-39):
    lower, '&'→' and ', strip .pdf, drop ®™, drop [..]/(..) groups, collapse
    non-alnum, squeeze spaces. (The NFKD fold is in `nfkd_ascii` below —
    needs Python unicodedata.)"""
    s = F.lower(col)
    s = F.regexp_replace(s, r"&", " and ")
    s = F.regexp_replace(s, r"\.pdf$", "")
    s = F.regexp_replace(s, "[®™]", "")
    s = F.regexp_replace(s, r"\[.*?\]", " ")
    s = F.regexp_replace(s, r"\(.*?\)", " ")
    s = F.regexp_replace(s, r"[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


@pandas_udf(T.StringType())
def nfkd_ascii(s: pd.Series) -> pd.Series:
    """NFKD → ascii fold (rename_pdfs.py:31) — Series→Series Arrow UDF;
    unicodedata has no Spark builtin equivalent."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFKD", str(x))
        .encode("ascii", "ignore")
        .decode("ascii")
        if x is not None
        else None
    )


def cache_key(query: Column, model: Column, top_k: Column) -> Column:
    """SHA-256 of 'query:model:top_k' (/root/reference/src/cache.py:10-13)."""
    return F.sha2(F.concat_ws(":", query, model, top_k.cast("string")), 256)


def excerpt(col: Column, n: int = 300) -> Column:
    """O5 truncation (/root/reference/src/rag.py:174)."""
    return F.substring(col, 1, n)


# --------------------------------------------------------------------------
# training-data text analysis (engine extensions)
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

# crude BPE-ish subword splitter: word pieces, digits, punctuation runs
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def regex_token_count(col: Column) -> Column:
    """BPE-ish regex token count (letters runs + digit runs + punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are english stopwords."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    return F.round(stop / F.greatest(F.size(words), F.lit(1)), 6)


def punct_ratio(col: Column) -> Column:
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.round(punct / F.greatest(F.length(col), F.lit(1)), 6)


def mean_word_len(col: Column) -> Column:
    words = F.split(F.trim(col), r"\s+")
    total = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return F.round(total / F.greatest(F.size(words), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence −
    punctuation noise. Deterministic arithmetic only (oracle-able)."""
    n_words = ws_token_count(col)
    length_ok = F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.5)).otherwise(
        F.lit(0.0)
    )
    stop_part = F.least(stopword_ratio(col) * 2, F.lit(0.3))
    punct_pen = F.least(punct_ratio(col) * 2, F.lit(0.2))
    return F.round(length_ok + stop_part + (F.lit(0.2) - punct_pen), 6)


_LANG_MARKERS: tuple[tuple[str, str], ...] = (
    # (lang, word-boundary regex of characteristic stopwords)
    ("en", r"\b(the|and|of|is|with)\b"),
    ("de", r"\b(der|die|das|und|ist)\b"),
    ("es", r"\b(el|la|los|es|una)\b"),
    ("fr", r"\b(le|la|les|est|une)\b"),
)


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts, 'und'
    (undetermined) when all zero. Ties resolve in _LANG_MARKERS order."""
    lowered = F.lower(col)
    counts = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(rx), 0))
        for lang, rx in _LANG_MARKERS
    }
    best = F.greatest(*counts.values())
    result = F.lit("und")
    for lang, _ in reversed(_LANG_MARKERS):
        result = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(
            result
        )
    return result


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (distinct), the unit for MinHash/Jaccard
    dedup. Built-ins only: split → transform over index range → slice+join."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.array_join(words, " ")))
    )


def doc_fingerprint(col: Column, k: int = 5) -> Column:
    """Winnowing-style document fingerprint: min MD5 over word k-gram
    shingles (rolling-hash spirit; md5 keeps Spark and the DuckDB oracle
    bit-identical)."""
    return F.array_min(F.transform(shingles(col, k), F.md5))
