"""Driver correctness-window metadata (ADVICE r4: make the rotation policy
explicit data, not a hand-edited list buried in queries.py).

The external driver's per-round CORRECTNESS gate hashes only the FIRST
``WINDOW_SIZE`` entries of ``queries.QUERIES`` in dict insertion order.  To
give every query a hard driver row at least every other round, queries.py
re-keys its registries at module end using :func:`window_order`, which sorts
by *staleness*: queries never driver-green first, then oldest-last-green
first, registration order as the tie-break.  New queries (absent from
``LAST_GREEN``) therefore go to the front automatically — no per-round list
edit needed.

``LAST_GREEN`` is generated from the CORRECTNESS_r*.json files by
``tools/update_driver_window.py`` (run it once at the start of each round,
after the driver has written the previous round's file).  A query counts as
green if its value hash matched, or — for rows-only-by-design queries — if
the driver recorded a non-empty row count.

Contract doc: tools/DRIVER_WINDOW.md.
"""

from __future__ import annotations

WINDOW_SIZE = 50

# name -> last round with a green driver CORRECTNESS row (generated; do not
# hand-edit — run tools/update_driver_window.py).
LAST_GREEN = {
    "extract_digest": 4,
    "extract_pipeline": 4,
    "contamination_check": 4,
    "media_refs": 4,
    "robots_filter": 4,
    "lang_id": 4,
    "lang_id3": 4,
    "doc_fingerprint": 4,
    "hash_embeddings": 4,
    "tpch_q1_pricing": 4,
    "tpch_q3_topk": 4,
    "tpch_q5_volume": 4,
    "semi_join_customers": 4,
    "set_ops_sources": 4,
    "excerpts": 4,
    "rollup_revenue": 4,
    "pivot_status_qty": 4,
    "count_distinct_orders": 4,
    "median_value_by_type": 4,
    "tpch_q6_forecast": 4,
    "tpch_q4_priority": 4,
    "tpch_q10_returns": 4,
    "sql_api_pricing": 4,
    "sql_api_topk": 4,
    "url_canonicalize": 4,
    "url_dedup": 4,
    "pii_redact": 4,
    "hash_sample": 4,
    "ngram_topk": 4,
    "salted_agg": 4,
    "salted_join": 4,
    "multimodal_decode": 4,
    "frame_sample": 4,
    "minhash_neardup_xx": 4,
    "dedup_clusters": 4,
    "dedup_clusters_2p": 4,
    "dup_paragraphs": 4,
    "strip_dup_paragraphs": 4,
    "pdf_link_graph": 4,
    "gopher_rules": 4,
    "crawl_frontier": 4,
    "script_detect": 4,
    "robots_txt_gate": 4,
    "host_indegree_all": 4,
    "sitemap_frontier": 4,
    "embedding_neardup_rh": 4,
    "ivf_recall": 4,
    "sessionize": 4,
    "windowed_event_counts": 4,
    "summary_agg": 3,
    "fuzzy_title_join": 3,
    "boilerplate_strip": 3,
    "boilerplate_lines": 3,
    "chunk_type_map": 3,
    "repro_extract": 3,
    "empty_filter": 3,
    "filename_meta": 3,
    "normalize_title": 3,
    "nfkd_fold": 3,
    "cache_key": 3,
    "metadata_filter": 3,
    "distinct_sources": 3,
    "max_score_gate": 3,
    "manifest_equi_join": 3,
    "anti_join_resume": 3,
    "jaccard_title_join": 3,
    "hierarchy_propagation": 3,
    "topk_per_group": 3,
    "best_second_gap": 3,
    "greedy_dedup": 3,
    "two_path_union": 3,
    "topk_cosine": 3,
    "knn_join": 3,
    "ann_ivf_topk": 3,
    "pq_topk": 3,
    "rag_retrieval": 3,
    "approx_distinct_users": 3,
    "ann_ivf_kmeans_topk": 3,
    "adaptive_retry_topk": 3,
    "embedding_neardup": 3,
    "dedup_exact": 3,
    "minhash_signature": 3,
    "lsh_candidates": 3,
    "minhash_neardup": 3,
    "simhash_fingerprint": 3,
    "simhash_neardup": 3,
    "jaccard_neardup": 3,
    "stratified_sample": 3,
    "snapshot_diff": 3,
    "link_graph": 3,
    "host_indegree": 3,
    "token_counts": 3,
    "quality_scores": 3,
    "repetition_signals": 3,
    "audio_rms": 0,  # r4 driver ERR (array canonicalizer) — never green
}


def window_order(names):
    """Return *names* sorted staleness-first for the driver window.

    Never-green / new queries first (LAST_GREEN default 0), then ascending
    last-green round; registration order breaks ties so the ordering is
    deterministic across processes.
    """
    order = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (LAST_GREEN.get(n, 0), order[n]))
