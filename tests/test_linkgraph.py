"""PageRank (operators/linkgraph.py): differential vs a pure-Python
replay of the integer recurrence, mass conservation, partitioning
invariance, and dangling-mass handling."""

from __future__ import annotations

import pytest

from pdf_parser_benchmark_spark.operators.linkgraph import SCALE, pagerank


def _py_pagerank(edges, iters=4, d=85, scale=SCALE):
    """Independent driver-side replay of the documented recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    adj = {}
    for s, t in edges:
        out[s] = out.get(s, 0) + 1
        adj.setdefault(s, []).append(t)
    rank = {v: scale // n for v in nodes}
    tele = (scale * (100 - d)) // 100 // n
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, ts in adj.items():
            c = rank[s] // out[s]
            for t in ts:
                inflow[t] += c
        dangle = sum(rank[v] for v in nodes if v not in out) // n
        rank = {v: tele + (d * (inflow[v] + dangle)) // 100 for v in nodes}
    return rank


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (5, 4),
    (6, 7),  # 7 is dangling (no out-edges)
    (8, 1), (8, 2), (8, 3),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_matches_python_replay(spark, edges_df):
    got = {r.id: r.rank for r in pagerank(edges_df, iters=4).collect()}
    assert got == _py_pagerank(EDGES, iters=4)


def test_mass_conserved_within_truncation(spark, edges_df):
    ranks = [r.rank for r in pagerank(edges_df, iters=3).collect()]
    n = len(ranks)
    total = sum(ranks)
    # every integer div floors; per iteration the loss is < n + 2 units
    assert SCALE - 4 * (n + 2) * 100 <= total <= SCALE
    assert all(r > 0 for r in ranks)


def test_partitioning_invariance(spark, edges_df):
    a = sorted((r.id, r.rank) for r in pagerank(edges_df, iters=3).collect())
    b = sorted(
        (r.id, r.rank)
        for r in pagerank(edges_df.repartition(7), iters=3).collect()
    )
    assert a == b


def test_dangling_node_receives_and_redistributes(spark, edges_df):
    got = {r.id: r.rank for r in pagerank(edges_df, iters=4).collect()}
    # node 7 only receives from 6 and re-emits via the dangling pool:
    # it must hold more than the bare teleport floor
    tele = (SCALE * 15) // 100 // len(got)
    assert got[7] > tele
    # hub 1 (in-degree 4) outranks leaf 5 (in-degree 0)
    assert got[1] > got[5]


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=2).count() == 0
