"""Link-graph analytics: PageRank over the crawl's host/page graph.

A web-scale training pipeline ranks hosts/pages (crawl prioritization,
quality priors — the reference corpus's "which sources matter" concern,
cf. /root/reference/docs/PRD.md ingest ordering) with PageRank over the
extracted link graph (q:link_graph / q:host_indegree feed it).

Implementation notes (Brin & Page 1998; the public algorithm):

- **Integer fixed-point arithmetic.** Ranks are carried as int64
  micro-units (``scale`` = 1e12 of total mass) and every step is integer
  division (`div`) and int64 sums. Unlike float PageRank, the result is
  bit-identical regardless of partitioning, sum order, or engine — which
  is exactly what the DuckDB oracle gate needs (an unrolled-CTE twin
  replays the same integer recurrence), and what a 1000-executor rerun
  needs to be reproducible. int64 headroom: mass ≤ 1e12, damping
  multiply ≤ 1e14 « 2^63.

- **Shuffle shape per iteration:** one join of (src, rank) against the
  edge list on `src` + one groupBy `dst` — both hash-partitioned on node
  id; only (id, long) pairs ever move, never adjacency lists. Dangling
  mass is a 1-row aggregate crossJoin-broadcast back (no driver collect
  in the loop). Each round localCheckpoints the rank table: iterative
  plans otherwise grow multiplicatively and the analyzer, not the
  executors, becomes the bottleneck (same discipline as
  dedup.connected_components_two_phase).

- At 10^12 edges, skewed in-degree hubs (dst-side groupBy) are handled
  by Spark's partial aggregation (map-side combine on dst) — the reduce
  side only sees one partial per task, so a 10^8-in-degree hub costs
  amortized map work, not a single hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12  # total rank mass in micro-units


def pagerank(
    edges: DataFrame,
    iters: int = 4,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """(src, dst) directed edges → (id, rank) with integer micro-unit
    ranks summing to ≈ ``scale`` (up to per-node floor truncation).

    Recurrence (all integer):
        teleport   = (scale * (100 - d)) div 100 div N
        contrib(v) = rank(v) div outdeg(v)            [per out-edge]
        dangle     = (Σ rank over outdeg-0 nodes) div N
        rank'(u)   = teleport + (d * (Σ contrib + dangle)) div 100
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    # persists are registered with dedup's release_intermediates() scope
    # (ADVICE r6): repeated invocations in one session (bench warm lanes,
    # notebooks) otherwise accumulate executor storage nothing reclaims
    from .dedup import _scoped_persist

    edges = _scoped_persist(edges.select("src", "dst").distinct())
    nodes = _scoped_persist(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()  # bounded driver scalar (node count), loop-invariant
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("outdeg")
    )
    teleport = (scale * (100 - damping_pct)) // 100 // n

    rank = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        with_deg = rank.join(outdeg, "id", "left")
        contrib = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .withColumnRenamed("id", "src")
            .join(edges, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("rank div outdeg")).alias("inflow"))
        )
        dangle = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.expr(f"coalesce(sum(rank), 0L) div {n}").alias("dangle")
        )
        rank = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangle))
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"(({damping_pct}) * (coalesce(inflow, 0L) + dangle))"
                        " div 100"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return rank


def pagerank_unrolled_sql(
    edges_cte: str,
    iters: int = 4,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """The DuckDB twin: same integer recurrence as :func:`pagerank`,
    unrolled as one CTE per iteration (a fixed iteration count is part of
    the operator contract, so unrolling is exact, not an approximation).
    ``edges_cte`` must define ``edges(src, dst)`` (already distinct)."""
    parts = [
        edges_cte,
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY 1)",
        f"r0 AS (SELECT id, CAST({scale} // (SELECT n FROM nn) AS BIGINT)"
        " AS rank FROM nodes)",
    ]
    d = damping_pct
    tele = f"({scale} * {100 - d}) // 100 // (SELECT n FROM nn)"
    for i in range(iters):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS id, CAST(sum(r.rank // o.outdeg) AS BIGINT) AS inflow
  FROM edges e JOIN r{i} r ON r.id = e.src JOIN outdeg o ON o.id = e.src
  GROUP BY 1
),
g{i} AS (
  SELECT CAST(coalesce(sum(r.rank), 0) // (SELECT n FROM nn) AS BIGINT) AS dangle
  FROM r{i} r LEFT JOIN outdeg o ON o.id = r.id WHERE o.id IS NULL
),
r{i + 1} AS (
  SELECT n.id,
         CAST({tele} + ({d} * (coalesce(c.inflow, 0)
              + (SELECT dangle FROM g{i}))) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.id = n.id
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, rank FROM r{iters}"
