"""PageRank over the (s, p, o) graph — entity importance for KG
curation (rank-weighted linking candidates, motif seed selection,
graph summarization order). The reference engine ranks motifs by MDL
score; node-level centrality is the natural companion the Spark graft
adds for its KG-construction pipeline.

Semantics (documented exactly so the SQL oracle can mirror them):

    r_0(v)     = 1 / N                      for every node v
    r_{t+1}(v) = (1 - d) / N + d * SUM over in-edges (u -> v)
                                  of r_t(u) / outdeg(u)

with damping ``d`` and a FIXED number of iterations. Dangling-node
mass (nodes with outdeg 0) is NOT redistributed — the standard
simplified variant; ranks then sum to < 1, which is fine for ordering
and is exactly reproducible in ANSI SQL by unrolling the iterations.
Distinct edges only (parallel (s,o) pairs under different predicates
count once — rank flows over the adjacency structure, not multi-edges).

Scale design: each iteration is ONE equi-join of the current rank
vector against the out-degree-annotated edge list (hash-partitioned on
the source node) followed by a partial-aggregatable groupBy sum on the
destination — the canonical Spark iterative-graph shape. Hub
destinations skew only the reduce side and the map-side combine
absorbs most of it; AQE skew-join splits the probe. Every iteration is
materialized with an eager localCheckpoint: the rank vector feeds the
next join AND the final output, and without cutting lineage iteration
t would replay iterations 1..t-1 (same O(k²) trap as
operators/paths.khop_min_dist — measured there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pagerank(
    triples: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int | None = 4,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns DataFrame[node, rank_n] where
    ``rank_n`` is the rank scaled by N (mean 1.0) — scale-free across
    graph sizes and numerically robust to ROUND for the value oracle.
    ``round_to=None`` skips rounding (library use)."""
    proj = triples.select(F.col("s").alias("src"), F.col("o").alias("dst"))
    to_unpersist = []
    if materialize:
        # ONE exchange builds the whole iteration-ready edge cache:
        # hash-repartition on src first, then dedupe and compute the
        # out-degree INSIDE that partitioning — HashPartitioning(src)
        # satisfies the (src, dst) clustering the dedup needs and the
        # src clustering the window needs, so neither re-shuffles
        # (the naive distinct -> groupBy -> join -> repartition chain
        # is 4 exchanges for the same result). persist (NOT
        # localCheckpoint — it drops partitioning, measured) keeps the
        # cached outputPartitioning, so every iteration's join
        # shuffles only the rank vector.
        shuf = int(
            triples.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        edges_d = (
            proj.repartition(shuf, "src")
            .dropDuplicates(["src", "dst"])
            .withColumn("odeg", F.count("*").over(Window.partitionBy("src")))
            .persist()
        )
        edges_d.count()
        # persist the node set hash-partitioned on the join key: the
        # per-iteration dangling left-join (nodes ⋈ contribs) then
        # reuses the cached partitioning on the nodes side and the
        # groupBy's partitioning on the contribs side — one less
        # exchange per iteration
        nodes = (
            edges_d.select(F.col("src").alias("node"))
            .unionAll(edges_d.select(F.col("dst").alias("node")))
            .distinct()
            .repartition(shuf, "node")
            .persist()
        )
        to_unpersist += [nodes, edges_d]
    else:
        edges = proj.distinct()
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionAll(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        out_deg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
        edges_d = edges.join(out_deg, "src")

    # work in N-scaled space throughout: r_scaled = r * N, so
    # r0_scaled = 1 and the teleport term is (1 - d), independent of N
    ranks = nodes.select("node", F.lit(1.0).alias("rank_n"))
    for _ in range(int(iterations)):
        contribs = (
            ranks.join(edges_d, ranks["node"] == edges_d["src"])
            .select(F.col("dst").alias("node"), (F.col("rank_n") / F.col("odeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank_n"),
        )
        if materialize:
            ranks = ranks.localCheckpoint(eager=True)
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank_n", round_to).alias("rank_n"))
    # the returned plan reads only the last iteration's checkpoint, so
    # the internal edge/node caches can be released immediately
    for df in to_unpersist:
        df.unpersist()
    return ranks


def pagerank_sql(
    triples_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int = 4,
) -> str:
    """ANSI-SQL twin of :func:`pagerank`: the fixed iteration count is
    unrolled into chained CTEs (r0 -> r1 -> ... -> rk), which keeps the
    oracle pure SQL — no recursive aggregation needed. ``triples_cte``
    must define a ``triples(s, p, o)`` CTE (kg_tpch.TRIPLES_CTE)."""
    d = damping
    parts = [
        triples_cte.rstrip(),
        """, edges AS (SELECT DISTINCT s AS src, o AS dst FROM triples),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
edges_d AS (
  SELECT e.src, e.dst, od.odeg FROM edges e
  JOIN (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src) od ON e.src = od.src
),
r0 AS (SELECT node, 1.0 AS rank_n FROM nodes)""",
    ]
    for t in range(1, int(iterations) + 1):
        parts.append(
            f""",
r{t} AS (
  SELECT n.node,
         {1.0 - d} + {d} * COALESCE(SUM(r.rank_n / e.odeg), 0.0) AS rank_n
  FROM nodes n
  LEFT JOIN edges_d e ON e.dst = n.node
  LEFT JOIN r{t - 1} r ON r.node = e.src
  GROUP BY n.node
)"""
        )
    parts.append(
        f"\nSELECT node, ROUND(rank_n, {round_to}) AS rank_n FROM r{int(iterations)}"
    )
    return "".join(parts)
