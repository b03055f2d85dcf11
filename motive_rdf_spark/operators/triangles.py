"""Per-node triangle counting + local clustering coefficient over the
KG's undirected simple graph, via degree-ordered edge orientation —
the scale-correct enumeration.

Naive triangle enumeration (three-way self-join on the undirected
edge list) generates every wedge at every node: a hub with degree d
contributes d² wedge candidates, which is exactly the skew that kills
the job on a power-law graph. Degree-ordered orientation fixes the
bound: direct each edge from the endpoint with the smaller
(degree, id) to the larger, and enumerate wedges only at each edge's
SOURCE. Every node's out-degree is then O(sqrt(m)) (a node with
out-degree t has t neighbors of degree >= t, so t(t) <= 2m), making
total wedge work O(m^1.5) regardless of hub degrees — the standard
bound (Schank & Wagner; the same orientation MapReduce/GraphX
triangle counts use). Each triangle (a < b < c in the order) is
produced exactly once: as the wedge (a->b, a->c) closed by the
oriented edge b->c.

Everything is joins + aggregations (AQE-skew-splittable, partially
aggregatable); no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected_edges(triples: DataFrame) -> DataFrame:
    """Distinct undirected simple edges (u < v by id) of (s,p,o)
    triples: predicates and edge multiplicity collapse, self-loops
    drop."""
    return (
        triples.filter(F.col("s") != F.col("o"))
        .select(
            F.least("s", "o").alias("u"),
            F.greatest("s", "o").alias("v"),
        )
        .distinct()
    )


def triangle_stats(triples: DataFrame) -> DataFrame:
    """DataFrame[node, deg, n_triangles, cc] for every node of degree
    >= 2 (cc undefined below); cc = 2T / (deg*(deg-1)), 4dp."""
    # und feeds the degree count AND the orientation join; deg feeds
    # both endpoint joins AND the final output; oriented feeds the two
    # wedge sides AND the closing-edge probe. Materialize each once
    # (eager localCheckpoint, the library's multi-consumer discipline —
    # see pagerank/khop): without it every consumer replays the whole
    # upstream distinct/groupBy chain — audited at 67 exchanges lazy
    # vs 8 materialized for the identical result.
    und = undirected_edges(triples).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # orient by (deg, id): lo -> hi; carry the rank struct of hi so the
    # wedge join can order its two endpoints without re-joining degrees
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = ranked.select(
        F.when(ru < rv, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ru < rv, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(ru < rv, rv).otherwise(ru).alias("hi_rank"),
    ).localCheckpoint(eager=True)
    # wedges at the minimum-rank corner: (a->b, a->c) with rank(b) < rank(c)
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("hi_rank").alias("rb")
    )
    e2 = oriented.select(
        F.col("lo").alias("a2"), F.col("hi").alias("c"), F.col("hi_rank").alias("rc")
    )
    wedges = e1.join(e2, (e1["a"] == e2["a2"]) & (e1["rb"] < e2["rc"])).select(
        "a", "b", "c"
    )
    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    # one pass over the triangle stream (explode), not three union
    # branches that each re-run the wedge join
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(corners, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                4,
            ).alias("cc"),
        )
    )


def triangle_stats_sql(graph_cte: str) -> str:
    """DuckDB oracle: naive id-ordered three-way self-join over the
    same undirected edge set (enumeration order differs from the
    degree-ordered plan; the triangle set is identical)."""
    return f"""{graph_cte}, und AS (
  SELECT DISTINCT LEAST(s, o) AS u, GREATEST(s, o) AS v FROM g WHERE s <> o
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
), corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), t AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM corners GROUP BY node
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node
)
SELECT deg.node, deg.deg,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       ROUND(2.0 * COALESCE(t.n_triangles, 0) / (deg.deg * (deg.deg - 1)), 4) AS cc
FROM deg LEFT JOIN t ON t.node = deg.node
WHERE deg.deg >= 2"""
