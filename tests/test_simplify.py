"""Classification-experiment simplification tests
(exec/Classification.java:40-120 javadoc contract): motif-cover
retention, target-node inclusion, and n-neighborhood baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from motive_rdf_spark.data.generators import planted_graph
from motive_rdf_spark.operators.bgp import find
from motive_rdf_spark.operators.prune import prune_matches
from motive_rdf_spark.operators.simplify import (
    motif_cover,
    neighborhood,
    simplified_graph,
)
from motive_rdf_spark.patterns import Pattern

TRIANGLE = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]


def test_motif_cover_matches_pruned_instances(spark):
    g = planted_graph(spark, n=200, m=600, r=5, pattern_edges=TRIANGLE, k=30, seed=7).persist()
    g.count()
    pat = Pattern(TRIANGLE)
    cover = motif_cover(g, [pat])
    # pruned instances claim pairwise-disjoint triples; a triangle has 3
    kept = prune_matches(pat, sorted([list(x) for x in find(g, pat).collect()]))
    assert cover.count() == 3 * len(kept)
    # cover is a subgraph of g
    assert cover.join(g.select("s", "p", "o"), ["s", "p", "o"], "left_anti").count() == 0
    g.unpersist()


def test_simplified_graph_keeps_targets(spark):
    g = planted_graph(spark, n=200, m=600, r=5, pattern_edges=TRIANGLE, k=10, seed=7).persist()
    g.count()
    # pick two base-graph nodes untouched by motif instances
    targets = spark.createDataFrame([(3,), (4,)], "node long")
    simp = simplified_graph(g, [Pattern(TRIANGLE)], targets=targets)
    want = (
        g.filter((F.col("s").isin(3, 4)) | (F.col("o").isin(3, 4)))
        .select("s", "p", "o")
        .dropDuplicates()
    )
    missing = want.join(simp, ["s", "p", "o"], "left_anti").count()
    assert missing == 0
    g.unpersist()


def test_neighborhood_hops(spark):
    # path 0 ->1 ->2 ->3 ->4 (distinct predicates, so edges are unambiguous)
    rows = [(i, i, i + 1) for i in range(4)]
    g = spark.createDataFrame(rows, "s long, p long, o long")
    targets = spark.createDataFrame([(0,)], "node long")
    n1 = neighborhood(g, targets, 1)
    assert {tuple(r) for r in n1.collect()} == {(0, 0, 1)}
    n2 = neighborhood(g, targets, 2)
    assert {tuple(r) for r in n2.collect()} == {(0, 0, 1), (1, 1, 2)}
    n3 = neighborhood(g, targets, 3)
    assert {tuple(r) for r in n3.collect()} == {(0, 0, 1), (1, 1, 2), (2, 2, 3)}
    # undirected: from node 2, one hop reaches both edges
    t2 = spark.createDataFrame([(2,)], "node long")
    back = neighborhood(g, t2, 1)
    assert {tuple(r) for r in back.collect()} == {(1, 1, 2), (2, 2, 3)}
