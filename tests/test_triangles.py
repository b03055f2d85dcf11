"""Triangle counting / clustering coefficient: hand-computed tiny
graphs, planted-instance guarantees, and orientation-vs-naive
equivalence on a random graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from motive_rdf_spark.operators.triangles import triangle_stats, undirected_edges


def _g(spark, edges):
    return spark.createDataFrame(
        [(s, 0, o) for s, o in edges], "s long, p long, o long"
    )


def test_single_triangle_plus_tail(spark):
    # triangle 1-2-3 plus pendant 3-4
    g = _g(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    rows = {r["node"]: r for r in triangle_stats(g).collect()}
    assert rows[1]["n_triangles"] == 1 and rows[1]["cc"] == 1.0
    assert rows[2]["n_triangles"] == 1 and rows[2]["cc"] == 1.0
    # node 3 has deg 3 -> cc = 2*1/(3*2)
    assert rows[3]["n_triangles"] == 1 and abs(rows[3]["cc"] - 0.3333) < 1e-9
    assert 4 not in rows  # deg 1: cc undefined, excluded


def test_multiedges_directions_loops_collapse(spark):
    # same triangle written with reversed/duplicated/multi-pred edges
    # and a self-loop: the undirected simple graph is identical
    g = spark.createDataFrame(
        [(1, 0, 2), (2, 1, 1), (2, 0, 3), (3, 5, 1), (1, 0, 3), (2, 2, 2)],
        "s long, p long, o long",
    )
    assert undirected_edges(g).count() == 3
    rows = {r["node"]: r["n_triangles"] for r in triangle_stats(g).collect()}
    assert rows == {1: 1, 2: 1, 3: 1}


def test_square_no_triangles(spark):
    g = _g(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    rows = triangle_stats(g).collect()
    assert len(rows) == 4
    assert all(r["n_triangles"] == 0 and r["cc"] == 0.0 for r in rows)


def test_k4_counts(spark):
    # K4: 4 triangles, each node in 3 of them, cc = 1
    g = _g(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    rows = {r["node"]: r for r in triangle_stats(g).collect()}
    assert all(rows[n]["n_triangles"] == 3 and rows[n]["cc"] == 1.0 for n in (1, 2, 3, 4))


def test_planted_instances_have_triangles(spark):
    from motive_rdf_spark.data.generators import planted_graph

    n, k = 100, 10
    pat = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
    g = planted_graph(spark, n, 200, 3, pat, k, seed=11, hash_fn="md5")
    rows = {r["node"]: r["n_triangles"] for r in triangle_stats(g).collect()}
    for j in range(k):
        for off in range(3):
            assert rows.get(n + 3 * j + off, 0) >= 1


def test_matches_naive_enumeration_random_graph(spark):
    from motive_rdf_spark.data.generators import random_graph

    g = random_graph(spark, 80, 400, 4, seed=5).cache()
    got = {(r["node"], r["n_triangles"]) for r in triangle_stats(g).collect()}
    und = undirected_edges(g)
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("a2"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, (e1["a"] == e2["a2"]) & (e1["b"] < e2["c"]))
        .join(und.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"])
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    naive = {
        (r["node"], r["t"] or 0)
        for r in deg.filter("d >= 2").join(corners, "node", "left").collect()
    }
    assert got == naive


def test_parallelism_invariant(spark):
    g = _g(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)])
    a = sorted(tuple(r) for r in triangle_stats(g.repartition(1)).collect())
    b = sorted(tuple(r) for r in triangle_stats(g.repartition(13)).collect())
    assert a == b
