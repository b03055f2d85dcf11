"""Incremental connected components: extend_components(old mapping, Δ)
must equal from-scratch CC over old ∪ Δ, across merge patterns."""

from __future__ import annotations

from pyspark.sql import functions as F

from motive_rdf_spark.pipeline.canonicalize import (
    connected_components,
    extend_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _m(df):
    return {r["node"]: r["component"] for r in df.collect()}


def _check(spark, old_pairs, delta_pairs):
    old = _edges(spark, old_pairs)
    delta = _edges(spark, delta_pairs)
    inc = _m(extend_components(connected_components(old), delta))
    scratch = _m(connected_components(old.unionAll(delta)))
    assert inc == scratch, (inc, scratch)
    return inc


def test_merge_two_components(spark):
    # Δ bridges two existing chains: labels collapse to the global min
    inc = _check(spark, [(1, 2), (2, 3), (10, 11)], [(3, 10)])
    assert inc[11] == 1


def test_delta_within_component_is_noop(spark):
    _check(spark, [(1, 2), (2, 3)], [(1, 3)])


def test_delta_with_fresh_nodes(spark):
    # new nodes joining an old component AND forming a brand-new one
    inc = _check(spark, [(1, 2)], [(2, 50), (100, 101)])
    assert inc[50] == 1 and inc[100] == 100 and inc[101] == 100


def test_chain_of_merges_through_delta(spark):
    # Δ alone connects three old components transitively
    inc = _check(spark, [(1, 2), (10, 11), (20, 21)], [(2, 10), (11, 20)])
    assert inc[21] == 1


def test_empty_delta(spark):
    old = _edges(spark, [(5, 6), (7, 8)])
    base = connected_components(old)
    inc = _m(extend_components(base, _edges(spark, [])))
    assert inc == _m(base)


def test_random_graph_increments(spark):
    # split a random edge set into three batches; fold in incrementally
    edges = spark.range(300).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(120)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(120)).alias("dst"),
    ).filter("src != dst").cache()
    parts = [
        edges.limit(100),
        edges.exceptAll(edges.limit(100)).limit(100),
        edges.exceptAll(edges.limit(200)),
    ]
    mapping = connected_components(parts[0])
    acc = parts[0]
    for p in parts[1:]:
        mapping = extend_components(mapping, p)
        acc = acc.unionAll(p)
    assert _m(mapping) == _m(connected_components(acc))
