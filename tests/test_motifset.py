"""Motif-set scoring + multi-pattern search tests
(MotifCode.pruneValues / SimAnnealingMulti / GAMulti semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from motive_rdf_spark.data.generators import hub_graph, planted_graph
from motive_rdf_spark.operators.bgp import find
from motive_rdf_spark.operators.mdl_ops import null_bits
from motive_rdf_spark.operators.motifset import (
    entropy_sorted,
    prune_values,
    score_motif_set,
    sort_patterns,
)
from motive_rdf_spark.patterns import Pattern
from motive_rdf_spark.search_multi import GAConfig, GAMulti, MultiConfig, SimAnnealingMulti

TRIANGLE = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]


def test_prune_values_shared_seen():
    # two identical patterns: the second claims nothing the first took
    pat = Pattern([(-1, 0, -2)])
    matches = [[1, 2], [3, 4]]
    kept = prune_values([pat, pat], [matches, matches])
    assert kept[0] == [[1, 2], [3, 4]]
    assert kept[1] == []  # all triples already claimed


def test_motif_set_score_beats_null_on_planted(spark):
    g = planted_graph(spark, n=200, m=600, r=5, pattern_edges=TRIANGLE, k=60, seed=3).persist()
    g.count()
    nb = null_bits(g)
    sc = score_motif_set(g, [Pattern(TRIANGLE)])
    assert sc.total < nb
    assert sc.per_pattern_freq[0] >= 60
    # adding a junk pattern must not help (it costs pattern bits)
    sc2 = score_motif_set(g, [Pattern(TRIANGLE), Pattern([(-1, 4, -2)])])
    assert sc2.total >= sc.total - 1e-6 or sc2.total < nb
    g.unpersist()


def test_score_motif_set_distributed_equals_driver(spark):
    """The distributed shared-seen prune (prune_values_df path, forced
    via driver_prune_threshold=0) must reproduce the driver-exact joint
    score and per-pattern frequencies (VERDICT r1 item 1)."""
    g = planted_graph(spark, n=200, m=600, r=5, pattern_edges=TRIANGLE, k=30, seed=9).persist()
    g.count()
    pats = [Pattern(TRIANGLE), Pattern([(-1, 0, -2)]), Pattern([(-1, 1, -2)])]
    drv = score_motif_set(g, pats, driver_prune_threshold=10**9)
    dst = score_motif_set(g, pats, driver_prune_threshold=0)
    assert dst.per_pattern_freq == drv.per_pattern_freq
    assert abs(dst.total - drv.total) < 1e-6
    g.unpersist()


def test_sa_multi_distributed_smoke(spark):
    """SA-multi end-to-end through the distributed prune path."""
    g = hub_graph(spark, 60).persist()
    g.count()
    sam = SimAnnealingMulti(
        g, MultiConfig(iterations=4, seed=4, driver_prune_threshold=0)
    )
    state = sam.run()
    assert state.best and state.best_score < float("inf")
    g.unpersist()


def test_sort_patterns_deterministic():
    a = Pattern([(-1, 0, -3), (-2, 0, -3)])
    b = Pattern([(-1, 1, -2)])
    assert sort_patterns([a, b]) == sort_patterns([b, a])


def test_sa_multi_smoke(spark):
    g = hub_graph(spark, 60).persist()
    g.count()
    sam = SimAnnealingMulti(g, MultiConfig(iterations=10, seed=4))
    state = sam.run()
    assert state.best and state.best_score < float("inf")
    g.unpersist()


def test_ga_multi_smoke(spark):
    g = hub_graph(spark, 60).persist()
    g.count()
    ga = GAMulti(g, GAConfig(population=6, generations=2, seed=8))
    best, score = ga.run()
    assert best and score < float("inf")
    g.unpersist()


def test_entropy_sorted_column_order(spark):
    # v1 constant (entropy 0), v2 uniform (max entropy) -> v2 first
    df = spark.createDataFrame(
        [(7, i) for i in range(16)], "v1 long, v2 long"
    )
    out = entropy_sorted(df)
    assert out.columns == ["v2", "v1"]
    rows = [tuple(r) for r in out.collect()]
    assert rows == sorted(rows)


def test_batched_scoring_equals_sequential_and_cuts_jobs(spark):
    """batch_members=True (one unioned match job) must score a motif
    set identically to the per-pattern path, with fewer Spark jobs per
    evaluation (SURVEY §2.10: generation-at-a-time GAMulti mapping)."""
    g = planted_graph(spark, n=200, m=600, r=5, pattern_edges=TRIANGLE, k=40, seed=3).persist()
    g.count()
    pats = [Pattern(TRIANGLE), Pattern([(-1, 4, -2)]), Pattern([(-1, 0, -2), (-2, 1, -3)])]
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    sc.setJobGroup("seq", "sequential scoring")
    seq = score_motif_set(g, pats, batch_members=False)
    sc.setJobGroup("bat", "batched scoring")
    bat = score_motif_set(g, pats, batch_members=True)
    sc.setJobGroup("done", "")
    n_seq = len(tracker.getJobIdsForGroup("seq"))
    n_bat = len(tracker.getJobIdsForGroup("bat"))

    assert bat.total == seq.total
    assert bat.per_pattern_freq == seq.per_pattern_freq
    assert n_bat < n_seq, (n_bat, n_seq)
    g.unpersist()


def test_ga_batch_generations_equals_sequential(spark):
    """GAMulti with generation-level batch scoring reaches the same
    best set/score as the per-member path under the same seed (batching
    only changes job granularity, never values or rng consumption)."""
    g = hub_graph(spark, 60).persist()
    g.count()
    cfgs = [
        GAConfig(population=6, generations=2, seed=11, batch_generations=b)
        for b in (False, True)
    ]
    (best_a, score_a), (best_b, score_b) = (GAMulti(g, c).run() for c in cfgs)
    assert score_a == score_b
    assert [str(p) for p in best_a] == [str(p) for p in best_b]
    g.unpersist()
