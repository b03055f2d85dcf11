"""Scale/robustness properties: hub-skew stress for the salted CC,
and hypothesis property tests for the order-sensitive pieces
(canonicalization invariance, driver/distributed prune equivalence)."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from motive_rdf_spark.canon import canonical_key
from motive_rdf_spark.operators.prune import prune_matches
from motive_rdf_spark.patterns import Pattern, renumber
from motive_rdf_spark.pipeline.canonicalize import connected_components


def test_cc_hub_skew_stress(spark):
    """One entity referenced by 200k mentions (the north_rule's hub
    skew): the salted two-phase min must converge without a straggler
    reducer. ~200k edges, one hub."""
    hub = spark.range(200_000).select(
        F.lit(0).cast("long").alias("src"), (F.col("id") + 10).alias("dst")
    )
    chains = spark.range(500).select(
        (F.col("id") + 300_000).alias("src"), (F.col("id") + 300_001).alias("dst")
    )
    cc = connected_components(hub.unionAll(chains), salt_buckets=64)
    rows = cc.groupBy("component").agg(F.count("*").alias("n")).collect()
    comp = {int(r["component"]): int(r["n"]) for r in rows}
    assert comp[0] == 200_001  # hub + all mentions
    assert comp[300_000] == 501  # the chain


# --- hypothesis: random valid patterns -------------------------------


@st.composite
def patterns(draw):
    n_edges = draw(st.integers(1, 4))
    n_nodevars = draw(st.integers(1, 3))
    edges = []
    for _ in range(n_edges):
        s = draw(st.integers(-n_nodevars, 3))
        o = draw(st.integers(-n_nodevars, 3))
        p = draw(st.one_of(st.integers(0, 2), st.just(-1000)))
        edges.append((s, p, o))
    pat = renumber(edges)
    return pat


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pat=patterns(), seed=st.integers(0, 10_000))
def test_canonical_invariance_random(pat, seed):
    """canonical_key is invariant under any valid variable relabeling
    (NautyTest's random-relabeling property, NautyTest.java:112+)."""
    rng = random.Random(seed)
    nv, pv = pat.node_vars, pat.pred_vars
    nperm = dict(zip(nv, rng.sample(nv, len(nv))))
    pperm = dict(zip(pv, rng.sample(pv, len(pv))))
    relabeled = Pattern(
        [
            (
                nperm.get(s, s) if s < 0 else s,
                pperm.get(p, p) if p < 0 else p,
                nperm.get(o, o) if o < 0 else o,
            )
            for s, p, o in pat.edges
        ]
    )
    assert canonical_key(relabeled) == canonical_key(pat)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=40
    )
)
def test_prune_greedy_first_claim_property(data):
    """The sequential greedy prune keeps an instance iff none of its
    triples was claimed earlier — checked against an independent
    reimplementation over random 1-edge match lists."""
    pat = Pattern([(-1, 0, -2)])
    matches = [[a, b] for a, b in data]
    kept = prune_matches(pat, matches)
    # independent oracle
    seen: set = set()
    exp = []
    for a, b in data:
        t = (a, 0, b)
        if t not in seen:
            exp.append([a, b])
            seen.add(t)
    assert kept == exp
