"""Differential property test for connected components: the salted
min-label-propagation + pointer-jumping implementation vs an
independent driver-side union-find on random small graphs.

The union-find shares no code or algorithmic shape with the engine's
iterative-join fixpoint (canonicalize.py), so a bug in the salted min,
the jump join's null handling, or the convergence check cannot hide in
both implementations. Component id = min node id, the engine's
canonical rule.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st

from motive_rdf_spark.pipeline.canonicalize import connected_components


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find_root(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find_root(a), find_root(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # engine semantics: only nodes with at least one non-self-loop edge
    # appear in the output; isolated self-loop nodes are dropped
    touched = {n for a, b in edges if a != b for n in (a, b)}
    roots: dict[int, int] = {}
    for n in touched:
        roots[n] = find_root(n)
    # min node id per component
    comp_min: dict[int, int] = {}
    for n, r in roots.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[r] for n, r in roots.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.integers(0, 10**6), n_nodes=st.integers(2, 30))
def test_cc_matches_union_find(spark, seed, n_nodes):
    rng = random.Random(seed)
    # mix of sparse random edges, a chain (pointer-jumping path), and
    # possible self-loops (must be ignored)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(rng.randint(1, 2 * n_nodes))
    ]
    chain_len = rng.randint(0, 8)
    base = rng.randrange(100, 200)
    edges += [(base + i, base + i + 1) for i in range(chain_len)]

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)
