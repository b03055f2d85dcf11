"""Graph simplification for the classification experiment
(exec/Classification.java:40-120): retain only the triples covered by
instances of the top-k motifs (target nodes always kept), plus
n-neighborhood baseline graphs of the target nodes.

The reference describes this surface in Classification's javadoc
(its own ``writeSubgraph`` body was never finished); the semantics
implemented here are the documented contract:

- ``motif_cover``: all graph triples claimed by (pruned) instances of
  the given motifs — one bounded match job + greedy prune per pattern
  (shared claimed-set across patterns, list order), then the union of
  instance triples semi-joined back to the graph.
- ``neighborhood``: the 1..n-hop induced edge set around target nodes
  (undirected expansion, as an RGCN-baseline subgraph would use).

Scale shape: motif cover is the existing matcher + distributed prune;
the neighborhood expansion is n iterations of (frontier ⋈ triples)
with the frontier kept as a deduped node DF — each hop is one
shuffle-or-broadcast join; no driver-side adjacency ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from motive_rdf_spark.operators.bgp import find
from motive_rdf_spark.operators.motifset import prune_values_df, sort_patterns
from motive_rdf_spark.operators.prune import instance_triples_df
from motive_rdf_spark.patterns import Pattern


def motif_cover(
    triples: DataFrame,
    patterns: list[Pattern],
    max_matches: int = 200_000,
) -> DataFrame:
    """Triples covered by pruned instances of ``patterns`` (processed in
    canonical order with a shared claimed-triples set, mirroring
    MotifCode.pruneValues). Returns DataFrame[s, p, o] ⊆ ``triples``."""
    pats = sort_patterns(patterns)
    bounded = [find(triples, p).limit(max_matches) for p in pats]
    kept = prune_values_df(pats, bounded)
    parts = [
        instance_triples_df(p, k).select("s", "p", "o")
        for p, k in zip(pats, kept)
    ]
    out = parts[0]
    for q_ in parts[1:]:
        out = out.unionAll(q_)
    covered = out.dropDuplicates()
    # semi-join back: only real graph triples (instances claim exactly
    # graph triples, but the join also re-attaches any extra columns)
    return triples.join(covered, ["s", "p", "o"], "left_semi").select("s", "p", "o")


def simplified_graph(
    triples: DataFrame,
    patterns: list[Pattern],
    targets: DataFrame | None = None,
    max_matches: int = 200_000,
) -> DataFrame:
    """Classification-experiment simplification: motif-covered triples;
    when ``targets`` (DataFrame[node]) is given, every triple incident
    to a target node that would otherwise disappear is retained too, so
    target nodes are always present in the simplified graph
    (Classification javadoc: "Target nodes are always included")."""
    cover = motif_cover(triples, patterns, max_matches)
    if targets is None:
        return cover
    t = targets.select(F.col(targets.columns[0]).alias("node")).distinct()
    # NB: a USING-column join moves the key column first; re-select
    # (s,p,o) before the positional union
    incident = (
        triples.select("s", "p", "o")
        .join(t.withColumnRenamed("node", "s"), "s", "left_semi")
        .select("s", "p", "o")
        .unionAll(
            triples.select("s", "p", "o")
            .join(t.withColumnRenamed("node", "o"), "o", "left_semi")
            .select("s", "p", "o")
        )
        .dropDuplicates()
    )
    return cover.unionAll(incident).dropDuplicates()


def neighborhood(
    triples: DataFrame, targets: DataFrame, hops: int
) -> DataFrame:
    """The n-hop neighborhood edge set of the target nodes: all triples
    reachable by following at most ``hops`` undirected steps from any
    target. Each hop is one join + dedupe round; the frontier is
    localCheckpoint'ed so lineage stays flat."""
    t = triples.select("s", "p", "o")
    nodes = (
        targets.select(F.col(targets.columns[0]).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for _ in range(hops):
        edges = (
            t.join(nodes.withColumnRenamed("node", "s"), "s", "left_semi")
            .select("s", "p", "o")
            .unionAll(
                t.join(nodes.withColumnRenamed("node", "o"), "o", "left_semi")
                .select("s", "p", "o")
            )
            .dropDuplicates()
        )
        out = edges if out is None else out.unionAll(edges).dropDuplicates()
        out = out.localCheckpoint(eager=True)
        nodes = (
            out.select(F.col("s").alias("node"))
            .unionAll(out.select(F.col("o").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    assert out is not None
    return out
