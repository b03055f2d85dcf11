"""Spark adapters feeding the driver-side MDL math (functions/mdl.py).

Everything heavy stays distributed; only *histograms of histograms*
(distinct degree values × counts — tiny at any graph size) are
collected. Reference: MotifCode.codelength (MotifCode.java:56-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from motive_rdf_spark.functions.mdl import (
    Hist,
    MotifScore,
    Prior,
    edgelist_codelength,
    motif_codelength,
)
from motive_rdf_spark.operators import degrees as deg
from motive_rdf_spark.operators.prune import instance_triples_df
from motive_rdf_spark.patterns import Pattern, var_col


def null_bits(triples: DataFrame, prior: Prior = Prior.ML) -> float:
    """EdgeListModel.codelength(KGraph.degrees(data), prior) — the null
    model every motif competes against (RealWorld.java:62)."""
    n, m, r = deg.graph_dims(triples)
    return edgelist_codelength(deg.degree_histograms(triples, n, r), prior)


def _hist_of(df: DataFrame, col: str) -> Hist:
    rows = df.groupBy(col).agg(F.count("*").alias("cnt")).collect()
    return {int(r[col]): int(r["cnt"]) for r in rows}


def template_degree_hists(
    triples: DataFrame, pattern: Pattern, matches: DataFrame, n: int, r: int
) -> list[Hist]:
    """Graph degree histograms after subtracting the degree contribution
    of all instance triples, duplicates preserved (MotifCode.java:100-126:
    SparseList.inc over Utils.allTriples, then lazy minus).

    Spark shape: instance triples (projection-only explode of matches) →
    per-id counts → full outer join with the graph's per-id degrees →
    subtract → histogram. One shuffle per position.
    """
    inst = instance_triples_df(pattern, matches).select("s", "p", "o")

    def tmpl_hist(graph_deg: DataFrame, key: str, inst_col: str, space: int) -> Hist:
        sub = inst.groupBy(F.col(inst_col).alias(key)).agg(F.count("*").alias("sub"))
        joined = graph_deg.join(sub, key, "full_outer").select(
            (F.coalesce(F.col("deg"), F.lit(0)) - F.coalesce(F.col("sub"), F.lit(0))).alias("deg")
        )
        h = _hist_of(joined, "deg")
        covered = sum(h.values())
        if space > covered:
            h[0] = h.get(0, 0) + (space - covered)
        return h

    return [
        tmpl_hist(deg.in_degrees(triples), "node", "o", n),
        tmpl_hist(deg.out_degrees(triples), "node", "s", n),
        tmpl_hist(deg.rel_degrees(triples), "rel", "p", r),
    ]


def variable_freq_hists(
    pattern: Pattern, matches: DataFrame, n: int, r: int
) -> dict[int, tuple[Hist, int]]:
    """Per-variable frequency-of-frequency histograms
    (MotifCode.patternDegrees, MotifCode.java:247-269): for each variable,
    how often each bound value occurs across matches, collected as
    {frequency -> #values}. Node variables range over [0,n), predicate
    variables over [0,r)."""
    node_vars = set(pattern.node_vars)
    out: dict[int, tuple[Hist, int]] = {}
    for v in pattern.variables:
        col = var_col(v)
        freq = matches.groupBy(col).agg(F.count("*").alias("f"))
        fh = _hist_of(freq, "f")
        out[v] = (fh, n if v in node_vars else r)
    return out


def score_motif(
    triples: DataFrame,
    pattern: Pattern,
    pruned_matches: DataFrame,
    n: int,
    m: int,
    r: int,
    fast_py: bool = True,
) -> MotifScore:
    """Full MotifCode.codelength pipeline over DataFrames. ``pruned_matches``
    must already be overlap-pruned (operators/prune.py)."""
    k = pruned_matches.count()
    tmpl = template_degree_hists(triples, pattern, pruned_matches, n, r)
    var_h = variable_freq_hists(pattern, pruned_matches, n, r)
    return motif_codelength(tmpl, n, m, r, pattern, var_h, k, fast_py)
