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


#: driver-exact scoring densifies 3 int64 degree vectors; at the cap
#: that is ~48 MB of driver heap. Graphs with larger id spaces always
#: take the distributed histogram path.
DRIVER_DEGREE_LIMIT = 2_000_000


class GraphDegrees:
    """Persisted per-position degree frames of ONE graph. They are
    pattern-independent, so a search loop builds them once and every
    ``score_motif`` call reuses them — previously each candidate
    recomputed all three groupBys (3 shuffles per score). Re-persisting
    an identical plan is a cache hit in Spark's CacheManager, so N
    search chains over the same graph share one copy."""

    def __init__(self, triples: DataFrame):
        self.in_deg = deg.in_degrees(triples).persist()
        self.out_deg = deg.out_degrees(triples).persist()
        self.rel_deg = deg.rel_degrees(triples).persist()
        self._np: tuple | None = None
        self._np_refused = False

    def driver_arrays(self, n: int, r: int) -> tuple | None:
        """Dense (in, out, rel) numpy degree vectors for the driver-exact
        scoring tier, or None when the id spaces exceed
        DRIVER_DEGREE_LIMIT (the 100 TB case: stay distributed).
        Collected once per graph and memoized."""
        if self._np is not None:
            return self._np
        if self._np_refused or max(n, r) > DRIVER_DEGREE_LIMIT:
            self._np_refused = True
            return None
        import numpy as np

        def dense(df: DataFrame, key: str, space: int) -> "np.ndarray":
            arr = np.zeros(space, dtype=np.int64)
            for row in df.collect():
                arr[int(row[key])] = int(row["deg"])
            return arr

        self._np = (
            dense(self.in_deg, "node", n),
            dense(self.out_deg, "node", n),
            dense(self.rel_deg, "rel", r),
        )
        return self._np

    def unpersist(self) -> None:
        for d in (self.in_deg, self.out_deg, self.rel_deg):
            d.unpersist()


def null_bits(
    triples: DataFrame, prior: Prior = Prior.ML, degs: GraphDegrees | None = None
) -> float:
    """EdgeListModel.codelength(KGraph.degrees(data), prior) — the null
    model every motif competes against (RealWorld.java:62)."""
    n, m, r = deg.graph_dims(triples)
    if degs is None:
        return edgelist_codelength(deg.degree_histograms(triples, n, r), prior)
    hists = [
        deg.degree_histogram(degs.in_deg, n),
        deg.degree_histogram(degs.out_deg, n),
        deg.degree_histogram(degs.rel_deg, r),
    ]
    return edgelist_codelength(hists, prior)


def null_bits_arrays(degs_np: tuple, prior: Prior = Prior.ML) -> float:
    """``null_bits`` from dense driver-side degree vectors (the
    LocalGraph / driver-exact tier) — same histogram, zero Spark jobs.
    The dense vectors already carry the implicit zeros that
    deg.degree_histogram adds to the sparse collected form."""
    import numpy as np

    hists: list[Hist] = []
    for arr in degs_np:
        vals, cnts = np.unique(arr, return_counts=True)
        hists.append({int(v): int(c) for v, c in zip(vals, cnts)})
    return edgelist_codelength(hists, prior)


def _hist_of(df: DataFrame, col: str) -> Hist:
    rows = df.groupBy(col).agg(F.count("*").alias("cnt")).collect()
    return {int(r[col]): int(r["cnt"]) for r in rows}


def template_degree_hists(
    triples: DataFrame,
    pattern: Pattern,
    matches: DataFrame,
    n: int,
    r: int,
    degs: GraphDegrees | None = None,
) -> list[Hist]:
    """Graph degree histograms after subtracting the degree contribution
    of all instance triples, duplicates preserved (MotifCode.java:100-126:
    SparseList.inc over Utils.allTriples, then lazy minus).

    Spark shape: instance triples (projection-only explode of matches) →
    per-id counts → full outer join with the graph's per-id degrees →
    subtract → histogram. One shuffle per position; the three positions
    are independent Spark actions and run concurrently from driver
    threads (the scheduler interleaves their tiny stages).
    """
    from concurrent.futures import ThreadPoolExecutor

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

    in_deg = degs.in_deg if degs else deg.in_degrees(triples)
    out_deg = degs.out_deg if degs else deg.out_degrees(triples)
    rel_deg = degs.rel_deg if degs else deg.rel_degrees(triples)
    jobs = [
        (in_deg, "node", "o", n),
        (out_deg, "node", "s", n),
        (rel_deg, "rel", "p", r),
    ]
    with ThreadPoolExecutor(max_workers=3) as pool:
        return list(pool.map(lambda a: tmpl_hist(*a), jobs))


def variable_freq_hists(
    pattern: Pattern, matches: DataFrame, n: int, r: int
) -> dict[int, tuple[Hist, int]]:
    """Per-variable frequency-of-frequency histograms
    (MotifCode.patternDegrees, MotifCode.java:247-269): for each variable,
    how often each bound value occurs across matches, collected as
    {frequency -> #values}. Node variables range over [0,n), predicate
    variables over [0,r)."""
    from concurrent.futures import ThreadPoolExecutor

    node_vars = set(pattern.node_vars)

    def one(v: int) -> tuple[int, tuple[Hist, int]]:
        freq = matches.groupBy(var_col(v)).agg(F.count("*").alias("f"))
        return v, (_hist_of(freq, "f"), n if v in node_vars else r)

    vs = list(pattern.variables)
    if not vs:
        return {}
    with ThreadPoolExecutor(max_workers=min(len(vs), 6)) as pool:
        return dict(pool.map(one, vs))


def score_motif(
    triples: DataFrame,
    pattern: Pattern,
    pruned_matches: DataFrame,
    n: int,
    m: int,
    r: int,
    fast_py: bool = True,
    degs: GraphDegrees | None = None,
) -> MotifScore:
    """Full MotifCode.codelength pipeline over DataFrames. ``pruned_matches``
    must already be overlap-pruned (operators/prune.py). The count,
    template hists, and variable hists are independent actions over the
    (persisted) match set, so they run concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_k = pool.submit(pruned_matches.count)
        f_tmpl = pool.submit(
            template_degree_hists, triples, pattern, pruned_matches, n, r, degs
        )
        f_var = pool.submit(variable_freq_hists, pattern, pruned_matches, n, r)
        k, tmpl, var_h = f_k.result(), f_tmpl.result(), f_var.result()
    return motif_codelength(tmpl, n, m, r, pattern, var_h, k, fast_py)


def score_motif_rows(
    pattern: Pattern,
    rows: list[list[int]],
    n: int,
    m: int,
    r: int,
    degs_np: tuple,
    fast_py: bool = True,
) -> MotifScore:
    """Driver-exact tier of ``score_motif``: identical arithmetic, zero
    Spark jobs. Used by the search hot loop when the (already
    overlap-pruned) matches live on the driver — the prune_matches
    path, bounded by ``driver_prune_threshold`` rows — and the graph's
    id spaces fit ``GraphDegrees.driver_arrays``. The histogram algebra
    mirrors template_degree_hists/variable_freq_hists exactly: dense
    degree vector minus instance-triple contribution, then
    value-histogram (the Spark path's full-outer-join + implicit-zeros
    logic is the sparse form of the same subtraction)."""
    import numpy as np

    in_arr, out_arr, rel_arr = degs_np
    k = len(rows)
    mat = np.asarray(rows, dtype=np.int64).reshape(k, pattern.num_vars)

    def col(t: int) -> "np.ndarray":
        # values[i] binds var -(i+1)  ->  var t < 0 is column -t-1
        return mat[:, -t - 1] if t < 0 else np.full(k, t, dtype=np.int64)

    s_parts = [col(s) for s, _, _ in pattern.edges]
    p_parts = [col(p) for _, p, _ in pattern.edges]
    o_parts = [col(o) for _, _, o in pattern.edges]
    sub_out = np.bincount(np.concatenate(s_parts), minlength=n)
    sub_rel = np.bincount(np.concatenate(p_parts), minlength=r)
    sub_in = np.bincount(np.concatenate(o_parts), minlength=n)

    def hist_of(arr: "np.ndarray") -> Hist:
        vals, cnts = np.unique(arr, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, cnts)}

    tmpl = [
        hist_of(in_arr - sub_in),
        hist_of(out_arr - sub_out),
        hist_of(rel_arr - sub_rel),
    ]
    node_vars = set(pattern.node_vars)
    var_h: dict[int, tuple[Hist, int]] = {}
    for i, v in enumerate(pattern.variables):
        freqs = np.unique(mat[:, i], return_counts=True)[1]
        var_h[v] = (hist_of(freqs), n if v in node_vars else r)
    return motif_codelength(tmpl, n, m, r, pattern, var_h, k, fast_py)
