"""Edge-list + motif MDL codelengths (reference EdgeListModel.java,
MotifCode.java) over degree *histograms* — the scale-safe collected form
(see operators/degrees.py).

Null model (EdgeListModel.codelength, EdgeListModel.java:22-43):

    bits = 2·log2(m!) − Σ log2(din!) − Σ log2(dout!) − Σ log2(drel!) + prior

Motif code (MotifCode.codelength, MotifCode.java:56-137) components:
  dimensions + pattern + template (degrees minus instance-triple degrees)
  + labels (per-variable value-frequency code, matchesCodelengthAlt,
  MotifCode.java:205-226).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from motive_rdf_spark.functions.coders import (
    log2_factorial,
    prefix,
    py_store_hist,
    py_store_hist_opt,
    store_sequence_ml,
)
from motive_rdf_spark.patterns import Pattern

Hist = dict[int, int]


class Prior(Enum):
    """EdgeListModel.Prior (EdgeListModel.java:14)."""

    NONE = "none"
    ML = "ml"
    COMPLETE = "complete"
    COMPLETE_FAST = "complete_fast"


def _sum_log2_fact(hist: Hist) -> float:
    return sum(c * log2_factorial(d) for d, c in hist.items() if d > 1 and c > 0)


def _size(hist: Hist) -> int:
    return sum(hist.values())


def prior_bits(degrees: list[Hist], prior: Prior) -> float:
    """EdgeListModel.prior (EdgeListModel.java:45-82). ``degrees`` =
    [in, out, rel] histograms {degree -> #ids}, zeros included."""
    if prior is Prior.NONE:
        return 0.0
    if prior is Prior.ML:
        return sum(store_sequence_ml(h) for h in degrees)
    n, r = _size(degrees[0]), _size(degrees[2])
    coder = py_store_hist_opt if prior is Prior.COMPLETE else py_store_hist
    return (
        prefix(n)
        + prefix(r)
        + coder(degrees[0])
        + coder(degrees[1])
        + coder(degrees[2])
    )


def edgelist_codelength(degrees: list[Hist], prior: Prior) -> float:
    """EdgeListModel.codelength (EdgeListModel.java:22-43)."""
    m = sum(d * c for d, c in degrees[0].items())
    bits = 2.0 * log2_factorial(m)
    for h in degrees:
        bits -= _sum_log2_fact(h)
    return bits + prior_bits(degrees, prior)


def degrees_from_lists(ins: list[int], outs: list[int], rels: list[int]) -> list[Hist]:
    """Dense degree vectors -> histograms (unit-test convenience)."""

    def h(xs: list[int]) -> Hist:
        out: Hist = {}
        for x in xs:
            out[x] = out.get(x, 0) + 1
        return out

    return [h(ins), h(outs), h(rels)]


# ---------------------------------------------------------------------------
# Motif code
# ---------------------------------------------------------------------------


def pattern_degree_hists(pattern: Pattern) -> list[Hist]:
    """Degree histograms of the pattern graph itself (KGraphList.degrees
    over the pattern, MotifCode.java:85): node id space = pattern nodes,
    relation id space = pattern edge tags (distinct)."""
    nodes = pattern.nodes
    ins = {v: 0 for v in nodes}
    outs = {v: 0 for v in nodes}
    rels: dict[int, int] = {}
    for s, p, o in pattern.edges:
        outs[s] += 1
        ins[o] += 1
        rels[p] = rels.get(p, 0) + 1

    def h(d: dict[int, int]) -> Hist:
        out: Hist = {}
        for x in d.values():
            out[x] = out.get(x, 0) + 1
        return out

    return [h(ins), h(outs), h(rels)]


def pattern_bits(pattern: Pattern) -> float:
    """Pattern-structure component (MotifCode.java:82-98): edge-list code
    of the pattern graph with COMPLETE prior + PY code of the label/tag
    integer list."""
    bits = edgelist_codelength(pattern_degree_hists(pattern), Prior.COMPLETE)
    labels = [t for s, _, o in pattern.edges for t in (s, o)]
    # node labels listed once per node in the reference (pattern.nodes()),
    # then link tags (MotifCode.java:88-93)
    labels = list(dict.fromkeys(labels))  # distinct nodes, first-seen order
    tags = [p for _, p, _ in pattern.edges]
    hist: Hist = {}
    for v in labels + tags:
        hist[v] = hist.get(v, 0) + 1
    return bits + py_store_hist(hist)


@dataclass
class MotifScore:
    total: float
    dimensions: float
    pattern: float
    template: float
    labels: float


def matches_codelength_alt(
    var_hists: dict[int, tuple[Hist, int]],
    num_matches: int,
    num_vars: int,
    fast_py: bool = True,
) -> float:
    """MotifCode.matchesCodelengthAlt (MotifCode.java:205-226).

    ``var_hists``: per variable id, ``({frequency -> #values bound with
    that frequency (freq > 0)}, id_space_size)`` — space = n for node
    variables, r for predicate variables. This frequency-of-frequency
    form is what one groupBy(var).count().groupBy(count).count() job
    collects: tiny at any scale. The PY coder sees the implicit zeros of
    the full id space (SparseList(n) semantics, MotifCode.java:247-269),
    folded in here.
    """
    coder = py_store_hist if fast_py else py_store_hist_opt
    degree_bits = 0.0
    fact_bits = 0.0
    for _, (fh, space) in var_hists.items():
        nonzero_vals = sum(fh.values())
        full = dict(fh)
        zeros = max(space - nonzero_vals, 0)
        if zeros:
            full[0] = full.get(0, 0) + zeros
        degree_bits += coder(full)
        for freq, cnt in fh.items():
            fact_bits -= cnt * log2_factorial(freq)
    if num_matches == 0:
        return degree_bits
    return (num_vars - 1) * log2_factorial(num_matches) + fact_bits + degree_bits


def motif_codelength(
    graph_degrees_template: list[Hist],
    n: int,
    m: int,
    r: int,
    pattern: Pattern,
    var_hists: dict[int, tuple[Hist, int]],
    num_matches: int,
    fast_py: bool = True,
) -> MotifScore:
    """MotifCode.codelength (MotifCode.java:56-137) given pre-aggregated
    inputs: ``graph_degrees_template`` must already have the instance
    triples' degree contributions subtracted (the Spark job in
    operators/mdl_ops.py does degrees-minus-join)."""
    dims = prefix(n) + prefix(m) + prefix(r)
    pbits = pattern_bits(pattern)
    template = edgelist_codelength(
        graph_degrees_template, Prior.COMPLETE_FAST if fast_py else Prior.COMPLETE
    )
    labels = matches_codelength_alt(var_hists, num_matches, pattern.num_vars, fast_py)
    return MotifScore(
        total=dims + pbits + template + labels,
        dimensions=dims,
        pattern=pbits,
        template=template,
        labels=labels,
    )
