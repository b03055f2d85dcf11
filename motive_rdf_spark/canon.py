"""Canonical forms for BGP patterns — the engine's analog of the
reference's Nauty canonicalization (Nauty.java:50-132: equitable
refinement of node/tag cells + individualization search).

Purpose (SURVEY.md §7.3 item 6): a *consistent* canonical form applied
to both sides of any motif comparison — byte-parity with the
reference's string form is not required for P/R, only stability under
variable relabeling. Used for:

- the search driver's score cache (SimAnnealing.java:103,166-178 keys
  its memo by canonical pattern);
- deduplicating isomorphic motifs in top-k reporting;
- comparing induced motif sets across engines.

Driver-side pure Python: patterns have ≤10 edges (MAX_PATTERN_SIZE,
SimAnnealing.java:58), so the individualization search over refinement
cells is trivial. Node variables and predicate variables are refined
as two separate partitions that shatter each other (the reference's
two-sided refinement, Nauty.java:181-388); constants are fixed points.
"""

from __future__ import annotations

from itertools import permutations

from motive_rdf_spark.patterns import Pattern

# safety valve: cells should collapse fast; this bounds the worst case
_MAX_LABELINGS = 50_000


def _refine(pattern: Pattern) -> tuple[dict[int, tuple], dict[int, tuple]]:
    """Two-sided color refinement. Returns (node_colors, pred_colors)
    over the *variables* (constants color by their own value)."""
    node_vars = set(pattern.node_vars)
    pred_vars = set(pattern.pred_vars)

    def ncol(t):  # node term color
        return ("c", t) if t >= 0 else ncolors[t]

    def pcol(t):  # predicate term color
        return ("c", t) if t >= 0 else pcolors[t]

    ncolors: dict[int, tuple] = {v: ("v",) for v in node_vars}
    pcolors: dict[int, tuple] = {v: ("v",) for v in pred_vars}
    for _ in range(len(node_vars) + len(pred_vars) + 1):
        new_n: dict[int, tuple] = {}
        for v in node_vars:
            sig_out = sorted(((pcol(p), ncol(o)) for s, p, o in pattern.edges if s == v), key=repr)
            sig_in = sorted(((pcol(p), ncol(s)) for s, p, o in pattern.edges if o == v), key=repr)
            new_n[v] = (tuple(sig_out), tuple(sig_in))
        new_p: dict[int, tuple] = {}
        for v in pred_vars:
            sig = sorted(((ncol(s), ncol(o)) for s, p, o in pattern.edges if p == v), key=repr)
            new_p[v] = tuple(sig)
        if new_n == {v: ncolors[v] for v in node_vars} and new_p == {
            v: pcolors[v] for v in pred_vars
        }:
            break
        # fold new signatures into the running colors (stable refinement)
        ncolors = {v: (ncolors[v], new_n[v]) for v in node_vars}
        pcolors = {v: (pcolors[v], new_p[v]) for v in pred_vars}
    return ncolors, pcolors


def _cells(colors: dict[int, tuple]) -> list[list[int]]:
    """Group variables into cells of equal color, cells ordered by color."""
    by_color: dict[tuple, list[int]] = {}
    for v, c in colors.items():
        by_color.setdefault(c, []).append(v)
    return [sorted(vs) for _, vs in sorted(by_color.items(), key=lambda kv: repr(kv[0]))]


def _labelings(cells: list[list[int]], start: int) -> list[dict[int, int]]:
    """All variable relabelings consistent with the cell order: cell i's
    variables get the contiguous id block after cell i-1's."""
    out: list[dict[int, int]] = [{}]
    nxt = start
    for cell in cells:
        ids = list(range(nxt, nxt - len(cell), -1))
        nxt -= len(cell)
        new_out = []
        for perm in permutations(cell):
            m = dict(zip(perm, ids))
            for base in out:
                if len(new_out) > _MAX_LABELINGS:
                    raise RuntimeError("labeling explosion; pattern too symmetric")
                new_out.append({**base, **m})
        out = new_out
    return out


def canonical_form(pattern: Pattern) -> Pattern:
    """The canonical representative of ``pattern``'s isomorphism class
    (same edge set under variable renaming). Deterministic; invariant
    under any valid relabeling of the input (tests assert this)."""
    ncolors, pcolors = _refine(pattern)
    ncells = _cells(ncolors)
    k = len(pattern.node_vars)
    pcells = _cells(pcolors)

    best: tuple | None = None
    best_pat: Pattern | None = None
    for nmap in _labelings(ncells, -1):
        for pmap in _labelings(pcells, -k - 1):
            edges = sorted(
                (
                    nmap.get(s, s) if s < 0 else s,
                    pmap.get(p, p) if p < 0 else p,
                    nmap.get(o, o) if o < 0 else o,
                )
                for s, p, o in pattern.edges
            )
            key = tuple(edges)
            if best is None or key < best:
                best = key
                best_pat = Pattern(edges)
    assert best_pat is not None
    return best_pat


def canonical_key(pattern: Pattern) -> tuple:
    """Hashable cache key (SimAnnealing's score-memo key)."""
    return canonical_form(pattern).edges
