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

from functools import lru_cache
from itertools import permutations

from motive_rdf_spark.patterns import Pattern

# safety valve: cells should collapse fast; this bounds the worst case
_MAX_LABELINGS = 50_000


def _refine(pattern: Pattern) -> tuple[dict[int, int], dict[int, int]]:
    """Two-sided color refinement. Returns (node_colors, pred_colors)
    over the *variables* as compact ints (constants color by their own
    value inside the signatures). Colors are renumbered to small ints
    each round by sorting the distinct signatures — signatures are
    label-invariant (built only from colors + constants), so the
    renumbering, and hence the final cell order, is isomorphism-
    invariant. Compact ints keep every comparison O(1); the previous
    fold-the-history form nested tuples exponentially deep and a
    single symmetric 9-edge pattern cost ~12 s to canonicalize."""
    node_vars = set(pattern.node_vars)
    pred_vars = set(pattern.pred_vars)

    def ncol(t):  # node term color
        return ("c", t) if t >= 0 else ("n", ncolors[t])

    def pcol(t):  # predicate term color
        return ("c", t) if t >= 0 else ("p", pcolors[t])

    def renumber(sigs: dict[int, tuple]) -> dict[int, int]:
        order = {s: i for i, s in enumerate(sorted(set(sigs.values())))}
        return {v: order[s] for v, s in sigs.items()}

    ncolors: dict[int, int] = {v: 0 for v in node_vars}
    pcolors: dict[int, int] = {v: 0 for v in pred_vars}
    cells = (1, 1)
    for _ in range(len(node_vars) + len(pred_vars) + 1):
        nsig = {
            v: (
                ncolors[v],
                tuple(sorted((pcol(p), ncol(o)) for s, p, o in pattern.edges if s == v)),
                tuple(sorted((pcol(p), ncol(s)) for s, p, o in pattern.edges if o == v)),
            )
            for v in node_vars
        }
        psig = {
            v: (
                pcolors[v],
                tuple(sorted((ncol(s), ncol(o)) for s, p, o in pattern.edges if p == v)),
            )
            for v in pred_vars
        }
        ncolors, pcolors = renumber(nsig), renumber(psig)
        new_cells = (len(set(ncolors.values())), len(set(pcolors.values())))
        if new_cells == cells:
            break  # refinement only ever splits: equal counts = stable
        cells = new_cells
    return ncolors, pcolors


def _cells(colors: dict[int, int]) -> list[list[int]]:
    """Group variables into cells of equal color, cells ordered by color."""
    by_color: dict[int, list[int]] = {}
    for v, c in colors.items():
        by_color.setdefault(c, []).append(v)
    return [sorted(vs) for _, vs in sorted(by_color.items())]


def _labelings(cells: list[list[int]], start: int) -> list[dict[int, int]]:
    """All variable relabelings consistent with the cell order: cell i's
    variables get the contiguous id block after cell i-1's. Above
    _MAX_LABELINGS (pathologically symmetric patterns that refinement
    cannot split) degrade to the single in-cell-order labeling: the
    result is still deterministic and still a valid member of the
    class, merely not guaranteed minimal — for the score memo that
    costs duplicate work on monsters, never a wrong answer."""
    total = 1
    for cell in cells:
        for i in range(2, len(cell) + 1):
            total *= i
        if total > _MAX_LABELINGS:
            break
    out: list[dict[int, int]] = [{}]
    nxt = start
    for cell in cells:
        ids = list(range(nxt, nxt - len(cell), -1))
        nxt -= len(cell)
        perms = [tuple(cell)] if total > _MAX_LABELINGS else permutations(cell)
        new_out = []
        for perm in perms:
            m = dict(zip(perm, ids))
            for base in out:
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
    combos = 0
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
            combos += 1
            if combos >= _MAX_LABELINGS:  # see _labelings docstring
                break
        if combos >= _MAX_LABELINGS:
            break
    assert best_pat is not None
    return best_pat


@lru_cache(maxsize=200_000)
def canonical_key(pattern: Pattern) -> tuple:
    """Hashable cache key (SimAnnealing's score-memo key). Memoized:
    the search loop canonicalizes every candidate including revisits,
    and Pattern is a frozen (hashable) dataclass."""
    return canonical_form(pattern).edges
