"""Motif-SET search: simulated annealing over sets of patterns
(SimAnnealingMulti.java:62-648) and a generational GA
(GAMulti.java:203-299 + MultiParallel.java:66-121), re-expressed as
driver loops whose score evaluations are Spark job pipelines
(operators/motifset.score_motif_set).

SA-multi transitions: the seven single-pattern transitions applied to
a random member, plus ADD_PATTERN (a fresh random-triple pattern) and
RM_PATTERN (SimAnnealingMulti.java:204-215). Set size capped at
MAX_NUM_PATTERNS = 25 (SimAnnealingMulti.java:62-63).

GA: population of motif sets; crossover = shuffled union of the
parents' patterns cut to a child size in [min-1, max+1]
(GAMulti.java:230-261), then >= 1 random transition; each generation
is scored, sorted, and the best half survives (GAMulti.iterate,
GAMulti.java:282-299). Score/match caches are keyed by the canonical
keys of the member patterns (GAMulti.java:66-69).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from motive_rdf_spark.canon import canonical_key
from motive_rdf_spark.operators.mdl_ops import null_bits
from motive_rdf_spark.operators.motifset import score_motif_set, sort_patterns
from motive_rdf_spark.patterns import Pattern
from motive_rdf_spark.search import SAConfig, SimAnnealing

MAX_NUM_PATTERNS = 25  # SimAnnealingMulti.java:62


def set_key(patterns: list[Pattern]) -> tuple:
    return tuple(sorted(canonical_key(p) for p in patterns))


@dataclass
class MultiConfig:
    iterations: int = 50
    alpha: float = 0.5
    max_matches: int = 100_000
    max_patterns: int = MAX_NUM_PATTERNS
    driver_prune_threshold: int = 50_000
    seed: int | None = None


@dataclass
class MultiState:
    null_bits: float
    best: list[Pattern] = field(default_factory=list)
    best_score: float = float("inf")
    score_cache: dict[tuple, float] = field(default_factory=dict)


class _TransitionHelper(SimAnnealing):
    """Reuses SimAnnealing's transition machinery without running its
    own scoring pipeline at construction time."""

    def __init__(self, triples: DataFrame, cfg: SAConfig, rng: random.Random):
        self.cfg = cfg
        self.rng = rng
        self.triples = triples
        self._match_src = triples  # sampling via find() (see SimAnnealing)
        self._sample_cache = {}
        self._inc_cache = {}
        self._local = None  # multi-search samples via the Spark matcher
        # state/score intentionally not initialized: only transitions
        # (_t_*) and sampling helpers are used


class SimAnnealingMulti:
    """SA over motif sets with joint MDL scoring.

    ``triples`` may be a ``bgp.GraphStore`` to reuse pre-partitioned
    graph copies across every member-pattern match job."""

    def __init__(self, triples: DataFrame, config: MultiConfig | None = None):
        from motive_rdf_spark.operators.bgp import GraphStore

        self.cfg = config or MultiConfig()
        self.rng = random.Random(self.cfg.seed)
        self._src = triples
        self.triples = triples.plain if isinstance(triples, GraphStore) else triples
        self.helper = _TransitionHelper(
            self.triples,
            SAConfig(max_matches=self.cfg.max_matches, seed=self.cfg.seed),
            self.rng,
        )
        self.helper._match_src = self._src
        self.state = MultiState(null_bits=null_bits(self.triples))
        self.motifs: list[Pattern] = [self.helper._init_pattern()]
        self.score = self._score(self.motifs)

    def _score(self, patterns: list[Pattern]) -> float:
        key = set_key(patterns)
        st = self.state
        if key in st.score_cache:
            return st.score_cache[key]
        sc = score_motif_set(
            self._src,
            patterns,
            self.cfg.max_matches,
            driver_prune_threshold=self.cfg.driver_prune_threshold,
        ).total
        st.score_cache[key] = sc
        if sc < st.best_score:
            st.best_score = sc
            st.best = sort_patterns(patterns)
        return sc

    def _propose(self) -> list[Pattern] | None:
        ops = ["member"] * 7 + ["add", "rm"]
        op = self.rng.choice(ops)
        cand = list(self.motifs)
        if op == "add":
            if len(cand) >= self.cfg.max_patterns:
                return None
            cand.append(self.helper._init_pattern())
            return cand
        if op == "rm":
            if len(cand) < 2:
                return None
            cand.pop(self.rng.randrange(len(cand)))
            return cand
        i = self.rng.randrange(len(cand))
        from motive_rdf_spark.search import TRANSITIONS

        name = self.rng.choice(TRANSITIONS)
        new = getattr(self.helper, f"_t_{name}")(cand[i])
        if new is None or not new.valid() or not new.variables:
            return None
        cand[i] = new
        return cand

    def iterate(self) -> None:
        cand = self._propose()
        if cand is None:
            return
        sc = self._score(cand)
        if sc < self.score or self.rng.random() < self.cfg.alpha:
            self.motifs, self.score = cand, sc

    def run(self) -> MultiState:
        for _ in range(self.cfg.iterations):
            self.iterate()
        return self.state


@dataclass
class GAConfig:
    population: int = 20  # reference default 500 (Run.java:67); scaled for jobs
    generations: int = 5
    min_patterns: int = 1
    max_patterns: int = 5
    max_matches: int = 100_000
    driver_prune_threshold: int = 50_000
    seed: int | None = None
    # batch-score each generation: every uncached member pattern's
    # matcher runs in ONE unioned Spark job (SURVEY §2.10's mapping for
    # GAMulti.java:203-299), instead of one job per pattern per member
    batch_generations: bool = True


class GAMulti:
    """Generational GA over motif sets (GAMulti.java:203-299)."""

    def __init__(self, triples: DataFrame, config: GAConfig | None = None):
        from motive_rdf_spark.operators.bgp import GraphStore

        self.cfg = config or GAConfig()
        self.rng = random.Random(self.cfg.seed)
        self._src = triples
        self.triples = triples.plain if isinstance(triples, GraphStore) else triples
        self.helper = _TransitionHelper(
            self.triples,
            SAConfig(max_matches=self.cfg.max_matches, seed=self.cfg.seed),
            self.rng,
        )
        self.helper._match_src = self._src
        self.null = null_bits(self.triples)
        self.score_cache: dict[tuple, float] = {}
        self.population: list[list[Pattern]] = [
            [self.helper._init_pattern()] for _ in range(self.cfg.population)
        ]

    def _score(self, patterns: list[Pattern]) -> float:
        key = set_key(patterns)
        if key not in self.score_cache:
            self.score_cache[key] = score_motif_set(
                self._src,
                patterns,
                self.cfg.max_matches,
                driver_prune_threshold=self.cfg.driver_prune_threshold,
            ).total
        return self.score_cache[key]

    def _crossover(self, a: list[Pattern], b: list[Pattern]) -> list[Pattern]:
        pool = list(a) + list(b)
        self.rng.shuffle(pool)
        lo = max(self.cfg.min_patterns, min(len(a), len(b)) - 1)
        hi = min(self.cfg.max_patterns, max(len(a), len(b)) + 1)
        size = self.rng.randint(lo, max(lo, hi))
        child = pool[:size]
        # >= 1 random transition on a random member (GAMulti.java:257-261)
        from motive_rdf_spark.search import TRANSITIONS

        for _ in range(4):
            i = self.rng.randrange(len(child))
            new = getattr(self.helper, f"_t_{self.rng.choice(TRANSITIONS)}")(child[i])
            if new is not None and new.valid() and new.variables:
                child[i] = new
                break
        return child

    def _score_generation(self) -> None:
        """Fill the score cache for every uncached member set with ONE
        unioned match job across the generation's distinct patterns
        (motifset.batch_find). Members share patterns heavily after
        crossover, so canonical-key dedup makes the union far smaller
        than members × patterns."""
        from motive_rdf_spark.canon import canonical_form
        from motive_rdf_spark.operators.motifset import batch_find

        uncached = [m for m in self.population if set_key(m) not in self.score_cache]
        # batch over canonical FORMS: isomorphic member patterns share a
        # key but their v1..vk columns differ by a variable permutation,
        # so the shared match DF must correspond to one fixed labeling
        # (scores are labeling-invariant; the sets scored below are the
        # members' canonical forms)
        distinct: dict[tuple, Pattern] = {}
        for mset in uncached:
            for p in mset:
                if p.variables:
                    distinct.setdefault(canonical_key(p), canonical_form(p))
        if not distinct:
            return
        keys = list(distinct)
        dfs, counts, handle = batch_find(
            self._src, [distinct[k] for k in keys], self.cfg.max_matches
        )
        provider = dict(zip(keys, dfs))
        count_provider = dict(zip(keys, counts))
        try:
            for mset in uncached:
                if any(canonical_key(p) not in provider for p in mset):
                    continue  # scored individually by _score below
                self.score_cache[set_key(mset)] = score_motif_set(
                    self._src,
                    [canonical_form(p) for p in mset],
                    self.cfg.max_matches,
                    driver_prune_threshold=self.cfg.driver_prune_threshold,
                    matches_by_key=provider,
                    counts_by_key=count_provider,
                ).total
        finally:
            handle.unpersist()

    def iterate(self) -> None:
        if self.cfg.batch_generations:
            self._score_generation()
        scored = sorted(self.population, key=self._score)
        survivors = scored[: max(2, len(scored) // 2)]
        children = []
        while len(survivors) + len(children) < self.cfg.population:
            a, b = self.rng.sample(survivors, 2)
            children.append(self._crossover(a, b))
        self.population = survivors + children

    def run(self) -> tuple[list[Pattern], float]:
        for _ in range(self.cfg.generations):
            self.iterate()
        best = min(self.population, key=self._score)
        return sort_patterns(best), self._score(best)
