"""Joint scoring of motif *sets* — the multi-pattern MDL code of the
reference (MotifCode.pruneValues MotifCode.java:378-408 + the
multi-pattern codelength call sites SimAnnealingMulti.java:87-135,
GAMulti.java:98-201).

Semantics: patterns are processed in a fixed order with one shared
``seen`` triple set — an instance of pattern i is kept iff none of its
triples was claimed by any previously kept instance (of any pattern).
The joint codelength is dims + Σ pattern-structure bits + ONE template
term (graph degrees minus ALL kept instances' triples) + per-pattern
label codes.

Pattern order = canonical-form sort (SURVEY.md §4.4: the reference's
scores depend on list order; fixing order by canonical key makes joint
scores deterministic and comparable across engines).

Scale shape: per pattern one match job (bounded), prune over the
union of instance triples, then the same degree-subtraction joins as
the single-motif scorer — all DataFrame work; only histograms are
collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from motive_rdf_spark.canon import canonical_key
from motive_rdf_spark.functions.mdl import (
    matches_codelength_alt,
    pattern_bits,
    prefix,
)
from motive_rdf_spark.functions.mdl import edgelist_codelength, Prior
from motive_rdf_spark.operators import degrees as deg
from motive_rdf_spark.operators.bgp import find
from motive_rdf_spark.operators.mdl_ops import _hist_of, variable_freq_hists
from motive_rdf_spark.operators.prune import instance_triples_df, prune_matches
from motive_rdf_spark.patterns import Pattern


@dataclass
class MotifSetScore:
    total: float
    per_pattern_freq: list[int]


def sort_patterns(patterns: list[Pattern]) -> list[Pattern]:
    """Deterministic processing order: sort by canonical key."""
    return sorted(patterns, key=lambda p: canonical_key(p))


def prune_values(
    patterns: list[Pattern], matches_per_pattern: list[list[list[int]]]
) -> list[list[list[int]]]:
    """MotifCode.pruneValues: shared ``seen`` set across patterns in
    list order (driver-exact; match lists are pre-sorted canonically)."""
    seen: set = set()
    kept: list[list[list[int]]] = []
    for pat, matches in zip(patterns, matches_per_pattern):
        kept.append(prune_matches(pat, matches, seen=seen))
    return kept


def score_motif_set(
    triples: DataFrame,
    patterns: list[Pattern],
    max_matches: int = 100_000,
) -> MotifSetScore:
    """Joint codelength of a motif set vs the graph (driver-exact prune
    at fixture scale, as the reference's own tests use).

    Returns total bits and per-pattern kept-instance frequencies.
    """
    spark = triples.sparkSession
    patterns = sort_patterns(patterns)
    n, m, r = deg.graph_dims(triples)

    matches_per = []
    for pat in patterns:
        rows = [list(x) for x in find(triples, pat).limit(max_matches).collect()]
        rows.sort()
        matches_per.append(rows)
    kept_per = prune_values(patterns, matches_per)

    # one template term: degrees minus ALL kept instances' triples
    all_inst: list[tuple[int, int, int]] = []
    for pat, kept in zip(patterns, kept_per):
        all_inst.extend(pat.all_triples(kept))
    bits = prefix(n) + prefix(m) + prefix(r) + prefix(len(patterns))

    if all_inst:
        inst_df = spark.createDataFrame(all_inst, "s long, p long, o long")
    else:
        inst_df = spark.createDataFrame([], "s long, p long, o long")

    def tmpl_hist(graph_deg: DataFrame, key: str, inst_col: str, space: int):
        sub = inst_df.groupBy(F.col(inst_col).alias(key)).agg(F.count("*").alias("sub"))
        joined = graph_deg.join(sub, key, "full_outer").select(
            (F.coalesce(F.col("deg"), F.lit(0)) - F.coalesce(F.col("sub"), F.lit(0))).alias(
                "deg"
            )
        )
        h = _hist_of(joined, "deg")
        covered = sum(h.values())
        if space > covered:
            h[0] = h.get(0, 0) + (space - covered)
        return h

    template = [
        tmpl_hist(deg.in_degrees(triples), "node", "o", n),
        tmpl_hist(deg.out_degrees(triples), "node", "s", n),
        tmpl_hist(deg.rel_degrees(triples), "rel", "p", r),
    ]
    bits += edgelist_codelength(template, Prior.COMPLETE_FAST)

    freqs = []
    for pat, kept in zip(patterns, kept_per):
        bits += pattern_bits(pat)
        freqs.append(len(kept))
        if kept:
            cols = [f"v{i + 1}" for i in range(pat.num_vars)]
            kept_df = spark.createDataFrame(
                [tuple(x) for x in kept], ", ".join(f"{c} long" for c in cols)
            )
            var_h = variable_freq_hists(pat, kept_df, n, r)
            bits += matches_codelength_alt(var_h, len(kept), pat.num_vars, fast_py=True)
    return MotifSetScore(total=bits, per_pattern_freq=freqs)


def entropy_sorted(matches: DataFrame) -> DataFrame:
    """MotifCode.sort (MotifCode.java:447-490): order variable columns
    by DESCENDING value-entropy, then sort matches lexicographically in
    that column order (improves the downstream sequence coding).

    Per-column entropy via one groupBy per column (tiny aggregates);
    the sort is a single range-shuffle. Returns the sorted DataFrame
    with columns re-ordered [highest-entropy first].
    """
    import math

    ent = {}
    total = matches.count()
    if total == 0:
        return matches
    for c in matches.columns:
        rows = matches.groupBy(c).agg(F.count("*").alias("cnt")).collect()
        e = 0.0
        for row in rows:
            p = row["cnt"] / total
            e -= p * math.log2(p)
        ent[c] = e
    order = sorted(matches.columns, key=lambda c: (-ent[c], c))
    return matches.select(*order).orderBy(*order)
