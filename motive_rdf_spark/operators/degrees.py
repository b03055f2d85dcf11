"""Degree-sequence aggregations — the sufficient statistic of the
edge-list null model (KGraph.degrees, reference KGraph.java:1455-1476).

The reference materializes three dense int vectors on the heap. Here
degrees stay DataFrames (sparse: zero-degree ids are absent) and are
only densified/collected by the driver-side MDL math, which needs just
the nonzero counts plus the id-space sizes — zeros contribute
``log2(0!) = 0`` to every codelength sum, so a 100 TB graph never ships
a dense vector anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def in_degrees(triples: DataFrame) -> DataFrame:
    """Per-node in-degree: groupBy(o).count() (KGraph.java:1455-1476)."""
    return triples.groupBy(F.col("o").alias("node")).agg(F.count("*").alias("deg"))


def out_degrees(triples: DataFrame) -> DataFrame:
    return triples.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("deg"))


def rel_degrees(triples: DataFrame) -> DataFrame:
    """Usage count per relation."""
    return triples.groupBy(F.col("p").alias("rel")).agg(F.count("*").alias("deg"))


def graph_dims(triples: DataFrame) -> tuple[int, int, int]:
    """(n, m, r): node-id-space size, triple count, relation-id-space size.

    Ids are dense (dictionary-encoded, KGraph.java:1222-1317), so the
    space size is max(id)+1 — one aggregate job.
    """
    row = triples.agg(
        F.greatest(F.max("s"), F.max("o")).alias("maxn"),
        F.count("*").alias("m"),
        F.max("p").alias("maxr"),
    ).collect()[0]
    return int(row["maxn"]) + 1, int(row["m"]), int(row["maxr"]) + 1


def degree_histogram(deg_df: DataFrame, id_space: int) -> dict[int, int]:
    """Collect the histogram {degree -> #ids with that degree}, adding the
    implicit zeros. Tiny (distinct degree values ≪ n) — safe to collect
    at any scale."""
    rows = deg_df.groupBy("deg").agg(F.count("*").alias("cnt")).collect()
    hist = {int(r["deg"]): int(r["cnt"]) for r in rows}
    covered = sum(hist.values())
    if id_space > covered:
        hist[0] = hist.get(0, 0) + (id_space - covered)
    return hist


def degree_histograms(triples: DataFrame, n: int, r: int) -> list[dict[int, int]]:
    """[in, out, rel] degree histograms — the collected form consumed by
    the MDL coders (functions/mdl.py)."""
    return [
        degree_histogram(in_degrees(triples), n),
        degree_histogram(out_degrees(triples), n),
        degree_histogram(rel_degrees(triples), r),
    ]
