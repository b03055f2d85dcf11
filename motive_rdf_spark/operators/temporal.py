"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join, expressed as compositions of existing DataFrame ops (no
UDFs, no per-row Python).

As-of join (``asof_join``): for each probe row, the single build row
with the greatest timestamp <= the probe's timestamp within the same
key — the point-in-time lookup every event pipeline needs (latest
price before a trade, last click before an error). Spark has no ASOF
join; the naive formulation (join on key + ts <= ts, then max-window)
explodes to all preceding pairs per probe row. This implementation is
the union+window form: ONE shuffle, ZERO joins —

    union(build tagged 0, probe tagged 1)
    window partitionBy(key) orderBy(ts, tag)
    last(build columns, ignoreNulls) over unboundedPreceding..current
    filter tag = 1

Each probe row reads the latest preceding build row in a single
sorted pass per key; equal timestamps resolve build-before-probe
(tag 0 < 1), giving inclusive (<=) semantics. Scale: the shuffle is
hash(key); a hot key serializes its own rows through one window task
(same bound as any per-key ordered scan — pre-split hot keys by a
time-range salt upstream if one key dominates; the carried state is
one row, so the merge is trivial).

Range join (``range_join_count``): count build rows with timestamp in
[probe.ts - window, probe.ts) per key. The naive join predicate
(key equality + BETWEEN) degenerates to a per-key cross product that
Spark executes as a broadcast-nested-loop at worst. Bucketing fixes
it: quantize both sides to window-sized buckets, join on
(key, bucket) with the probe exploded to its two candidate buckets
(a range of width W overlaps at most 2 W-buckets), then apply the
exact range filter. Cost is the equi-join cost — shuffle on
(key, bucket) — never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    build_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every probe row, attach the build row with the greatest
    ``ts`` <= probe's ``ts`` in the same ``key`` group (null columns
    when no build row precedes). Probe columns pass through; each
    requested build column arrives as ``prefix + name``.

    ``probe`` and ``build`` may share column names — only ``key`` and
    ``ts`` need to exist in both.

    Determinism note: if SEVERAL build rows share one (key, ts), which
    of them wins is unspecified (the window orders by (ts, tag) only)
    — dedupe the build side on (key, ts) upstream when that matters;
    the pandas-differential test does exactly that.
    """
    pcols = probe.columns
    tagged_build = build.select(
        F.col(key), F.col(ts),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{prefix}{c}") for c in build_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in pcols if c not in (key, ts)],
    )
    tagged_probe = probe.select(
        F.col(key), F.col(ts),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"{prefix}{c}") for c in build_cols],
        *[F.col(c) for c in pcols if c not in (key, ts)],
    )
    u = tagged_build.unionByName(tagged_probe)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in pcols],
        F.col("_tag"),
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in build_cols
        ],
    )
    return filled.filter(F.col("_tag") == 1).drop("_tag")


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    window_sec: int,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Per probe row: how many build rows share ``key`` and fall in
    ``[probe.ts - window_sec, probe.ts)``. Probe columns pass through
    plus ``count_col`` (0 when none). Bucketed equi-join — see module
    doc; never a theta-join."""
    # cast covers TIMESTAMP_NTZ inputs (exact under the session's UTC tz)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    wus = window_sec * 1_000_000
    b = build.select(
        F.col(key).alias("_bk"),
        F.floor(us / wus).alias("_bucket"),
        us.alias("_bts"),
    )
    p = probe.withColumn("_pts", us).withColumn(
        "_bucket", F.explode(F.array(F.floor(us / wus) - 1, F.floor(us / wus)))
    )
    joined = p.join(
        b,
        (p["_bucket"] == b["_bucket"])
        & (p[key] == b["_bk"])
        & (b["_bts"] >= p["_pts"] - wus)
        & (b["_bts"] < p["_pts"]),
        "left",
    )
    return (
        joined.groupBy(*[probe[c] for c in probe.columns])
        .agg(F.count("_bts").alias(count_col))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (contract entries)
# ---------------------------------------------------------------------------


def asof_clicks_before_errors_sql() -> str:
    """Oracle for the contract query: DuckDB's native ASOF LEFT JOIN
    over the same filtered event streams."""
    return """
SELECT e.event_id, e.user_id,
       c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def range_clicks_before_errors_sql(window_sec: int) -> str:
    """Oracle: plain BETWEEN range join (exact, fine at oracle scale)."""
    return f"""
SELECT e.event_id, e.user_id, COUNT(c.ts) AS n_in_range
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND epoch_us(c.ts) >= epoch_us(e.ts) - {window_sec * 1_000_000}
 AND epoch_us(c.ts) <  epoch_us(e.ts)
GROUP BY e.event_id, e.user_id
"""


def interval_overlap_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    start: str,
    end: str,
    bucket_sec: int,
    count_col: str = "n_overlap",
) -> DataFrame:
    """Interval × interval overlap join: per left row, how many right
    rows share ``key`` and overlap its [start, end) — half-open
    semantics, touching endpoints do NOT overlap. Left columns pass
    through plus ``count_col`` (0 when none; self-comparisons are the
    caller's concern — pass disjoint frames or filter afterwards).

    Bucketing generalizes ``range_join_count`` to two interval sides:
    each interval explodes to every ``bucket_sec``-quantum it covers,
    the join is equi on (key, bucket), candidate pairs collapse with a
    distinct on (left id, right id) — an overlapping pair meets in
    every shared quantum — and the exact predicate (ls < re AND
    rs < le) filters. Pick ``bucket_sec`` near the typical interval
    length: an interval spans ~len/bucket_sec + 1 quanta, so the
    fan-out is a small constant and the join stays an equi-join —
    never the theta join Spark would run as a nested loop at scale."""

    def us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    wus = bucket_sec * 1_000_000
    lid = "__lid"
    # monotonically_increasing_id is deterministic GIVEN the input
    # partitioning (partitionId << 33 | row index), so the two
    # consumers of l_tagged (the bucketed explode and the final
    # count join) see identical ids without a persist
    l_tagged = left.withColumn(lid, F.monotonically_increasing_id())
    lb = l_tagged.select(
        F.col(lid),
        F.col(key).alias("_k"),
        us(start).alias("_ls"),
        us(end).alias("_le"),
        F.explode(
            F.sequence(F.floor(us(start) / wus), F.floor((us(end) - 1) / wus))
        ).alias("_bucket"),
    )
    rid = "__rid"
    rb = right.withColumn(rid, F.monotonically_increasing_id()).select(
        F.col(rid),
        F.col(key).alias("_k"),
        us(start).alias("_rs"),
        us(end).alias("_re"),
        F.explode(
            F.sequence(F.floor(us(start) / wus), F.floor((us(end) - 1) / wus))
        ).alias("_bucket"),
    )
    pairs = (
        lb.join(rb, ["_k", "_bucket"])
        .filter((F.col("_ls") < F.col("_re")) & (F.col("_rs") < F.col("_le")))
        .select(lid, rid)
        .distinct()
    )
    counts = pairs.groupBy(lid).agg(F.count("*").alias(count_col))
    out = (
        l_tagged.join(counts, lid, "left")
        .select(*left.columns, F.coalesce(count_col, F.lit(0)).cast("long").alias(count_col))
    )
    return out
