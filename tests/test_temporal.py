"""As-of join and bucketed range join: equivalence with the naive
formulations, boundary semantics, and parallelism invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from motive_rdf_spark.operators.temporal import asof_join, range_join_count


def _probe(spark):
    # (key, ts, pid) — includes a key with no build rows (k=3) and ties
    rows = [
        (1, 100, 0), (1, 250, 1), (1, 50, 2),
        (2, 100, 3), (2, 101, 4),
        (3, 500, 5),
    ]
    return spark.createDataFrame(rows, "k long, t long, pid long").withColumn(
        "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
    )


def _build(spark):
    rows = [
        (1, 100, 10), (1, 200, 11), (1, 60, 12),
        (2, 99, 13), (2, 101, 14),
        (4, 1, 15),
    ]
    return spark.createDataFrame(rows, "k long, t long, bid long").withColumn(
        "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
    )


def test_asof_matches_naive_join(spark):
    probe, build = _probe(spark), _build(spark)
    got = {
        r["pid"]: r["asof_bid"]
        for r in asof_join(probe, build, "k", "t", ["bid"]).collect()
    }
    # naive: join on key + b.t <= p.t, keep max-t build row per probe
    j = probe.join(build.withColumnRenamed("k", "bk").withColumnRenamed("t", "bt"),
                   (F.col("k") == F.col("bk")) & (F.col("bt") <= F.col("t")), "left")
    w = Window.partitionBy("pid").orderBy(F.desc_nulls_last("bt"))
    naive = {
        r["pid"]: r["bid"]
        for r in j.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    assert got == naive
    # boundary: probe at t=100 takes the build row AT 100 (inclusive)
    assert got[0] == 10
    # no preceding build row -> null
    assert got[2] is None and got[5] is None


def test_asof_probe_columns_pass_through(spark):
    out = asof_join(_probe(spark), _build(spark), "k", "t", ["bid", "t"])
    assert set(out.columns) == {"k", "t", "pid", "asof_bid", "asof_t"}
    assert out.count() == 6


def test_range_join_count_matches_naive(spark):
    probe, build = _probe(spark), _build(spark)
    got = {
        r["pid"]: r["n"]
        for r in range_join_count(probe, build, "k", "t", 100, "n").collect()
    }
    # naive theta join: [t - 100s, t)
    pb = probe.select("pid", F.col("k").alias("pk"), F.unix_micros("t").alias("pt"))
    bb = build.select(F.col("k").alias("bk"), F.unix_micros("t").alias("bt"))
    naive_df = pb.join(
        bb,
        (F.col("pk") == F.col("bk"))
        & (F.col("bt") >= F.col("pt") - 100_000_000)
        & (F.col("bt") < F.col("pt")),
        "left",
    ).groupBy("pid").agg(F.count("bt").alias("n"))
    naive = {r["pid"]: r["n"] for r in naive_df.collect()}
    assert got == naive
    # probe t=100: build rows in [0, 100) for k=1 -> t=60 only
    assert got[2] == 0 and got[0] == 1
    # exclusive upper bound: build at exactly probe.t does not count
    assert got[4] == 1  # k=2, t=101: build 99 in [1,101), build 101 excluded


@pytest.mark.parametrize("parts", [1, 7])
def test_temporal_parallelism_invariant(spark, parts):
    probe = _probe(spark).repartition(parts)
    build = _build(spark).repartition(parts)
    a = sorted(tuple(r) for r in asof_join(probe, build, "k", "t", ["bid"]).collect())
    b = sorted(tuple(r) for r in range_join_count(probe, build, "k", "t", 100).collect())
    a1 = sorted(tuple(r) for r in asof_join(_probe(spark), _build(spark), "k", "t", ["bid"]).collect())
    b1 = sorted(tuple(r) for r in range_join_count(_probe(spark), _build(spark), "k", "t", 100).collect())
    assert a == a1 and b == b1


def test_asof_single_shuffle_no_join(spark):
    plan = asof_join(_probe(spark), _build(spark), "k", "t", ["bid"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window form, never a join


def test_asof_hypothesis_vs_pandas_merge_asof(spark):
    """Differential: asof_join vs pandas.merge_asof (an independent
    implementation; direction='backward', allow_exact_matches=True is
    the same inclusive <= contract) over randomized key/ts frames."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # ts (seconds)
    )

    @settings(max_examples=15, deadline=None)
    @given(
        probe=st.lists(row, min_size=1, max_size=12),
        build=st.lists(row, min_size=0, max_size=12),
    )
    def run(probe, build):
        pdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(probe)], columns=["k", "t", "pid"]
        )
        bdf = pd.DataFrame(
            [(k, t, 100 + i) for i, (k, t) in enumerate(build)],
            columns=["k", "t", "bid"],
        )
        # pandas merge_asof requires sorted ts and breaks ties by taking
        # the LAST build row at equal (key, ts); our window does the
        # same (last over ts-then-tag order). Dedupe build on (k, t)
        # keeping max bid to make the tie rule explicit on both sides.
        bdf = (
            bdf.sort_values(["t", "bid"])
            .groupby(["k", "t"], as_index=False)
            .last()
            .astype({"k": "int64", "t": "int64", "bid": "int64"})
        )
        sp = spark.createDataFrame(pdf, "k long, t long, pid long").withColumn(
            "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
        )
        sb = spark.createDataFrame(bdf[["k", "t", "bid"]], "k long, t long, bid long").withColumn(
            "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
        )
        got = {
            r["pid"]: r["asof_bid"]
            for r in asof_join(sp, sb, "k", "t", ["bid"]).collect()
        }
        want_df = pd.merge_asof(
            pdf.sort_values("t"),
            bdf.sort_values("t"),
            on="t",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.pid): (None if pd.isna(r.bid) else int(r.bid))
            for r in want_df.itertuples()
        }
        assert got == want

    run()


def test_interval_overlap_matches_naive(spark):
    from motive_rdf_spark.operators.temporal import interval_overlap_count

    def iv(rows):
        df = spark.createDataFrame(rows, "k long, s long, e long, rid long")
        return df.select(
            "k", "rid",
            F.timestamp_micros((F.col("s") * 1_000_000).cast("long")).alias("s"),
            F.timestamp_micros((F.col("e") * 1_000_000).cast("long")).alias("e"),
        )

    left = iv([(1, 0, 100, 0), (1, 100, 200, 1), (1, 50, 150, 2), (2, 0, 10, 3), (3, 5, 6, 4)])
    right = iv([(1, 90, 110, 10), (1, 199, 300, 11), (2, 10, 20, 12), (1, 0, 1000, 13)])
    got = {
        r["rid"]: r["n_overlap"]
        for r in interval_overlap_count(left, right, "k", "s", "e", 60).collect()
    }
    # naive theta join
    lp = left.selectExpr("k lk", "rid", "unix_micros(s) ls", "unix_micros(e) le")
    rp = right.selectExpr("k rk", "unix_micros(s) rs", "unix_micros(e) re")
    naive_df = lp.join(
        rp,
        (F.col("lk") == F.col("rk")) & (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")),
        "left",
    ).groupBy("rid").agg(F.count("rs").alias("n"))
    naive = {r["rid"]: r["n"] for r in naive_df.collect()}
    assert got == naive
    # half-open: [0,100) does not overlap [100,?); [100,200) meets [90,110) and [199,300)
    assert got[0] == 2 and got[1] == 3 and got[3] == 0
    # long interval (13) spans many buckets and still counts once per pair
    assert got[2] == 2


def test_interval_overlap_bucket_size_invariant(spark):
    from motive_rdf_spark.operators.temporal import interval_overlap_count

    def iv(rows):
        df = spark.createDataFrame(rows, "k long, s long, e long, rid long")
        return df.select(
            "k", "rid",
            F.timestamp_micros((F.col("s") * 1_000_000).cast("long")).alias("s"),
            F.timestamp_micros((F.col("e") * 1_000_000).cast("long")).alias("e"),
        )

    left = iv([(1, i * 7, i * 7 + 15, i) for i in range(30)])
    right = iv([(1, i * 11, i * 11 + 4, 100 + i) for i in range(20)])
    a = sorted(
        tuple(r)
        for r in interval_overlap_count(left, right, "k", "s", "e", 5).collect()
    )
    b = sorted(
        tuple(r)
        for r in interval_overlap_count(left, right, "k", "s", "e", 97).collect()
    )
    assert a == b


def test_asof_null_build_field_not_mixed(spark):
    """ADVICE r4: a NULL field in the latest build row must stay NULL —
    not fall back to an older build row's value for that column only.
    All attached columns come from the same (latest) build row."""
    probe = spark.createDataFrame([(1, 150, 0)], "k long, t long, pid long")
    build = spark.createDataFrame(
        [(1, 50, 9, 7), (1, 100, 1, None)], "k long, t long, a long, b long"
    )
    row = asof_join(probe, build, "k", "t", ["a", "b"]).collect()[0]
    assert row["asof_a"] == 1
    assert row["asof_b"] is None  # latest row's genuine NULL, not 7


def test_asof_hot_key_salting_identical_output(spark):
    """VERDICT r4 item 3: one key holding ~90% of rows, salted windows
    must reproduce the unsalted answer exactly."""
    import random

    rng = random.Random(5)
    probe_rows = [(1, rng.randrange(0, 100_000), i) for i in range(900)]
    probe_rows += [(k, rng.randrange(0, 100_000), 900 + i) for i, k in enumerate(rng.choices(range(2, 30), k=100))]
    build_rows = [(1, rng.randrange(0, 100_000), 10_000 + i) for i in range(900)]
    build_rows += [(k, rng.randrange(0, 100_000), 20_000 + i) for i, k in enumerate(rng.choices(range(2, 30), k=100))]
    # dedupe build on (k, t): equal-(key, ts) build winners are
    # unspecified, and salted vs unsalted may break such ties differently
    seen = set()
    build_rows = [r for r in build_rows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    probe = spark.createDataFrame(probe_rows, "k long, t long, pid long").withColumn(
        "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
    )
    build = spark.createDataFrame(build_rows, "k long, t long, bid long").withColumn(
        "t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
    )
    plain = asof_join(probe, build, "k", "t", ["bid"])
    salted = asof_join(probe, build, "k", "t", ["bid"], hot_key_threshold=100, n_salt_buckets=16)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the guard is real: the salted window partitions on the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__asof_salt" in plan


def test_range_join_duplicate_probe_rows_each_kept(spark):
    """VERDICT r4 item 9: N identical probe rows yield N output rows,
    each with the true count — not one collapsed row."""
    probe = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 100)], "k long, t long"
    ).withColumn("t", F.timestamp_micros((F.col("t") * 1_000_000).cast("long")))
    build = _build(spark)
    out = range_join_count(probe, build, "k", "t", 100, "n").collect()
    assert len(out) == 3
    assert all(r["n"] == 1 for r in out)  # k=1 build rows in [0,100): t=60


def test_interval_overlap_duplicates_and_no_mid(spark):
    """VERDICT r4 item 5 / ADVICE r4: no monotonically_increasing_id
    anywhere in the plan (double-evaluation hazard), duplicate rows on
    both sides counted per row, and a shuffle between construction and
    action does not corrupt the join-back."""
    from motive_rdf_spark.operators.temporal import interval_overlap_count

    def iv(rows):
        df = spark.createDataFrame(rows, "k long, s long, e long, rid long")
        return df.select(
            "k", "rid",
            F.timestamp_micros((F.col("s") * 1_000_000).cast("long")).alias("s"),
            F.timestamp_micros((F.col("e") * 1_000_000).cast("long")).alias("e"),
        )

    # rid duplicates too: fully identical left rows
    left = iv([(1, 0, 100, 0), (1, 0, 100, 0), (2, 5, 6, 1)]).repartition(7)
    right = iv([(1, 50, 60, 10), (1, 50, 60, 10), (1, 90, 200, 11)]).repartition(3)
    out = interval_overlap_count(left, right, "k", "s", "e", 30)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "monotonically" not in plan.lower()
    rows = sorted((r["rid"], r["n_overlap"]) for r in out.collect())
    # each duplicate left row keeps its own output row; the duplicated
    # right interval counts twice
    assert rows == [(0, 3), (0, 3), (1, 0)]
