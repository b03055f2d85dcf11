"""As-of join hot-key guard probe: one key holding 90% of both sides
(the skew shape the north_rule's salting requirement targets) —
unsalted per-key window vs the time-range salt guard
(``hot_key_threshold``), interleaved best-of, identical results
asserted once via checksum.

Usage: python tools/asof_probe.py [rows]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")

    from pyspark.sql import functions as F

    from motive_rdf_spark.operators.temporal import asof_join
    from motive_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="asof-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus) * 2, 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def skewed(n: int, salt: int):
        # 90% of rows on key 0, the rest uniform over 10k keys;
        # timestamps uniform over ~28 hours of microseconds
        df = spark.range(n).select(
            F.when(F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(10)) < 9, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(10_000)))
            .alias("k"),
            F.timestamp_micros(
                F.pmod(F.xxhash64("id", F.lit(salt + 2)), F.lit(100_000_000_000))
            ).alias("t"),
            F.col("id").alias("rid"),
        )
        return df.persist()

    probe, build = skewed(rows, 1), skewed(rows // 5, 7)
    # dedupe build on (k, t): equal-ts winners are unspecified and may
    # differ between the two plans — irrelevant to the timing question
    build = build.dropDuplicates(["k", "t"]).persist()
    probe.count(), build.count()

    variants = {
        "unsalted": lambda: asof_join(probe, build, "k", "t", ["rid"]),
        "salted": lambda: asof_join(
            probe, build, "k", "t", ["rid"],
            hot_key_threshold=200_000, n_salt_buckets=int(cpus) * 4,
        ),
    }
    # equality once (checksum over the attached build ids)
    sums = {
        name: fn().agg(F.sum("asof_rid"), F.count("*")).collect()[0]
        for name, fn in variants.items()
    }
    print("checksums:", {k: tuple(v) for k, v in sums.items()})
    assert sums["unsalted"][0] == sums["salted"][0], "salting changed the answer"

    best: dict[str, float] = {}
    for rnd in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            # aggregate over the ATTACHED column: a bare count() lets
            # Catalyst prune the window projection away entirely
            fn().agg(F.sum("asof_rid")).collect()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"round{rnd} {name}: {dt:.2f}s")
    for name, dt in best.items():
        print(f"BEST {name}: {dt:.2f}s")
    print(f"speedup: {best['unsalted'] / best['salted']:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
