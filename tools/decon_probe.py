"""Benchmark-decontamination variants at sf1.0 (VERDICT r3 item 8).

The broadcast semi-join path is the production default (benchmark
shingles broadcast, zero corpus shuffle); ``broadcast_benchmark=False``
is the inverted-index fallback a multi-GB eval suite would take. The
fallback was correctness-tested but never measured. This probe runs
both variants over the synthetic sf1.0 documents table (tools/
make_sf.py output, 10x the bench corpus), asserts identical output,
and prints one JSON line per variant (best-of-2). Numbers land in
BENCH/BASELINE.md's data-size table.

Run: python tools/decon_probe.py [--src /tmp/spark_graft_sf1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/spark_graft_sf1.0")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if not os.path.exists(f"{args.src}/documents.parquet"):
        print(f"missing {args.src}; run tools/make_sf.py first", file=sys.stderr)
        return 2

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from motive_rdf_spark.operators.dedup import decontaminate
    from motive_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="decon-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=str(args.cpus * 2),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.src}/documents.parquet").persist()
    n_docs = docs.count()
    bench = docs.filter(F.col("doc_id") % 20 == 0)

    sums = {}
    for broadcast in (True, False):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            res = decontaminate(docs, bench, n=5, broadcast_benchmark=broadcast)
            agg = res.agg(
                F.count("*").alias("rows"), F.sum("contaminated").alias("flagged")
            ).collect()[0]
            best = min(best, time.time() - t0)
        sums[broadcast] = (int(agg["rows"]), int(agg["flagged"]))
        print(
            json.dumps(
                {
                    "variant": "broadcast" if broadcast else "inverted-index",
                    "docs": n_docs,
                    "rows": int(agg["rows"]),
                    "flagged": int(agg["flagged"]),
                    "seconds": round(best, 2),
                }
            ),
            flush=True,
        )
    assert sums[True] == sums[False], sums  # identical output both paths
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
