"""GraphStore memory-policy measurement (VERDICT r3 item 6).

Builds the same 69M-triple graph as tools/scaling_bench.py's bgp
workload, materializes GraphStore under both policies, and records:

- persisted footprint (memory + disk bytes, SparkContext
  getRDDStorageInfo — what the UI Storage tab shows);
- query parity + wall time for a degree scan (reads .plain) and the
  triangle match (reads the partitioned copies), proving the
  keep_plain=False mode serves both query classes.

Prints one JSON line per policy; numbers land in BENCH/BASELINE.md
"GraphStore storage" section.

Run: python tools/storage_probe.py [--cpus 16] [--rows 60000000]
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
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--m", type=int, default=60_000_000)
    ap.add_argument("--n", type=int, default=12_000_000)
    ap.add_argument("--k", type=int, default=3_000_000)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from motive_rdf_spark.data.generators import planted_graph
    from motive_rdf_spark.operators import degrees as deg
    from motive_rdf_spark.operators.bgp import (
        GraphStore,
        find,
        prepare_triples,
        storage_bytes,
    )
    from motive_rdf_spark.patterns import Pattern
    from motive_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="storage-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=str(args.cpus * 2),
    )
    spark.sparkContext.setLogLevel("ERROR")

    pat_edges = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
    # raw (un-prepared) input: GraphStore only persists the plain copy
    # when IT derives the prepared plan, which is the production path
    g = planted_graph(
        spark, n=args.n, m=args.m, r=20, pattern_edges=pat_edges, k=args.k
    )
    pat = Pattern(pat_edges)

    def best2(fn):
        best, n = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            n = fn()
            best = min(best, time.time() - t0)
        return best, n

    out = []
    for keep_plain in (True, False):
        store = GraphStore(g, keep_plain=keep_plain)
        t0 = time.time()
        n_triples = store.plain.count()
        store.by_s.count(), store.by_o.count()
        build_s = time.time() - t0
        mem, disk = storage_bytes(spark)

        deg_s, n_deg = best2(lambda: deg.in_degrees(store.plain).count())
        match_s, n_match = best2(lambda: find(store, pat).count())

        store.unpersist()
        rec = {
            "keep_plain": keep_plain,
            "triples": n_triples,
            "storage_mem_bytes": mem,
            "storage_disk_bytes": disk,
            "storage_gib": round((mem + disk) / 2**30, 2),
            "materialize_s": round(build_s, 1),
            "degree_scan_s": round(deg_s, 2),
            "degree_rows": n_deg,
            "triangle_match_s": round(match_s, 2),
            "triangle_matches": n_match,
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)

    # parity: both policies must answer both query classes identically
    assert out[0]["degree_rows"] == out[1]["degree_rows"]
    assert out[0]["triangle_matches"] == out[1]["triangle_matches"]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
