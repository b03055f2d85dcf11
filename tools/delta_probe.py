"""Measure incremental support maintenance vs full re-match: the
TPC-H KG at sf0.1 as the accumulated graph, a ~1% planted-triangle
append as the snapshot delta.

Usage: python tools/delta_probe.py [k_instances]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from motive_rdf_spark import kg_tpch
    from motive_rdf_spark.data.generators import plant_instances
    from motive_rdf_spark.operators.bgp import find_count
    from motive_rdf_spark.operators.delta import delta_support
    from motive_rdf_spark.patterns import Pattern
    from motive_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="delta-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus) * 2, 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    old = kg_tpch.prepared_triples(spark, "/root/testdata/sf0.1")
    n_old = old.count()
    max_id = old.selectExpr("greatest(max(s), max(o)) g").collect()[0]["g"]
    pat_edges = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
    pat = Pattern(pat_edges)
    delta = (
        plant_instances(spark, pat_edges, k, node_offset=int(max_id) + 1, num_relations=5)
        .drop("instance_id")
        .persist()
    )
    n_delta = delta.count()
    union = old.select("s", "p", "o").unionAll(delta)

    for label, fn in (
        ("full_rematch", lambda: find_count(union, pat)),
        ("delta_only", lambda: delta_support(old, delta, pat, assume_new=True)),
    ):
        best, val = None, None
        for _ in range(3):
            t0 = time.time()
            val = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.2f}s result={val} (old={n_old}, delta={n_delta})")
    spark.stop()


if __name__ == "__main__":
    main()
