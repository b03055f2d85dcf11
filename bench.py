"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Metric: total wall seconds over the headline set, plus per-query
seconds and derived triples/sec for the KG-construction path.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from motive_rdf_spark.contract import registry
    from motive_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="motive-rdf-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus) * 2, 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "bgp_vee",
        "bgp_chain",
        "bgp_support_by_nation",
        "degrees_in",
        "dict_encode",
        "q1_pricing_summary",
        "top_customers",
        "sessionize",
        "dedup_exact",
        "embedding_norm",
    ]
    reg = registry()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in headline:
        if name not in reg:
            continue
        fn, _ = reg[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # count() forces full evaluation without driver-side collect
        rows[name] = df.count()
        timings[name] = round(time.time() - t0, 3)

    # KG-construction throughput: triples materialized per second
    from motive_rdf_spark.kg_tpch import triples_view

    t0 = time.time()
    n_triples = triples_view(spark, sf_dir).count()
    construct_sec = time.time() - t0
    timings["kg_construct"] = round(construct_sec, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / max(construct_sec, 1e-9), 1),
                "cpus": int(cpus),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
