"""Checkpoint-resume hardening: a crash AFTER data writes but BEFORE
the ledger commit must be fully repaired by re-running (dynamic
partition overwrite makes the partial snapshot idempotent), and the
CLI construct experiment must drive the same path."""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

from motive_rdf_spark.data.generators import candidate_dict, source_code_table
from motive_rdf_spark.pipeline.materialize import (
    load_graph,
    processed_snapshots,
    run_pipeline,
    run_snapshot,
)


def test_crash_before_ledger_commit_recovers(spark, tmp_path, monkeypatch):
    src = source_code_table(spark, 40, commits=2).drop("k")
    cands = candidate_dict(spark, 40)
    out = str(tmp_path / "kg")
    snaps = sorted(r["commit"] for r in src.select("commit").distinct().collect())

    # reference run: both snapshots cleanly
    ref_out = str(tmp_path / "ref")
    run_pipeline(spark, src, cands, ref_out)
    expected = sorted(map(tuple, load_graph(spark, ref_out).collect()))

    # crash run: process snapshot 0, then simulate dying right before
    # the ledger write of snapshot 1 by making the ledger path readonly
    run_snapshot(spark, src, cands, out, snaps[0])

    import motive_rdf_spark.pipeline.materialize as mat

    orig_write = mat._write
    def crashing_write(df, path, mode="overwrite", partition_by=None):
        if path.endswith("/ledger"):
            raise RuntimeError("simulated crash before checkpoint commit")
        return orig_write(df, path, mode, partition_by)

    monkeypatch.setattr(mat, "_write", crashing_write)
    try:
        run_snapshot(spark, src, cands, out, snaps[1])
    except RuntimeError:
        pass
    monkeypatch.setattr(mat, "_write", orig_write)

    # snapshot 1's data partitions exist but it is NOT checkpointed
    assert processed_snapshots(spark, out) == {snaps[0]}

    # resume: reprocesses snapshot 1 (dynamic overwrite), commits it
    reports = run_pipeline(spark, src, cands, out)
    assert [r.skipped for r in reports] == [True, False]
    assert processed_snapshots(spark, out) == set(snaps)
    got = sorted(map(tuple, load_graph(spark, out).collect()))
    assert got == expected


def test_cli_construct_experiment(spark, tmp_path):
    src_path = str(tmp_path / "source")
    source_code_table(spark, 30, commits=1).drop("k").write.parquet(src_path)
    out = str(tmp_path / "out")
    res = subprocess.run(
        [
            sys.executable, "-m", "motive_rdf_spark",
            "--experiment", "construct", "--data", src_path, "--output", out,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo", "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "triples" in res.stdout
    assert spark.read.parquet(f"{out}/triples").count() > 0


def test_cli_multi_experiment(spark, tmp_path):
    res = subprocess.run(
        [
            sys.executable, "-m", "motive_rdf_spark",
            "--experiment", "multi", "--data", "hub:60",
            "--iterations", "5", "--seed", "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo", "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "best motif set" in res.stdout
