"""Winnowing fingerprints: the paper's guarantee (shared substring of
length >= k + w - 1 yields a shared fingerprint), hand-checked window
selection, short-file edge case, and per-file (not global) window
partitioning in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from motive_rdf_spark.operators.winnow import winnow_fingerprints, winnow_profile

K, W = 4, 3


def _df(spark, rows):
    return spark.createDataFrame(rows, "file_id long, content string")


def test_fingerprint_count_matches_positions(spark):
    # len=10 -> 7 grams -> 5 windows of 3; fingerprints are DISTINCT
    # window minima so n_fp <= 5 and >= 1
    fp = winnow_fingerprints(_df(spark, [(0, "abcdefghij")]), k=K, w=W)
    n = fp.count()
    assert 1 <= n <= 5


def test_shared_substring_guarantee(spark):
    # Both files contain the same 12-char substring (>= k + w - 1 = 6):
    # winnowing MUST select at least one common fingerprint
    common = "zqxwvutsrpon"
    files = _df(
        spark,
        [(0, "aaaa" + common + "bbbb"), (1, "cccc" + common + "dddd")],
    )
    prof = {r["file_id"]: r.asDict() for r in winnow_profile(files, k=K, w=W).collect()}
    assert prof[0]["n_shared"] >= 1
    assert prof[1]["n_shared"] >= 1
    assert 0 < prof[0]["share_frac"] <= 1.0


def test_disjoint_alphabets_share_nothing(spark):
    files = _df(spark, [(0, "abcdabcdabcd"), (1, "wxyzwxyzwxyz")])
    prof = {r["file_id"]: r.asDict() for r in winnow_profile(files, k=K, w=W).collect()}
    assert prof[0]["n_shared"] == 0 and prof[1]["n_shared"] == 0
    assert prof[0]["share_frac"] == 0.0


def test_identical_files_share_everything(spark):
    files = _df(spark, [(0, "the quick brown fox"), (1, "the quick brown fox")])
    prof = {r["file_id"]: r.asDict() for r in winnow_profile(files, k=K, w=W).collect()}
    for f in (0, 1):
        assert prof[f]["n_shared"] == prof[f]["n_fp"] > 0
        assert prof[f]["share_frac"] == 1.0


def test_too_short_file_profiles_zero(spark):
    # shorter than k + w - 1: no complete window -> 0 fingerprints
    files = _df(spark, [(0, "abcde"), (1, "a much longer second file here")])
    prof = {r["file_id"]: r.asDict() for r in winnow_profile(files, k=K, w=W).collect()}
    assert prof[0] == {"file_id": 0, "n_fp": 0, "n_shared": 0, "share_frac": 0.0}
    assert prof[1]["n_fp"] > 0


def test_window_partitions_by_file(spark):
    plan = (
        winnow_fingerprints(_df(spark, [(0, "abcdefghij")]), k=K, w=W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the running-min window partitions on the file key, never globally
    assert "partitionBy" not in plan or "file_id" in plan
    assert "Python" not in plan and "ArrowEval" not in plan
