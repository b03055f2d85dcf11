"""Line-level operators: hand-computed line_dedup / line_repetition
expectations, empty-survivor edge case, and multi-file reassembly
order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from motive_rdf_spark.operators.lines import line_dedup, line_repetition


@pytest.fixture(scope="module")
def files(spark):
    rows = [
        # "# banner" is in files 0,1 (cross-doc dup); "alpha" only in 0;
        # file 0 also repeats "solo" twice WITHIN itself (df=1: kept)
        (0, "# banner\nalpha\nsolo\nsolo"),
        (1, "# banner\nbeta"),
        # file whose every line is a cross-doc dup -> clean == ""
        (2, "# banner"),
    ]
    # "# banner" df=3; "solo" df=1 (two copies, ONE file)
    return spark.createDataFrame(rows, "file_id long, content string")


def test_line_dedup_hand_computed(files):
    got = {r["file_id"]: r.asDict() for r in line_dedup(files, min_df=2).collect()}
    assert got[0]["n_lines"] == 4
    assert got[0]["n_kept"] == 3
    # order preserved; within-file repeats survive (df counts FILES)
    assert got[0]["content_clean"] == "alpha\nsolo\nsolo"
    assert got[1] == {
        "file_id": 1,
        "n_lines": 2,
        "n_kept": 1,
        "content_clean": "beta",
    }
    # all lines removed -> present with empty clean text
    assert got[2] == {"file_id": 2, "n_lines": 1, "n_kept": 0, "content_clean": ""}


def test_line_repetition_hand_computed(files):
    got = {r["file_id"]: r.asDict() for r in line_repetition(files).collect()}
    # file 0: 4 lines, 3 distinct -> dup_line_frac 1/4; dup chars =
    # 2*len("solo")=8 of total 8+5+4+4=21
    assert got[0]["n_lines"] == 4
    assert got[0]["dup_line_frac"] == 0.25
    assert got[0]["dup_line_char_frac"] == round(8 / 21, 4)
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["dup_line_char_frac"] == 0.0


def test_line_repetition_all_empty_lines(spark):
    df = spark.createDataFrame([(0, "\n\n")], "file_id long, content string")
    row = line_repetition(df).first()
    # 3 empty lines: all dups, but zero chars -> char frac defined as 0
    assert row["n_lines"] == 3
    assert row["dup_line_frac"] == round(2 / 3, 4)
    assert row["dup_line_char_frac"] == 0.0


def test_line_dedup_plan_two_level_agg(spark, files):
    """The duplicated-line set is built by a partial-aggregatable
    count-distinct (no global single-task stage) and the probe side is
    anti-joined — no Python anywhere."""
    plan = line_dedup(files)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "SinglePartition" not in plan.split("AdaptiveSparkPlan")[0]
