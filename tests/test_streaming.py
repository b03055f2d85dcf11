"""Structured Streaming tests: streaming results must equal the batch
equivalents on the same input (the catch-up/continuous equivalence that
makes Trigger.AvailableNow deployments safe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from motive_rdf_spark.streaming.incremental import (
    run_available_now,
    stream_events,
    streaming_sessionize,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    stream = stream_events(spark, SF)
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    run_available_now(agg, str(tmp_path / "ckpt"), "win_counts")
    got = sorted(map(tuple, spark.sql("SELECT * FROM win_counts").collect()))

    batch = spark.read.parquet(f"{SF}/events.parquet")
    exp = sorted(map(tuple, windowed_event_counts(batch).collect()))
    assert got == exp


def test_stateful_sessionize_matches_batch_window(spark, tmp_path):
    stream = stream_events(spark, SF)
    sess = streaming_sessionize(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user is the final running total
    got_df = spark.sql(
        "SELECT user_id, max(sessions) AS sessions FROM sessions_stream GROUP BY user_id"
    )
    got = {r["user_id"]: r["sessions"] for r in got_df.collect()}

    # batch oracle: the contract's lag-window sessionization
    from motive_rdf_spark.contract import registry

    fn, _ = registry()["sessionize"]
    exp = {r["user_id"]: r["sessions"] for r in fn(spark, SF).collect()}
    assert got == exp
