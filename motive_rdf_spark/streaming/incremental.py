"""Structured Streaming over the events table: watermarked windowed
aggregation and a custom stateful sessionizer.

The reference is pure batch (SURVEY.md §2.9); the graft's snapshot
pipeline (pipeline/materialize.py) is batch-incremental by design. This
module adds the genuinely streaming surface a production ingest needs:

- ``stream_events``            — file-source readStream with explicit
  schema (a streaming source must never infer schema in production);
- ``windowed_event_counts``    — event-time tumbling window + watermark
  for late data; with ``Trigger.AvailableNow`` the same code does
  catch-up batch runs and continuous serving unchanged;
- ``streaming_sessionize``     — ``applyInPandasWithState`` custom
  stateful operator: per-user 30-minute-gap session counting with a
  processing-time timeout, the Spark-native shape for any
  reference-style stateful operator a future stream would need.

Scale notes: state lives in the state store keyed by user_id —
partitioned by the groupBy key, so hot users shard across the same
shuffle partitions AQE manages; the watermark bounds state size for
the windowed agg. Checkpoint location per query gives exactly-once
file-sink semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_MS = 30 * 60 * 1000


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema).

    The file stream source requires a *directory* (new files land
    there); the testdata ships one parquet file, so stage a symlink
    dir — in production this is the ingest drop directory.
    """
    import hashlib
    import os

    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        path = src
    else:
        stage = os.path.join(
            "/tmp", "motive_rdf_stream", hashlib.md5(src.encode()).hexdigest()[:12]
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events-000.parquet")
        if not os.path.exists(link):
            try:
                os.symlink(src, link)
            except FileExistsError:
                pass  # concurrent process staged it first — same target
        path = stage
    return spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling window counts with a late-data watermark.
    Works identically on a batch DataFrame (watermark is a no-op there)
    — the property the streaming-vs-batch equivalence test uses."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, query_name: str) -> None:
    """Drain the stream in catch-up mode (Trigger.AvailableNow) into an
    in-memory sink table named ``query_name``; blocks until done."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# custom stateful operator: gap-based sessionization
# ---------------------------------------------------------------------------

_SESS_STATE_SCHEMA = "last_ts_ms long, sessions long"
_SESS_OUT_SCHEMA = "user_id long, sessions long"


def _sessionize_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session counter: a new session starts when the gap to
    the previous event exceeds SESSION_GAP_MS. State = (last event ts,
    sessions so far); emits the running total each batch."""
    (user_id,) = key
    last_ts, sessions = state.get if state.exists else (None, 0)
    for pdf in batches:
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).sort_values()
        for t in ts_ms:
            if last_ts is None or t - last_ts > SESSION_GAP_MS:
                sessions += 1
            last_ts = int(t)
    state.update((last_ts, sessions))
    yield pd.DataFrame({"user_id": [user_id], "sessions": [sessions]})


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionizer (streaming input required)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming exact dedup: first-seen content wins, state keyed by hash
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (explicit schema),
    staged exactly like ``stream_events``."""
    import hashlib
    import os

    src = f"{sf_dir}/documents.parquet"
    if os.path.isdir(src):
        path = src
    else:
        stage = os.path.join(
            "/tmp", "motive_rdf_stream", hashlib.md5(src.encode()).hexdigest()[:12]
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "documents-000.parquet")
        if not os.path.exists(link):
            try:
                os.symlink(src, link)
            except FileExistsError:
                pass  # concurrent process staged it first — same target
        path = stage
    return spark.readStream.schema(DOC_SCHEMA).format("parquet").load(path)


def streaming_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact deduplication for incremental corpus ingest:
    content arriving with a sha256 already seen in ANY earlier
    micro-batch is dropped by ``dropDuplicates`` state (keyed by the
    hash — state size = number of distinct contents, sharded across
    the shuffle partitions like any keyed state).

    The output projects only content-derived columns (hash + length),
    NOT the arbitrary surviving doc_id: which duplicate arrives first
    is a race in any distributed ingest, so the deterministic contract
    — and the one the batch oracle can check — is the surviving
    content *set*. Works identically on a batch frame (state-free
    distinct) — the streaming==batch equivalence test's property.
    """
    proj = docs.select(
        F.sha2(F.col(text_col), 256).alias("content_sha"), F.col("n_chars")
    )
    return proj.dropDuplicates(["content_sha"])
