"""B-9 streaming operators, batch-verified (SURVEY.md §2).

Each key applies the SAME transform used by the Structured Streaming layer
(cloud2sql_spark/streaming/transforms.py) to the static events table; the
DuckDB oracle verifies the batch semantics, and tests/test_streaming.py
verifies stream-replay == batch for the same transforms (SURVEY §5.2(4)).

stream_foreach_jdbc additionally drives the real incremental JDBC sink
(foreachBatch) and returns the read-back rollup.

Note: custom arbitrary state uses applyInPandasWithState
(replay.run_stateful_user_totals). Spark 4's successor API,
transformWithStateInPandas, was attempted and works API-wise but its
driver worker requires a protobuf runtime that is broken in this container
(ImportError: google.protobuf.descriptor) — on a normal cluster the same
StatefulProcessor port is mechanical (ValueState mirrors the state tuple).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.fixtures import (
    TMP_ROOT as _TMP_ROOT,
    session_fixture_dir as _session_fixture_dir,
)
from cloud2sql_spark.registry import register
from cloud2sql_spark.streaming import transforms


@register(
    "stream_tumbling",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
                - k * INTERVAL '15 minutes' AS TIMESTAMP)        AS window_start,
           CAST(time_bucket(INTERVAL '15 minutes', ts)
                - k * INTERVAL '15 minutes'
                + INTERVAL '1 hour' AS TIMESTAMP)                AS window_end,
           event_type,
           count(*) AS n_events
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) offsets
    GROUP BY 1, 2, 3
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h/15min sliding windows. Oracle: every event belongs to exactly the
    4 windows starting at its 15-min bucket minus {0,1,2,3}x15min."""
    return transforms.sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP)                          AS session_start,
           CAST(max(ts) + INTERVAL '30 minutes' AS TIMESTAMP)  AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)   AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows; oracle reproduces Spark's semantics via
    gaps-and-islands (new session when gap >= 30min; end = last + gap)."""
    return transforms.session_stats(load_table(spark, sf_dir, "events"))


@register(
    "stream_watermark_late",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP)
               AS window_start,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts — watermark is a no-op on batch, so the
    full result verifies against SQL; the streaming replay test asserts
    in-order replay equals this batch result."""
    return transforms.late_tolerant_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
           event_type, value, props
    FROM (SELECT * FROM events
          UNION ALL
          SELECT * FROM events WHERE event_id % 10 = 0)
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup by event_id over an input with injected exact duplicates
    (every 10th event doubled). Streaming variant:
    replay.stream_dedup_within_watermark (bounded state)."""
    ev = load_table(spark, sf_dir, "events")
    with_dups = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return transforms.dedup_events(with_dups)


@register(
    "stream_stateful_custom",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(max(ts) AS TIMESTAMP) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running state. Batch: one hash aggregate. Streaming: the
    same state maintained incrementally by applyInPandasWithState
    (replay.run_stateful_user_totals), verified equal in
    tests/test_streaming.py."""
    return transforms.user_state(load_table(spark, sf_dir, "events"))


@register(
    "stream_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name,
           c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich events with the customer dim (broadcast stream-static join)."""
    return transforms.enrich_with_customer(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


@register(
    "stream_foreach_jdbc",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_foreach_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JDBC load: replay events as a stream, foreachBatch
    writes the per-type rollup into Derby (the cloud2sql load made
    streaming, reference collect.py:103 batching + util.py JDBC), then
    read the final table back."""
    from cloud2sql_spark.streaming import replay

    # per-(sf, applicationId): the shared path let a concurrent run's
    # setup rmtree THIS run's live checkpoint state mid-commit, and a
    # second overlap repopulated the Derby rollup from the wrong corpus
    # (both observed round 12 — fixtures.session_fixture_dir)
    base = _session_fixture_dir(spark, "stream_foreach_jdbc", sf_dir)
    replay_dir = replay.stage_replay_dir(spark, sf_dir, f"{base}/replay", n_files=4)
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=2)
    url = f"jdbc:derby:{base}/db;create=true"
    replay.run_foreach_jdbc(
        transforms.counts_by_type(stream), url, "event_rollup", f"{base}/ckpt"
    )
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "event_rollup")
        .load()
    )
    return df.select("event_type", "n_events", "total_value")


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           c.value AS click_value
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join with an event-time interval condition: purchases
    x same-user clicks within the preceding hour. Streaming replay
    (tests/test_streaming.py) runs the SAME transform over two watermarked
    file streams — Spark buffers only the interval's worth of click state;
    batch verifies the exact pair set against DuckDB."""
    return transforms.clicks_before_purchase(load_table(spark, sf_dir, "events"))


@register(
    "stream_incremental_topk",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10
    """,
)
def stream_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental global top-10 by value maintained across micro-batches:
    each batch's local top-k (TakeOrderedAndProject, O(k) per task)
    merges with the O(k) persisted state — top-k is associative, so the
    streaming answer equals the one-shot batch answer however the stream
    is chunked. The monitoring-dashboard shape: state never grows with
    the stream, and the merge is the same at 100 TB/day. Unique event_id
    breaks value ties deterministically on both engines."""
    from cloud2sql_spark.streaming import replay

    base = _session_fixture_dir(spark, "stream_topk", sf_dir)
    replay_dir = replay.stage_replay_dir(spark, sf_dir, f"{base}/replay", n_files=4)
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=1)
    replay.run_incremental_topk(stream, f"{base}/state", f"{base}/ckpt", k=10)
    return spark.read.parquet(f"{base}/state/cur").select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "stream_cdc_upsert",
    oracle="""
    WITH cdc AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'delete'
                  ELSE 'upsert' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_changes
      FROM events)
    SELECT user_id,
           round(value, 2) AS final_value,
           ts AS updated_at,
           n_changes
    FROM cdc WHERE rn = 1 AND op <> 'delete'
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of cdc_apply_upserts: the changelog replays as a
    file stream and foreachBatch maintains a one-row-per-key snapshot
    (last-writer-wins struct max + running change count, tombstones
    pinned in state so late older updates cannot resurrect deletes).
    The merge is associative/commutative, so the streamed snapshot is
    chunking-invariant and equals the batch compaction — here it is
    driven against the real stream and read back from the state store,
    then hash-checked against the same oracle as the batch operator."""
    from cloud2sql_spark.streaming import replay

    base = _session_fixture_dir(spark, "stream_cdc", sf_dir)
    replay_dir = replay.stage_replay_dir(spark, sf_dir, f"{base}/replay", n_files=4)
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=2)
    replay.run_cdc_upsert(stream, f"{base}/state", f"{base}/ckpt")
    return replay.read_cdc_state(spark, f"{base}/state")


@register(
    "stream_exactly_once_sink",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once APPEND sink under at-least-once delivery: events
    replay in 4 files / 2 per trigger, each micro-batch's per-type
    partial rollup lands in its own batch=<id> directory behind a commit
    marker — then batch 0 is REDELIVERED on purpose (the retry Structured
    Streaming performs after a failure between user code and checkpoint
    commit) and must be skipped by the marker. The read-back re-aggregates
    the per-batch partials; if the redelivery had appended, every batch-0
    count would double and the oracle hash would catch it. Per-batch
    partial rollups re-aggregate exactly (DECIMAL sums), which is what
    makes the append layout equivalent to the complete-mode rollup."""
    from cloud2sql_spark.streaming import replay

    base = _session_fixture_dir(spark, "stream_exactly_once", sf_dir)
    replay_dir = replay.stage_replay_dir(spark, sf_dir, f"{base}/replay", n_files=4)
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=2)
    state_dir = f"{base}/out"
    writer = replay.run_exactly_once_append(
        stream, state_dir, f"{base}/ckpt",
        batch_transform=transforms.counts_by_type,
    )
    # Redelivery simulation: re-run the batch-0 writer with recomputed
    # data. The commit marker must make this a no-op.
    first_batch = spark.read.schema(replay._STAGED_SCHEMA).parquet(
        f"{replay_dir}/chunk_0001.parquet", f"{replay_dir}/chunk_0002.parquet"
    )
    writer(first_batch, 0)
    out = spark.read.parquet(f"{state_dir}/batch=*")
    return out.groupBy("event_type").agg(
        F.sum("n_events").alias("n_events"),
        # re-aggregate the per-batch partials in DECIMAL(18,2): each
        # partial is an exact 2-decimal double, so the decimal sum is
        # exact at any batch count — the same conversion as the
        # round(sum(money),2) family (queries/rounding.py, round 12)
        F.sum(F.col("total_value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "stream_interval_join_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — purchases WITHOUT a
    qualifying click emit with null click columns (the organic-conversion
    signal an inner join cannot express). Streaming replay
    (tests/test_streaming.py) runs the SAME transform over watermarked
    streams with a '__flush__' watermark-advancer appended, because
    outer-join null rows only emit when the watermark passes their join
    window — without the flush the stream would withhold the tail
    forever, the classic production pitfall this operator pins. Batch
    verifies the exact outer pair set against DuckDB."""
    return transforms.purchases_with_click_outer(
        load_table(spark, sf_dir, "events")
    )
