"""Replay the events fixture as a file stream + streaming-only operators.

``stage_replay_dir`` splits events into N parquet files ordered by ts so
``maxFilesPerTrigger=1`` replays time roughly in order — the shape a real
ingest (Kafka/file drop) would have. All streaming queries use the
``availableNow`` trigger for deterministic drain-and-stop in tests.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.catalog import load_table

# schema of the staged (converted-ts) events files
_STAGED_SCHEMA = "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def stage_replay_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> str:
    """Write events (ts already converted to TIMESTAMP_NTZ) into ``n_files``
    time-ordered parquet files under ``out_dir`` for file-stream replay."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    chunked = ev.withColumn(
        "chunk", F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, n_files + 1):
        part = chunked.filter(F.col("chunk") == i).drop("chunk")
        part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_stage")
        src = next(
            f for f in os.listdir(f"{out_dir}/_stage") if f.endswith(".parquet")
        )
        os.rename(f"{out_dir}/_stage/{src}", f"{out_dir}/chunk_{i:04d}.parquet")
    shutil.rmtree(f"{out_dir}/_stage", ignore_errors=True)
    return out_dir


def read_event_stream(
    spark: SparkSession, replay_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """File-replay stream of events. ``ts`` is cast NTZ -> TIMESTAMP because
    streaming event-time (watermarks) requires TimestampType; with the
    session timezone pinned to UTC the wall-clock values are unchanged, so
    stream results compare equal to the NTZ batch results."""
    df = (
        spark.readStream.schema(_STAGED_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(replay_dir)
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table (availableNow)
    and return the final table as a batch DataFrame."""
    session = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return session.table(name)


def stream_dedup_within_watermark(stream_events: DataFrame) -> DataFrame:
    """Stateful dedup by event_id with bounded state: duplicates arriving
    within the 30-minute watermark horizon are dropped; state for older
    keys is evicted (dropDuplicatesWithinWatermark — streaming-only)."""
    return stream_events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stateful_user_totals(stream_events: DataFrame) -> DataFrame:
    """Custom per-user running state via applyInPandasWithState: maintains
    (n_events, total_cents, last_ts) per user across micro-batches and
    emits the updated state each batch. Value is accumulated in integer
    cents so the total is exact and order-independent — matching
    transforms.user_state's DECIMAL sum in batch.
    """
    import pandas as pd  # local: executors import lazily

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_ts TIMESTAMP_NTZ"
    state_schema = "n BIGINT, cents BIGINT, last_us BIGINT"

    def update(key, pdf_iter, state: GroupState):
        n, cents, last_us = state.get if state.exists else (0, 0, None)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int(pd.Series(pdf["value"] * 100).round().astype("int64").sum())
            batch_max = pdf["ts"].max()
            us = int(pd.Timestamp(batch_max).value // 1000)
            last_us = us if last_us is None or us > last_us else last_us
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return stream_events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_foreach_jdbc(
    stream_df: DataFrame, url: str, table: str, checkpoint: str
) -> None:
    """Streaming JDBC sink via foreachBatch — the cloud2sql load made
    incremental (reference batch load: cloud2sql/collect.py:103; JDBC
    destinations util.py:22-67). Each micro-batch overwrites the rollup
    table; idempotent by (batch results are complete-mode rollups)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("batchsize", 100000)
            .mode("overwrite")
            .save()
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_topk(
    stream_events: DataFrame, state_dir: str, checkpoint: str, k: int = 10
) -> None:
    """Incremental global top-k via foreachBatch: each micro-batch's local
    top-k merges with the persisted state's top-k and the union's top-k
    overwrites the state — top-k is associative/commutative, so the
    incremental result equals the batch answer regardless of how events
    are split across micro-batches. State is O(k), never O(stream);
    the same merge runs on any number of executors because each batch's
    local top-k is a TakeOrderedAndProject before the driver-side union.
    Deterministic order: (value DESC, event_id ASC) — the unique id
    breaks value ties."""
    import os as _os

    from pyspark.sql import functions as F

    cols = ["event_id", "user_id", "event_type", "value"]

    def merge_topk(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_top = (
            batch_df.select(*cols)
            .orderBy(F.col("value").desc(), "event_id")
            .limit(k)
        )
        if _os.path.isdir(_os.path.join(state_dir, "cur")):
            prev = spark.read.parquet(_os.path.join(state_dir, "cur"))
            batch_top = prev.unionByName(batch_top)
        merged = (
            batch_top.orderBy(F.col("value").desc(), "event_id").limit(k)
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(state_dir, "nxt")
        )
        # atomic-enough swap for a single-writer stream: rename new over old
        import shutil as _shutil

        _shutil.rmtree(_os.path.join(state_dir, "cur"), ignore_errors=True)
        _os.rename(
            _os.path.join(state_dir, "nxt"), _os.path.join(state_dir, "cur")
        )

    q = (
        stream_events.writeStream.foreachBatch(merge_topk)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_cdc_upsert(
    stream_events: DataFrame, state_dir: str, checkpoint: str
) -> None:
    """Incremental CDC compaction via foreachBatch: the state is ONE row
    per key — the latest change struct (max of (ts, event_id), which is
    last-writer-wins) plus the running change count. Each micro-batch
    reduces to its own per-key latest + count, unions with the persisted
    state, and re-reduces; the merge is associative and commutative, so
    the streamed snapshot equals the one-shot batch compaction however
    the changelog is chunked (verified in tests/test_streaming.py).
    Tombstones ('error' events) STAY in the state so a late-arriving
    older update cannot resurrect a deleted key; they are filtered only
    at read-out. State is O(live keys), never O(stream)."""
    import os as _os
    import shutil as _shutil

    def merge_cdc(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = F.max(
            F.struct(
                "ts",
                "event_id",
                "value",
                F.when(F.col("event_type") == "error", "delete")
                .otherwise("upsert")
                .alias("op"),
            )
        ).alias("latest")
        batch_state = batch_df.groupBy("user_id").agg(
            latest, F.count(F.lit(1)).alias("n_changes")
        )
        if _os.path.isdir(_os.path.join(state_dir, "cur")):
            prev = spark.read.parquet(_os.path.join(state_dir, "cur"))
            batch_state = prev.unionByName(batch_state)
        merged = batch_state.groupBy("user_id").agg(
            F.max("latest").alias("latest"),
            F.sum("n_changes").alias("n_changes"),
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(state_dir, "nxt")
        )
        _shutil.rmtree(_os.path.join(state_dir, "cur"), ignore_errors=True)
        _os.rename(
            _os.path.join(state_dir, "nxt"), _os.path.join(state_dir, "cur")
        )

    q = (
        stream_events.writeStream.foreachBatch(merge_cdc)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cdc_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Materialize the CDC snapshot: drop tombstoned keys, project the
    batch-compaction output shape."""
    return (
        spark.read.parquet(os.path.join(state_dir, "cur"))
        .filter(F.col("latest.op") != "delete")
        .select(
            "user_id",
            F.round("latest.value", 2).alias("final_value"),
            F.col("latest.ts").alias("updated_at"),
            "n_changes",
        )
    )


def run_exactly_once_append(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    batch_transform=None,
):
    """Idempotent append sink — exactly-once OUTPUT on Spark's
    at-least-once foreachBatch delivery. Structured Streaming replays a
    micro-batch (same batch_id, same data) after any failure between the
    user function and checkpoint commit; a sink that blindly appends
    duplicates that batch. This sink makes the (batch_id -> write)
    transaction idempotent the way the Spark docs prescribe: the batch
    lands in its own ``batch=<id>`` directory, a commit marker is
    recorded last, and a redelivered id whose marker exists is skipped
    wholesale. Works on any filesystem with atomic create; on a real
    lakehouse the marker is the transaction log."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(state_dir, "_committed", str(batch_id))
        if os.path.exists(marker):
            return
        if batch_transform is not None:
            # batch-LOCAL aggregation: batch_df is a static frame inside
            # foreachBatch, so this produces per-batch partials (the
            # re-aggregatable layout), not a running stateful rollup
            batch_df = batch_transform(batch_df)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # returned for redelivery simulation by callers/tests
    return write_batch


def append_flush_sentinel(
    spark: SparkSession, replay_dir: str, n: int = 2
) -> None:
    """Append ``n`` trailing '__flush__' events, each a further day past
    the replay's max ts, as separate chunk files.

    Stream-stream OUTER joins emit their null (unmatched) rows only when
    the watermark passes a row's join window; without a late
    watermark-advancer, the rows inside the final watermark-delay of the
    stream tail would never emit and stream != batch FOREVER — the
    standard production fix is exactly this kind of heartbeat/flush
    event. MULTIPLE staggered sentinels matter because a watermark
    computed from batch N only takes effect in batch N+1: a single
    sentinel in the last micro-batch advances a watermark nobody ever
    uses (observed: the tail's unmatched purchases stayed withheld).
    Callers pass n > files_per_trigger so at least one batch runs AFTER
    the first sentinel's advance. The sentinels flow through each
    branch's watermark operator (branches filter them out only AFTER
    withWatermark) and are excluded from every join output."""
    mx = (
        spark.read.schema(_STAGED_SCHEMA)
        .parquet(replay_dir)
        .agg(F.max("ts").alias("m"))
        .first()["m"]
    )
    for i in range(1, n + 1):
        row = spark.createDataFrame(
            [(-1, mx, -1, "__flush__", 0.0, "{}")], _STAGED_SCHEMA
        ).select(
            "event_id",
            (F.col("ts") + F.expr(f"INTERVAL {i} DAY")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        stage = f"{replay_dir}/_flush_stage"
        row.coalesce(1).write.mode("overwrite").parquet(stage)
        src = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(f"{stage}/{src}", f"{replay_dir}/chunk_{9000 + i:04d}.parquet")
        shutil.rmtree(stage, ignore_errors=True)
