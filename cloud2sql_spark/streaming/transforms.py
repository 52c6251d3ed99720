"""Streaming transforms: pure df -> df, valid on both batch and streaming
DataFrames.

Determinism/scale notes:

- Money/value sums run in DECIMAL then cast to double — exact regardless of
  partial-aggregation order, so batch, streaming replay, and the DuckDB
  oracle all agree bit-for-bit.
- Tumbling/sliding windows are epoch-aligned (`F.window`), matching
  DuckDB's `time_bucket` grid for sub-day widths.
- All aggregations are keyed by (window, low-cardinality key) — streaming
  state is bounded by #windows-in-watermark × #keys, independent of input
  volume; watermarks evict closed windows at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sum_value() -> Column:
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact value sum."""
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), _sum_value().alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4)."""
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user (F.session_window works on
    batch and stream): session bounds, event count, exact value sum.
    Session end = last event + gap (Spark semantics; the oracle's
    gaps-and-islands SQL reproduces it with `diff >= gap` as the session
    break, because Spark merges only strictly-overlapping gap windows)."""
    sw = F.session_window("ts", "30 minutes")
    return (
        events.groupBy(sw.alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), _sum_value().alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def late_tolerant_counts(events: DataFrame) -> DataFrame:
    """10-minute tumbling counts behind a 10-minute watermark. On batch the
    watermark is a no-op (full result); on a stream it bounds state and
    drops data later than the watermark — the replay test feeds in-order
    files so both paths agree."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def dedup_events(events_with_dups: DataFrame) -> DataFrame:
    """Dedup by event_id. Batch: dropDuplicates. Stream variant (see
    replay.stream_dedup_within_watermark) uses
    dropDuplicatesWithinWatermark so state is evicted after the horizon
    instead of growing forever."""
    return events_with_dups.dropDuplicates(["event_id"])


def user_state(events: DataFrame) -> DataFrame:
    """Per-user final state: event count, exact total value, last ts —
    the semantics the custom stateful streaming operator maintains
    incrementally (replay.run_stateful_user_totals)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        _sum_value().alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer dim
    (broadcast — the static side is re-read per micro-batch and never
    shuffles the stream)."""
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
        )
    )
    return events.join(dim, "user_id", "inner").select(
        "event_id", "user_id", "event_type", "value", "c_name", "c_mktsegment"
    )


def counts_by_type(events: DataFrame) -> DataFrame:
    """Incremental per-type rollup — the foreachBatch JDBC sink payload."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"), _sum_value().alias("total_value")
    )


def clicks_before_purchase(events: DataFrame) -> DataFrame:
    """Stream-stream INNER interval join: each purchase matched to the
    same user's clicks in the preceding hour (inclusive bounds). On a
    stream both sides carry event-time watermarks and the interval
    condition bounds join state: Spark buffers only one hour of clicks
    per watermark advance — the canonical bounded stream-stream join.
    On batch the same plan is a plain range-condition join, so the
    DuckDB oracle verifies the full pair set exactly."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    cond = (
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
        "click_value",
    )


def purchases_with_click_outer(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, matched to
    the same user's clicks in the preceding hour OR emitted with null
    click columns. The outer semantics are what the inner join
    (clicks_before_purchase) cannot express: 'purchases with NO
    qualifying click' is itself the signal (organic-conversion
    measurement). On a stream, Spark holds an unmatched purchase until
    the watermark passes its join window, then emits the null row —
    so each branch takes its OWN watermark, and the '__flush__'
    sentinel (replay.append_flush_sentinel) must survive until after
    withWatermark so the final watermark advance releases the tail.
    On batch the same plan is a plain left join; the DuckDB oracle
    verifies the full outer pair set exactly."""

    def branch(typ: str, cols: list) -> DataFrame:
        b = events.filter(F.col("event_type").isin(typ, "__flush__")).select(
            "event_type", *cols
        )
        return b

    clicks = branch(
        "click",
        [
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        ],
    )
    purchases = branch(
        "purchase",
        [
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        ],
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    # The sentinel-drop filter must reference the EVENT-TIME column:
    # PushPredicateThroughNonJoin pushes any predicate NOT referencing the
    # watermark attribute below the EventTimeWatermark node, and a pushed
    # filter drops the '__flush__' rows BEFORE they reach the watermark
    # tracker — silently un-flushing the outer join (observed: the tail's
    # unmatched purchases never emitted). The far-future disjunct is
    # always false for real sentinels, so semantics equal event_type==typ.
    never = F.lit("9999-01-01").cast("timestamp")
    clicks = clicks.filter(
        (F.col("event_type") == "click") | (F.col("click_ts") > never)
    ).drop("event_type")
    purchases = purchases.filter(
        (F.col("event_type") == "purchase") | (F.col("purchase_ts") > never)
    ).drop("event_type")
    cond = (
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return purchases.join(clicks, cond, "left_outer").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
        "click_value",
    )
