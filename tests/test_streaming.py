"""Streaming replay equivalence (SURVEY.md §5.2(4)): every streaming
transform applied to a file-replayed event stream must equal the same
transform applied to the static events table."""

from __future__ import annotations

import os
import tempfile

import pytest

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.streaming import replay, transforms

pytestmark = pytest.mark.streaming


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    out = os.path.join(tempfile.gettempdir(), "cloud2sql_spark", "test_replay")
    return replay.stage_replay_dir(spark, sf_dir, out, n_files=6)


def _naive(v):
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    return v


def _assert_same_rows(df_a, df_b, cols):
    a = sorted(tuple(_naive(r[c]) for c in cols) for r in df_a.select(*cols).collect())
    b = sorted(tuple(_naive(r[c]) for c in cols) for r in df_b.select(*cols).collect())
    assert a == b


@pytest.mark.parametrize(
    "transform, cols",
    [
        (transforms.tumbling_counts, ["window_start", "event_type", "n_events", "total_value"]),
        (transforms.sliding_counts, ["window_start", "window_end", "event_type", "n_events"]),
        (transforms.session_stats, ["user_id", "session_start", "session_end", "n_events", "total_value"]),
        (transforms.late_tolerant_counts, ["window_start", "n_events"]),
    ],
    ids=["tumbling", "sliding", "session", "watermark"],
)
def test_stream_equals_batch(spark, sf_dir, replay_dir, transform, cols):
    batch = transform(load_table(spark, sf_dir, "events"))
    stream = transform(replay.read_event_stream(spark, replay_dir, files_per_trigger=2))
    name = f"mem_{transform.__name__}"
    result = replay.run_to_memory(stream, name, output_mode="complete")
    _assert_same_rows(result, batch, cols)


def test_stream_dedup_within_watermark(spark, sf_dir, replay_dir):
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=3)
    deduped = replay.stream_dedup_within_watermark(stream)
    result = replay.run_to_memory(deduped, "mem_dedup", output_mode="append")
    n_src = load_table(spark, sf_dir, "events").count()
    # replay has no duplicates, so dedup must be lossless; a second pass of
    # the same event_ids inside the watermark would be dropped (API contract)
    assert result.select("event_id").distinct().count() == n_src
    assert result.count() == n_src


def test_stateful_user_totals_matches_batch(spark, sf_dir, replay_dir):
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=2)
    updates = replay.run_stateful_user_totals(stream)
    result = replay.run_to_memory(updates, "mem_state", output_mode="update")
    # update mode emits one row per (user, micro-batch); final state = row
    # with max n_events per user
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        result.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    batch = transforms.user_state(load_table(spark, sf_dir, "events"))
    _assert_same_rows(final, batch, ["user_id", "n_events", "total_value", "last_ts"])


def test_stream_static_join_equals_batch(spark, sf_dir, replay_dir):
    customer = load_table(spark, sf_dir, "customer")
    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=3)
    joined = transforms.enrich_with_customer(stream, customer)
    result = replay.run_to_memory(joined, "mem_join", output_mode="append")
    batch = transforms.enrich_with_customer(
        load_table(spark, sf_dir, "events"), customer
    )
    _assert_same_rows(
        result, batch, ["event_id", "user_id", "event_type", "c_mktsegment"]
    )


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, replay_dir):
    """Two watermarked file streams (purchases x clicks from the same
    replay) joined on user + 1h interval must equal the batch join.
    In-order replay with availableNow drains everything before the final
    watermark, so the inner join loses nothing."""
    stream = transforms.clicks_before_purchase(
        replay.read_event_stream(spark, replay_dir, files_per_trigger=3)
    )
    result = replay.run_to_memory(stream, "mem_ssj", output_mode="append")
    batch = transforms.clicks_before_purchase(load_table(spark, sf_dir, "events"))
    _assert_same_rows(
        result, batch,
        ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "click_value"],
    )


def test_cdc_upsert_chunking_invariant(spark, sf_dir, replay_dir):
    """The foreachBatch CDC merge must produce the identical snapshot for
    any micro-batch chunking (1 file vs 3 files per trigger), and that
    snapshot must equal the one-shot batch compaction (cdc_apply_upserts),
    including tombstone suppression."""
    from cloud2sql_spark.queries.curation import cdc_apply_upserts

    base = os.path.join(tempfile.gettempdir(), "cloud2sql_spark", "test_cdc")

    def run(files_per_trigger: int):
        state = f"{base}/state_{files_per_trigger}"
        ckpt = f"{base}/ckpt_{files_per_trigger}"
        import shutil

        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = replay.read_event_stream(
            spark, replay_dir, files_per_trigger=files_per_trigger
        )
        replay.run_cdc_upsert(stream, state, ckpt)
        rows = replay.read_cdc_state(spark, state).collect()
        return sorted(
            (r.user_id, r.final_value, _naive(r.updated_at), r.n_changes)
            for r in rows
        )

    fine, coarse = run(1), run(3)
    assert fine == coarse
    batch = sorted(
        (r.user_id, r.final_value, _naive(r.updated_at), r.n_changes)
        for r in cdc_apply_upserts(spark, sf_dir).collect()
    )
    assert fine == batch


def test_exactly_once_sink_commit_markers(spark, sf_dir):
    """The idempotent append sink leaves one batch directory + one commit
    marker per micro-batch, and the deliberate batch-0 redelivery inside
    the operator must NOT create extra batch output — if the marker skip
    broke, re-aggregation would double batch 0 and the oracle hash in
    test_queries would fail; this pins the mechanism itself."""
    import os

    from cloud2sql_spark.fixtures import session_fixture_path
    from cloud2sql_spark.queries.streaming import stream_exactly_once_sink

    stream_exactly_once_sink(spark, sf_dir).collect()
    state = os.path.join(
        session_fixture_path(spark, "stream_exactly_once", sf_dir), "out"
    )
    batches = sorted(d for d in os.listdir(state) if d.startswith("batch="))
    markers = sorted(os.listdir(os.path.join(state, "_committed")))
    assert batches == ["batch=0", "batch=1"]
    assert markers == ["0", "1"]


def test_stream_interval_join_outer_equals_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream interval join: unmatched purchases emit
    null click rows only as the watermark passes their window, so the
    replay appends a '__flush__' sentinel a day past max ts; with it the
    drained stream must equal the batch left join EXACTLY (without it
    the tail's unmatched rows would be withheld — the pitfall this test
    pins)."""
    rd = replay.stage_replay_dir(
        spark, sf_dir, str(tmp_path / "outer_replay"), n_files=6
    )
    # n > files_per_trigger: the first sentinel's watermark advance must
    # have a LATER batch to take effect in
    replay.append_flush_sentinel(spark, rd, n=3)
    stream = transforms.purchases_with_click_outer(
        replay.read_event_stream(spark, rd, files_per_trigger=2)
    )
    result = replay.run_to_memory(stream, "mem_ssj_outer", output_mode="append")
    batch = transforms.purchases_with_click_outer(
        load_table(spark, sf_dir, "events")
    )
    _assert_same_rows(
        result,
        batch,
        ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts",
         "click_value"],
    )
    # and the outer semantics are non-trivial here: some purchases have
    # no qualifying click at all
    assert batch.filter("click_id IS NULL").count() > 0
