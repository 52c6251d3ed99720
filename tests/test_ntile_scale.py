"""Approx-ntile scale switch (VERDICT r06 item 4).

Both global-ntile operators (events_rfm_segments, sample_curriculum) get an
opt-in SPARK_GRAFT_APPROX_NTILE=1 path that replaces the single-partition
ntile window with percentile_approx boundaries + broadcast range
assignment. These tests pin:

1. exact == approx on a crafted fixture where the sketch boundaries are
   exact (distinct values, n divisible by the bucket count, accuracy far
   above the row count);
2. the approx plan has NO single-partition exchange and NO window — the
   global sort is gone, not hidden.

The crafted fixture is written as parquet (micros timestamps, same
physical shape as driver data) so the operators run unmodified through
catalog.load_table.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud2sql_spark.registry import queries

_QUERIES = queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    """20-user events + 20-doc documents where every ntile axis has
    distinct per-entity values: user i (1..20) has i events (freq
    distinct), per-event value = i dollars (mon_c = 100*i^2 distinct),
    last event at base + (60i+i)s (rec_us distinct); doc i has 3 tokens
    and n_chars = 100+i (difficulty distinct). n=20 with 5 (and 4)
    buckets means bucket edges sit exactly on ranks 4k (5k) — the regime
    where value-range assignment equals rank assignment."""
    d = str(tmp_path_factory.mktemp("ntile_scale"))
    base = datetime.datetime(2024, 1, 1)
    eid, ts, uid, etype, val, props = [], [], [], [], [], []
    k = 0
    for i in range(1, 21):
        for j in range(1, i + 1):
            k += 1
            eid.append(k)
            ts.append(base + datetime.timedelta(seconds=60 * i + j))
            uid.append(i)
            etype.append("view")
            val.append(float(i))
            props.append("{}")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(etype, pa.string()),
                "value": pa.array(val, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, 21)), pa.int64()),
                "text": pa.array(["a b c"] * 20, pa.string()),
                "lang": pa.array(["en"] * 20, pa.string()),
                "source": pa.array(["web"] * 20, pa.string()),
                "n_chars": pa.array(
                    [100 + i for i in range(1, 21)], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("key", ["events_rfm_segments", "sample_curriculum"])
def test_exact_equals_approx_on_crafted_fixture(
    spark, crafted_dir, monkeypatch, key
):
    monkeypatch.delenv("SPARK_GRAFT_APPROX_NTILE", raising=False)
    exact = _rows(_QUERIES[key](spark, crafted_dir))
    monkeypatch.setenv("SPARK_GRAFT_APPROX_NTILE", "1")
    approx = _rows(_QUERIES[key](spark, crafted_dir))
    assert exact == approx


@pytest.mark.parametrize("key", ["events_rfm_segments", "sample_curriculum"])
def test_approx_plan_has_no_global_sort(spark, sf_dir, monkeypatch, key):
    """The scale path must eliminate the single-partition total order:
    no Window operator, and any remaining SinglePartition exchange may
    only be a scalar-aggregate carry (one partial-agg row per upstream
    partition — gmax / the percentile sketch), never row data."""
    monkeypatch.setenv("SPARK_GRAFT_APPROX_NTILE", "1")
    plan = _physical(_QUERIES[key](spark, sf_dir))
    assert "Window" not in plan, plan
    for seg in plan.split("Exchange SinglePartition")[1:]:
        children = [ln for ln in seg.splitlines()[1:] if ln.strip()]
        assert children, f"SinglePartition exchange with no child:\n{plan}"
        assert "Aggregate" in children[0], plan


def test_exact_default_path_unchanged(spark, sf_dir, monkeypatch):
    """Without the env flag the oracle-checked exact plan still carries
    its (documented) single total order."""
    monkeypatch.delenv("SPARK_GRAFT_APPROX_NTILE", raising=False)
    plan = _physical(_QUERIES["sample_curriculum"](spark, sf_dir))
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_bucket_score_null_semantics(spark):
    """NULL sort keys must mirror the exact window's null placement:
    bucket 1 on ASC axes (Spark's NULLS FIRST default — the helper's
    default), bucket n on negated DESC axes (NULLS LAST) via
    nulls_last=True. Found in review: before the fix a NULL monetary
    key jumped from the exact path's bucket 5 to the approx path's
    bucket 1."""
    from pyspark.sql import functions as F

    from cloud2sql_spark.ntile_scale import bucket_score

    df = spark.createDataFrame(
        [(1, 10.0), (2, None)], "id bigint, k double"
    ).withColumn("b", F.array(F.lit(2.0), F.lit(5.0), F.lit(7.0)))
    out = {
        r["id"]: (r["asc_s"], r["desc_s"])
        for r in df.select(
            "id",
            bucket_score(F.col("k"), F.col("b")).alias("asc_s"),
            bucket_score(
                F.col("k"), F.col("b"), n=4, nulls_last=True
            ).alias("desc_s"),
        ).collect()
    }
    assert out[1] == (4, 4)  # 10.0 above every boundary either way
    assert out[2] == (1, 4)  # NULL: first bucket ASC, last bucket DESC


def test_bucket_score_null_boundaries(spark):
    """An all-NULL axis makes percentile_approx return a NULL boundary
    array; the score must fall back to bucket 1 (documented), never the
    out-of-range 0/NULL that raw size(filter(NULL, ...)) produces."""
    from pyspark.sql import functions as F

    from cloud2sql_spark.ntile_scale import bucket_score

    df = spark.createDataFrame(
        [(1, 10.0), (2, None)], "id bigint, k double"
    ).withColumn("b", F.lit(None).cast("array<double>"))
    out = {
        r["id"]: (r["asc_s"], r["desc_s"])
        for r in df.select(
            "id",
            bucket_score(F.col("k"), F.col("b")).alias("asc_s"),
            bucket_score(
                F.col("k"), F.col("b"), n=4, nulls_last=True
            ).alias("desc_s"),
        ).collect()
    }
    assert out[1] == (1, 1)  # no boundaries -> everything in bucket 1
    assert out[2] == (1, 4)  # NULL key still follows its null placement


def test_bucket_score_nulls_last_requires_n():
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cloud2sql_spark.ntile_scale import bucket_score

    with _pytest.raises(ValueError):
        bucket_score(F.lit(1.0), F.array(F.lit(1.0)), nulls_last=True)
