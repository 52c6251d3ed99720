"""Approx-distinct scale switch for profile_table.

Six exact count-distincts over different columns make Catalyst plan an
Expand — every scanned row is replicated once per distinct column inside
the aggregate (7x the row volume), which is the operator's real cost at
100 TB. The opt-in SPARK_GRAFT_APPROX_PROFILE=1 path swaps
count_distinct for approx_count_distinct (HLL++ sketches, map-side
mergeable). These tests pin:

1. the default plan HAS the Expand and the approx plan does NOT — the
   scan really became single-pass, not cosmetically;
2. on the approx path every non-cardinality statistic (n_rows, n_nulls,
   min, max) is IDENTICAL to the exact path, and each n_distinct is
   within the sketch's documented 5% relative standard deviation
   (checked at 3 sigma);
3. the default path is byte-identical with the env var unset vs "0" —
   the switch cannot leak into the oracle-checked configuration.
"""

from __future__ import annotations

from cloud2sql_spark.registry import queries

_QUERIES = queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(
        (r.asDict() for r in df.collect()), key=lambda d: d["column_name"]
    )


def test_exact_is_multi_pruned_scan_and_approx_is_single_scan(
    spark, sf_dir, monkeypatch
):
    """Neither path Expands (r14: the exact path decomposes its six
    count-distincts into per-column two-phase aggregates instead of the
    7x-row Expand); the approx path remains the genuine single-scan
    single-aggregate plan."""
    monkeypatch.delenv("SPARK_GRAFT_APPROX_PROFILE", raising=False)
    exact_plan = _physical(_QUERIES["profile_table"](spark, sf_dir))
    assert "Expand" not in exact_plan
    assert exact_plan.count("FileScan") == 7
    monkeypatch.setenv("SPARK_GRAFT_APPROX_PROFILE", "1")
    approx_plan = _physical(_QUERIES["profile_table"](spark, sf_dir))
    assert "Expand" not in approx_plan
    assert approx_plan.count("FileScan") == 1


def test_approx_stats_match_exact_within_rsd(spark, sf_dir, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_APPROX_PROFILE", raising=False)
    exact = _rows(_QUERIES["profile_table"](spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_APPROX_PROFILE", "1")
    approx = _rows(_QUERIES["profile_table"](spark, sf_dir))
    assert len(exact) == len(approx) == 6
    for e, a in zip(exact, approx):
        for col in ("column_name", "n_rows", "n_nulls", "min_value",
                    "max_value"):
            assert e[col] == a[col], col
        # HLL++ default rsd 0.05; allow 3 sigma
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.15 * e["n_distinct"]
        ), e["column_name"]


def test_env_zero_is_exact_path(spark, sf_dir, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_APPROX_PROFILE", raising=False)
    unset = _rows(_QUERIES["profile_table"](spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_APPROX_PROFILE", "0")
    zero = _rows(_QUERIES["profile_table"](spark, sf_dir))
    assert unset == zero
