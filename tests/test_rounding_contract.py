"""Guard the round-10 half-boundary immunization (queries/rounding.py).

The converted keys must keep rounding their exact-rational outputs
through the shared integer template — a refactor that quietly reverts
one to the engines' native round() reintroduces the cross-engine
coin-flip at half boundaries (measured divergence: ~16% of 2-decimal
money-mean halves, ~1-3% of 6-decimal ratio halves). Source-level pins,
no SparkSession.
"""

from __future__ import annotations

import inspect

import duckdb
import pytest

from cloud2sql_spark.registry import oracle_sql, queries

# key -> number of output columns that must ride the exact template
_CONVERTED = {
    "agg_groupby": 3,                  # avg_qty, avg_price, avg_disc
    "events_markov_next_state": 1,     # p
    "dedup_quality_report": 2,         # recall, precision
    "sample_importance_reweight": 4,   # emp_p, weight, sum_w2_term, ess
    "embed_dim_stats": 1,              # mean_val
    "embed_whitening_stats": 1,        # mean_val
}

_ORACLE_SIGNATURE = "AS HUGEINT)"  # the wide cast only the template emits


def test_converted_oracles_carry_the_exact_template():
    ors = oracle_sql()
    for key, n_sites in _CONVERTED.items():
        sql = ors[key]
        assert sql.count(_ORACLE_SIGNATURE) >= n_sites, (
            f"{key}: expected >= {n_sites} exact-rounding sites, "
            f"found {sql.count(_ORACLE_SIGNATURE)} — a plain round() "
            "revert reintroduces the half-boundary coin-flip"
        )


def test_converted_spark_sides_reference_the_helper():
    qs = queries()
    for key in _CONVERTED:
        fn = qs[key]
        src = inspect.getsource(inspect.unwrap(fn))
        assert (
            "ratio_round_spark" in src or "_MEAN_MILLI_6DP_SPARK" in src
        ), f"{key}'s Spark side no longer uses the exact-rounding helper"


def test_template_output_is_double_and_null_safe():
    """The template's output column must stay DOUBLE (schema parity with
    the old round() output) and propagate NULL numerators as NULL (the
    CASE's ELSE-1 branch must not turn a NULL ratio into a value)."""
    from cloud2sql_spark.queries.rounding import ratio_round_oracle

    con = duckdb.connect()
    t, v = con.execute(
        f"SELECT typeof(x), x FROM (SELECT "
        f"{ratio_round_oracle('num', 'den', 6)} AS x FROM "
        f"(SELECT CAST(7 AS BIGINT) num, CAST(3 AS BIGINT) den))"
    ).fetchone()
    assert t == "DOUBLE" and v == pytest.approx(2.333333)
    (nv,) = con.execute(
        f"SELECT {ratio_round_oracle('num', 'den', 6)} FROM "
        f"(SELECT CAST(NULL AS BIGINT) num, CAST(3 AS BIGINT) den)"
    ).fetchone()
    assert nv is None
