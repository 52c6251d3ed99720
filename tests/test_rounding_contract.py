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
    # round-11 conversions (the five r10-deferred sites, VERDICT item 2)
    "tpch_q8": 1,                      # mkt_share
    "tpch_q14": 1,                     # promo_pct
    "tpch_q17": 1,                     # avg_yearly
    "sample_temperature": 1,           # sample_weight
    "sample_dedup_weighted": 1,        # train_weight
    # converted mid-r11: the composed perturbation x multi-split probe
    # FALSIFIED its "P(boundary) < 1e-4" exemption empirically (money x3
    # perturbed sf0.01 lands a nation's mean gap exactly on a half:
    # Spark 8063.82 vs DuckDB 8063.81)
    "join_theta_range": 1,             # avg_gap
    # round-12 conversions: the ENTIRE remaining probabilistic exempt
    # list (VERDICT r11 item 2) — each proven value-preserving by
    # pre/post output hashes on the live fixtures
    "text_diversity": 3,               # simpson, hapax_ratio, ttr
    "agg_theil_index": 1,              # theil_t (final Σq/(n·1e9))
    "dedup_minhash_banding_curve": 1,  # expected_recall
    "agg_winsorized_stats": 1,         # winsor_mean (std is sqrt-class)
    "embed_quantize": 1,               # mean_abs_err (exact int units)
}

# keys whose money sums must ride exact DECIMAL(18,2) aggregation (the
# round-12 conversion of the round(sum(raw_double_money), 2) family —
# raw float sums are partition-combine-order dependent past ~1e10 rows)
_DECIMAL_SUM_FAMILY = [
    "agg_global",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "join_broadcast_dim",
    "sink_parquet_snapshot",
    "events_daily_fill",
]

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


def test_money_sum_family_rides_decimal_sums():
    """The round-12 DECIMAL(18,2)-sum conversions must not revert to
    round(sum(double), 2): the raw-double form combines floats in
    partition order, which past ~1e10 rows drifts across the cent grid
    and re-rolls the cross-engine round() half-boundary."""
    qs, ors = queries(), oracle_sql()
    for key in _DECIMAL_SUM_FAMILY:
        sql = ors[key]
        assert "AS DECIMAL(18,2))" in sql, (
            f"{key}'s oracle lost the exact DECIMAL(18,2) sum"
        )
        assert "round(sum(" not in sql.lower().replace(" ", ""), (
            f"{key}'s oracle reverted to round(sum(...), 2)"
        )
        src = inspect.getsource(inspect.unwrap(qs[key]))
        assert (
            'cast("decimal(18,2)")' in src  # DataFrame-API form
            or "AS DECIMAL(18,2))" in src  # spark.sql form
        ), f"{key}'s Spark side lost the DECIMAL(18,2) sum"


def test_importance_reweight_q_is_exact_integer_division():
    """sample_importance_reweight's q quantization was the last
    probabilistic round() exemption; it now floor-divides exact
    integers on both engines. Spark must NOT use `div` for it — `div`
    returns LONG and silently clamps q's documented >int64 headroom
    (minority language in a billions-of-docs corpus); the exact
    remainder-subtract decimal division is the required form."""
    sql = oracle_sql()["sample_importance_reweight"]
    assert "// (2 * CAST(t.k AS HUGEINT)" in sql.replace("\n", " ").replace(
        "  ", " "
    ) or "//" in sql, "oracle q lost its exact integer division"
    assert "round(CAST(e.n AS DOUBLE)" not in sql, (
        "oracle q reverted to the float quantization"
    )
    src = inspect.getsource(
        inspect.unwrap(queries()["sample_importance_reweight"])
    )
    assert "_qnumx % _qden2" in src, (
        "Spark q lost the exact remainder-subtract division"
    )
    assert "F.round(" not in src.split("_qnumx")[1].split("sum_q")[0], (
        "a float round crept back into the q path"
    )


def test_boundary_free_exemptions_pin_their_premises():
    """rounding.py's not-converted list exempts win_moving_avg and
    fn_try_arith from conversion by a 2-adic-valuation proof: round(S/d,
    k) over integer S can land on a half only if v2(d) >= v2(2*10^k),
    i.e. only if 2*S*10^k/d can be an ODD integer. The proof is only as
    good as its premises — the actual frame width / divisor set in the
    query code — so pin them here: if the frame ever widens to 8 rows
    (v2 = 3 = v2(200)) or the divisor mod changes, this test fails
    before the sf sweep can go red on a regenerated fixture (VERDICT r10
    residual #1: the prose previously claimed a <=4-row frame while the
    code had 7)."""

    def v2(n: int) -> int:
        c = 0
        while n % 2 == 0:
            n //= 2
            c += 1
        return c

    qs, ors = queries(), oracle_sql()

    # win_moving_avg: 7-row frame -> divisors (frame sizes) 1..7, grid 200
    src = inspect.getsource(inspect.unwrap(qs["win_moving_avg"]))
    assert ".rowsBetween(-6, 0)" in src, "frame width changed — re-audit"
    assert "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW" in ors["win_moving_avg"]
    for size in range(1, 8):
        assert v2(size) < v2(200), size  # v2(200)=3; sizes 1..7 have <=2
    assert v2(8) == v2(200)  # a size-8 frame WOULD reach the boundary

    # fn_try_arith: divisors user_id % 5 in {1..4}, 6-decimal grid 2*10^6
    src = inspect.getsource(inspect.unwrap(qs["fn_try_arith"]))
    assert '% 5' in src and '% 5' in ors["fn_try_arith"], (
        "divisor set changed — re-audit the exemption"
    )
    for d in range(1, 5):
        assert v2(d) < v2(2 * 10**6), d  # v2 <= 2 < 7


def test_embed_quantize_qv_grid_premise():
    """embed_quantize's qv = round(x·127/max_abs, 0) stays on the engine
    round() because the exact rational's half-boundary grid spacing
    1/(2·max_abs) dwarfs double error (~6e-14 at |value| <= 127): the
    double is either EXACTLY z.5 (both engines round away from zero) or
    too far from the half for a shortest-repr straddle. That argument
    needs max_abs << 5e12; pin a wide margin on the live fixtures so a
    regenerated corpus with wildly rescaled embeddings re-audits instead
    of silently thinning the margin."""
    import os

    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        (max_abs,) = con.execute(
            "SELECT max(list_max(list_transform(embedding, "
            "x -> abs(CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)"
            ")))) FROM read_parquet(?)",
            [path],
        ).fetchone()
        con.close()
        assert max_abs is not None and max_abs < 10**9, (sf, max_abs)


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
