"""Query/oracle registry.

Every operator from SURVEY.md §2 Part B registers here as a pair:

- a PySpark callable ``(spark, sf_dir) -> DataFrame``
- an equivalent DuckDB SQL string (the oracle), or ``None`` for operators
  that are not SQL-expressible (streaming stateful ops, LSH approximations) —
  those get a weaker rows-only check from the driver.

The driver contract (/root/repo/__spark_entry__.py) re-exports ``queries()``
and ``oracle_sql()`` from here. Column names are aliased identically on both
sides; double aggregates are wrapped in round(x, 2) on both sides so the
order-insensitive value-hash matches across engines.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules whose import registers queries. Kept explicit so a syntax error in
# one family is easy to localize.
_QUERY_MODULES = [
    "cloud2sql_spark.queries.scans",
    "cloud2sql_spark.queries.filters",
    "cloud2sql_spark.queries.joins",
    "cloud2sql_spark.queries.aggregates",
    "cloud2sql_spark.queries.windows",
    "cloud2sql_spark.queries.sorts",
    "cloud2sql_spark.queries.setops",
    "cloud2sql_spark.queries.scalars",
    "cloud2sql_spark.queries.streaming",
    "cloud2sql_spark.queries.udx",
    "cloud2sql_spark.queries.extensions",
    "cloud2sql_spark.queries.curation",
    "cloud2sql_spark.queries.analytics",
    "cloud2sql_spark.queries.text",
    "cloud2sql_spark.queries.multimodal",
    "cloud2sql_spark.queries.embeddings",
    "cloud2sql_spark.queries.etl_surface",
    "cloud2sql_spark.queries.tpch",
    "cloud2sql_spark.queries.network",
    "cloud2sql_spark.queries.quality",
]

_loaded = False

# Driver-visible ordering. The driver's CORRECTNESS file records only the
# FIRST 50 registered keys per round, so dict order decides which operators
# get the hard driver-vs-DuckDB signal each round. ROTATION POLICY
# (standing, VERDICT r06 item 1) — each round _PRIORITY is rebuilt as:
#   1. keys with a RED driver row (repair + re-prove first);
#   2. keys whose implementation or oracle changed since their last green
#      driver row (a local contract pass is necessary but the driver's
#      vanilla-session run is the authoritative signal);
#   3. keys with NO driver row yet (new registrations, capped at the free
#      slot budget so every round covers 100% of what it registers);
#   4. stalest-first re-proofs: the keys whose most recent green row is
#      oldest (alphabetical within a round), filling every remaining slot.
# With 289 keys and 50 slots, rule 4 guarantees every key re-proves at
# least every ceil(289/50) = 6 rounds against the current fixture
# generation. Keys listed here come first (in this order); everything else
# follows in registration order. Unknown names are ignored, so the list
# may name ops before their module lands. `python scripts/rotation_plan.py
# <changed-key ...>` computes this list mechanically from the recorded
# CORRECTNESS_r*.json files (plus the free-slot budget for new
# registrations); rebuild it with that each round.
_PRIORITY = [
    "agg_global",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "join_broadcast_dim",
    "sink_parquet_snapshot",
    "events_daily_fill",
    "text_diversity",
    "agg_theil_index",
    "dedup_minhash_banding_curve",
    "agg_winsorized_stats",
    "embed_quantize",
    "sample_importance_reweight",
    "scan_csv_roundtrip",
    "sink_jdbc",
    "scan_jdbc",
    "scan_incremental_files",
    "scan_orc_roundtrip",
    "sink_partitioned_pruned",
    "scan_schema_evolution",
    "scan_binaryfile",
    "scan_csv_malformed",
    "scan_time_travel",
    "scan_snapshot_diff",
    "stream_foreach_jdbc",
    "stream_incremental_topk",
    "stream_cdc_upsert",
    "stream_exactly_once_sink",
    "dedup_prefix_norm",
    "agg_weighted_percentile",
    "text_repetition",
    "tpch_q1",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q18",
    "tpch_q19",
    "tpch_q21",
    "tpch_q22",
    "tpch_q4",
    "udtf_table_arg",
    "agg_ols_two_factor",
    "agg_skew_kurtosis",
    "dedup_media_phash",
    "embed_mips_topk",
    "events_anomaly_mad",
    "events_bot_regularity",
    "events_forecast_snaive",
]


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``key`` with an optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle.strip()
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
