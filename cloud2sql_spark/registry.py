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
    "agg_winsorized_stats",
    "events_anomaly_mad",
    "events_concurrency_sweep",
    "events_ewma",
    "sort_range_boundaries",
    "win_median_sliding",
    "dedup_embed_cosine",
    "embed_covariance_gram",
    "embed_dim_stats",
    "embed_knn_graph",
    "embed_whitening_stats",
    "sample_contrastive_pairs",
    "sim_search_lsh",
    "join_anti",
    "join_asof",
    "join_cross",
    "join_full",
    "join_inner_equi",
    "join_left",
    "join_right",
    "join_self_edges",
    "join_semi",
    "join_skew_salted",
    "limit_topk",
    "profile_table",
    "project_computed",
    "project_nested_path",
    "project_select",
    "sample_curriculum",
    "scan_json_props",
    "scan_parquet",
    "scan_parquet_pruned",
    "set_union_all",
    "set_union_distinct",
    "sort_multikey",
    "topk_per_group",
    "win_first_last",
    "agg_approx_distinct",
    "agg_collect",
    "dedup_cluster_cc",
    "dedup_containment",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_ngram_capped",
    "dedup_simhash",
    "fn_array",
    "fn_cond",
    "fn_date",
    "fn_json",
    "fn_map",
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
