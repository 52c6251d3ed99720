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
    # Round 9 slot plan (computed by `python scripts/rotation_plan.py
    # graph_kcore_peel embed_dim_stats embed_whitening_stats
    # win_moving_avg`): 0 reds, 0 never-tested. Slots 1-4 (rule 2):
    # keys whose implementation changed this round — graph_kcore_peel
    # (folded stats aggregate + literal trace frame; output oracle-
    # identical, adjudication in the function docstring),
    # embed_dim_stats / embed_whitening_stats (mean rounding moved to
    # exact integer half-away arithmetic in BOTH engines after the
    # sf0.1 oracle sweep caught the cross-engine round() half-boundary
    # on two dims), and win_moving_avg (l_quantity appended to the
    # window order — the r09 fixture samples lineitem with replacement,
    # so (orderkey, linenumber) ties made the ROWS frame
    # nondeterministic; all four re-proven at sf0.001/0.01/0.1 +
    # perturbed, win_moving_avg 3× back-to-back stable). The other code
    # edits build bit-identical default plans (_capped_sr_meta's token
    # index moved inside the unflagged branch, _track bound/log
    # bookkeeping, truncate_lineage reading its flag via flag_enabled
    # instead of a raw environ get) and do not consume rule-2 slots
    # (the r08 precedent). Slots 5-9 (rule 4): the five r02-stale
    # udf/udtf keys — the whole remaining staleness tail from VERDICT
    # r08 item 1. Slots 10-50: the first 41 of the 48 r03-stale keys
    # (alphabetical); the remaining six (subquery_exists,
    # subquery_scalar, text_normalize, text_top_ngrams,
    # win_ntile_percent, win_pattern_match) stay r03 and queue first
    # next round — after this round no key's latest green row is older
    # than r03, the VERDICT r08 target.
    "graph_kcore_peel",
    "embed_dim_stats",
    "embed_whitening_stats",
    "win_moving_avg",
    "udf_grouped_map",
    "udf_pandas_scalar",
    "udf_python",
    "udtf_python",
    "udtf_python_native",
    "agg_approx_quantile",
    "agg_bool_bitwise",
    "agg_corr_regr",
    "agg_freq_items",
    "agg_mode",
    "agg_percentile_exact",
    "agg_pivot",
    "agg_string_agg",
    "agg_unpivot",
    "dedup_apply",
    "dedup_prefix_norm",
    "embed_kmeans_assign",
    "embed_normalize",
    "events_anomaly_zscore",
    "events_funnel",
    "events_path_transitions",
    "events_retention",
    "events_rolling_dau",
    "events_rollup_time",
    "events_sessionize",
    "fn_bitwise",
    "fn_explode_lateral",
    "fn_format",
    "fn_hash",
    "fn_interval_arith",
    "fn_regex",
    "fn_struct",
    "fn_url_parse",
    "graph_degree",
    "join_bloom_pruned",
    "join_interval_overlap",
    "multimodal_resize",
    "pipeline_curate_pack",
    "sample_hash_consistent",
    "sample_mixture",
    "sample_weighted",
    "scan_incremental_files",
    "scan_orc_roundtrip",
    "set_except_all",
    "set_intersect_all",
    "sink_partitioned_pruned",
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
