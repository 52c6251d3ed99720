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
    # Round 7 slot plan: 0 reds, 0 never-tested. Slots 1-10 (rule 2): keys
    # changed this round — agg_theil_index (nano-sum widened to
    # DECIMAL(38,0) both engines, ADVICE r06), embed_knn_graph (md5-rank
    # per-bucket candidate cap, mirrored in the oracle),
    # events_rfm_segments + sample_curriculum (approx-ntile scale branch;
    # exact default unchanged), scan_rowgroup_stats (age-gated fixture
    # reaping, ADVICE r06), graph_triangle_count (opt-in degree
    # orientation; id-oriented default unchanged), profile_table (opt-in
    # approx-distinct profiling; exact default unchanged),
    # dedup_ngram_jaccard + dedup_minhash_banding_curve (opt-in AllPairs
    # prefix filter in the shared _exact_jaccard_pairs helper;
    # inverted-index default unchanged), dedup_sorted_neighborhood
    # (lead() now carries the neighbor's shingle array — verification
    # happens on the window output, the two shingle-frame joins are
    # gone). Slots 11-50 (rule 4): the first 40 of the 45 keys whose
    # only green row is round 1 — five fixture generations old. The five
    # displaced r01 keys (win_lag_lead, win_moving_avg, win_range_frame,
    # win_rank_dense, win_row_number — kept listed below; the driver
    # takes the first 50, ending at win_first_last) plus the 49
    # r02-stale keys rotate in next round.
    "agg_theil_index",
    "embed_knn_graph",
    "events_rfm_segments",
    "sample_curriculum",
    "scan_rowgroup_stats",
    "graph_triangle_count",
    "profile_table",
    "dedup_ngram_jaccard",
    "dedup_minhash_banding_curve",
    "dedup_sorted_neighborhood",
    "agg_count_distinct",
    "agg_cube",
    "agg_global",
    "agg_grouping_sets",
    "agg_having",
    "agg_rollup",
    "agg_stats",
    "filter_boolean",
    "filter_comparison",
    "filter_in_between_like",
    "filter_null",
    "join_anti",
    "join_asof",
    "join_broadcast_dim",
    "join_cross",
    "join_full",
    "join_inner_equi",
    "join_left",
    "join_right",
    "join_self_edges",
    "join_semi",
    "join_skew_salted",
    "join_theta_range",
    "limit_topk",
    "project_computed",
    "project_nested_path",
    "project_select",
    "scan_csv_roundtrip",
    "scan_jdbc",
    "scan_json_props",
    "scan_parquet",
    "scan_parquet_pruned",
    "set_union_all",
    "set_union_distinct",
    "sink_bucketed_join",
    "sink_jdbc",
    "sink_parquet_snapshot",
    "sort_multikey",
    "topk_per_group",
    "win_first_last",
    "win_lag_lead",
    "win_moving_avg",
    "win_range_frame",
    "win_rank_dense",
    "win_row_number",
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
