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
    "dedup_prefix_norm",
    "dedup_sorted_neighborhood",
    "multimodal_audio_peaks",
    "multimodal_audio_window",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_resize",
    "multimodal_scene_cut",
    "multimodal_silence_segments",
    "scan_binaryfile",
    "text_fingerprint",
    "text_lang_id",
    "events_hourly_profile",
    "events_interval_merge",
    "events_survival_table",
    "fn_uuid_deterministic",
    "graph_degree_assortativity",
    "graph_label_propagation",
    "join_multiway_star",
    "join_record_linkage",
    "join_temporal_foreign_key",
    "quality_drift_tv",
    "sample_contrastive_pairs",
    "scan_compaction_plan",
    "scan_merge_on_read",
    "sort_range_boundaries",
    "stream_interval_join_outer",
    "text_cross_source_overlap",
    "text_hashing_trick_features",
    "text_pmi_bigrams",
    "text_rake_keywords",
    "tpch_q11",
    "tpch_q16",
    "tpch_q2",
    "tpch_q20",
    "udtf_polymorphic",
    "win_conditional_streak_reset",
    "win_median_sliding",
    "win_running_distinct",
    "win_running_sum",
    "agg_count_distinct",
    "agg_stats",
    "dedup_ngram_jaccard",
    "embed_knn_graph",
    "events_rfm_segments",
    "filter_boolean",
    "filter_comparison",
    "filter_in_between_like",
    "filter_null",
    "graph_triangle_count",
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
