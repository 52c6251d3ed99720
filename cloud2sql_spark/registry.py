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
    "cloud2sql_spark.queries.text",
    "cloud2sql_spark.queries.multimodal",
]

_loaded = False


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
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
