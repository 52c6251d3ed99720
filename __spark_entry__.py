"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`cloud2sql_spark` — the engine package in this repo.
``entry`` runs the flagship pricing-summary query (TPC-H Q1 shape) at
sf0.001; ``queries()`` / ``oracle_sql()`` re-export the operator registry
(one entry per SURVEY.md §2 Part B key).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud2sql_spark.registry import oracle_sql as _oracle_sql
from cloud2sql_spark.registry import queries as _queries
from cloud2sql_spark.queries.aggregates import pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible key in ``queries()``."""
    return _oracle_sql()
