"""B-7 set operations (SURVEY.md §2).

Reference analogue: per-collector outputs appended into shared tables
(cloud2sql/collect.py:191-196) is a bag union. The distinct variants add a
hash-distinct (shuffle on all columns) — at scale prefer UNION ALL plus a
keyed dedup when a natural key exists (see dedup_exact in extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


def _open_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )


def _big_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — duplicates preserved, no shuffle at all (unionByName is
    a pure plan concatenation)."""
    return _open_custkeys(spark, sf_dir).unionByName(_big_custkeys(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _open_custkeys(spark, sf_dir)
        .unionByName(_big_custkeys(spark, sf_dir))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having open orders AND some large order."""
    return _open_custkeys(spark, sf_dir).intersect(_big_custkeys(spark, sf_dir))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders but no large ones (set semantics)."""
    return _open_custkeys(spark, sf_dir).subtract(_big_custkeys(spark, sf_dir))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each custkey appears min(n_left,
    n_right) times. Spark plans this as a single hash aggregation over
    both inputs (counting per side), not a join — one shuffle on the
    value, duplicate multiplicity preserved."""
    return _open_custkeys(spark, sf_dir).intersectAll(
        _big_custkeys(spark, sf_dir)
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each custkey appears max(0, n_left -
    n_right) times. Same single-shuffle counted-aggregation plan as
    INTERSECT ALL."""
    return _open_custkeys(spark, sf_dir).exceptAll(_big_custkeys(spark, sf_dir))
