"""B-2 projections / filters / predicates (SURVEY.md §2).

The reference's analogues: derived analytics dict (collect.py:184,195-196)
for computed projections, None-propagation in value_in_path (util.py:11-17)
for null handling, dotted-path access (util.py:7-19) for nested projection.

All predicates here are Catalyst-pushable: comparisons, boolean algebra,
IN/BETWEEN/LIKE and null tests reach the parquet reader as PushedFilters, so
at 100 TB the scan skips row groups before any CPU is spent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


@register(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty,
           l_returnflag AS flag
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_returnflag").alias("flag"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(l_quantity * 2 AS DOUBLE) AS double_qty
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed expressions (reference analogue: derived analytics values,
    collect.py:184,195-196). Money products in DECIMAL for exact cross-engine
    equality."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (F.col("l_quantity") * 2).cast("double").alias("double_qty"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity < 24 AND l_extendedprice >= 10000 AND l_linenumber != 3
    ORDER BY l_orderkey, l_linenumber
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") < 24)
            & (F.col("l_extendedprice") >= 10000)
            & (F.col("l_linenumber") != 3)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_boolean",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 100000)
       OR (o_orderstatus = 'O' AND NOT o_totalprice > 50000)
    ORDER BY o_orderkey
    """,
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
            | ((F.col("o_orderstatus") == "O") & ~(F.col("o_totalprice") > 50000))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#13', 'Brand#20')
      AND p_size BETWEEN 5 AND 25
      AND p_type LIKE 'PRO%'
    ORDER BY p_partkey
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_brand").isin("Brand#1", "Brand#13", "Brand#20")
            & F.col("p_size").between(5, 25)
            & F.col("p_type").like("PRO%")
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "filter_null",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
    FROM orders
    WHERE nullif(o_orderstatus, 'O') IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL — reference analogue: None-soaked config handling
    (collect.py:76-78) and value_in_path None-propagation (util.py:11-17).
    Fixtures have no nulls, so nullif() synthesizes them."""
    orders = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        orders.select("o_orderkey", status_or_null.alias("status_or_null"))
        .filter(F.col("status_or_null").isNotNull())
        .orderBy("o_orderkey")
    )


@register(
    "project_nested_path",
    oracle="""
    SELECT c_custkey, c_name AS name, c_acctbal AS bal
    FROM customer ORDER BY c_custkey
    """,
)
def project_nested_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-path access into nested structs — the Spark-native form of the
    reference's value_in_path (cloud2sql/util.py:7-19): build a 2-level
    struct, then project ``a.b.c`` back out."""
    cust = load_table(spark, sf_dir, "customer")
    nested = cust.select(
        "c_custkey",
        F.struct(
            F.struct(
                F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")
            ).alias("profile")
        ).alias("payload"),
    )
    return nested.select(
        "c_custkey",
        F.col("payload.profile.name").alias("name"),
        F.col("payload.profile.bal").alias("bal"),
    ).orderBy("c_custkey")


@register(
    "subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery via Spark SQL — exercises Catalyst's
    RewritePredicateSubquery (EXISTS -> left-semi join), the declarative
    form users write; join_semi is the same physical shape expressed with
    the DataFrame API."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders above 90% of the max order
    total. max() is order-insensitive and 0.9*x is one IEEE multiply, so
    the threshold is bit-identical across engines (an avg() here would
    diverge on float summation order). Catalyst plans the subquery as a
    broadcast scalar."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
        """
    )
