"""B-6 sorts / limits / top-k (SURVEY.md §2).

Scale notes: a global ORDER BY is a range-partitioned sort (Spark samples
key ranges, then sorts each range partition — no single-node sort);
``orderBy().limit(k)`` compiles to TakeOrderedAndProject, which keeps only
k rows per partition and merges heaps on the driver — O(k) memory, no full
sort, no full shuffle. Per-group top-k uses one windowed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


@register(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           nullif(o_orderpriority, '4-NOT SPECIFIED') AS priority
    FROM orders
    ORDER BY priority ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY with explicit null placement ('4-NOT
    SPECIFIED' mapped to NULL to exercise NULLS FIRST)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias("priority"),
    ).orderBy(
        F.col("priority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a total order (tie-broken on o_orderkey, so the
    25-row set is unique). Physical plan: TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT n_name, s_suppkey, s_acctbal FROM (
      SELECT n.n_name, s.s_suppkey, s.s_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
    WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers by balance per nation: broadcast dim join + one
    windowed shuffle on the group key."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("n_name", "s_suppkey", "s_acctbal")
    )


@register(
    "sort_zorder_cluster",
    oracle="""
    WITH xy AS (SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
                FROM lineitem),
    z AS (SELECT x, y,
                 CAST(list_sum(
                     [((x >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
                      + ((y >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1))
                      for i in range(0, 16)]) AS BIGINT) AS zval
          FROM xy)
    SELECT zval >> 22 AS z_bucket,
           count(*) AS n_rows,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM z
    GROUP BY zval >> 22
    """,
)
def sort_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering: interleave the bits of two sort keys
    into one value so range-partitioning on it gives every bucket
    LOCALITY IN BOTH dimensions — the lakehouse layout trick (Delta
    OPTIMIZE ZORDER BY, Hudi clustering) that lets min/max file stats
    prune scans on either column. Emitted per top-10-bit bucket:
    row count and both key ranges, which show each bucket covering a
    small tile of the (partkey, suppkey) plane rather than a full
    stripe of one dimension.

    The interleave is an exact integer fold (bit shifts and adds —
    bit-identical in both engines); the bucket aggregate is one keyed
    groupBy with map-side combine over ≤1024 keys. At 100 TB the same
    zval feeds repartitionByRange before the write, and the bucket
    stats here are exactly the file-level min/max a reader would prune
    on."""
    li = load_table(spark, sf_dir, "lineitem")
    xy = li.select(
        (F.col("l_partkey") % 65536).alias("x"),
        (F.col("l_suppkey") % 65536).alias("y"),
    )

    def spread(col):
        # Magic-number bit spread (abcd -> 0a0b0c0d), the standard Morton
        # encoding: 8 shift/mask ops fully inside whole-stage codegen. The
        # equivalent 16-round higher-order fold is interpreted per row and
        # measured 7x slower at sf0.1.
        v = F.col(col).cast("long")
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)):
            v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
        return v

    zval = spread("x").bitwiseOR(F.shiftleft(spread("y"), 1))
    z = xy.select("x", "y", zval.alias("zval"))
    return (
        z.groupBy(F.shiftright("zval", 22).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


@register(
    "sort_range_boundaries",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    h AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS cnt
      FROM c GROUP BY cents),
    cum AS (
      SELECT cents, cnt,
             sum(cnt) OVER (ORDER BY cents) AS below_incl,
             CAST((SELECT count(*) FROM c) AS BIGINT) AS n
      FROM h),
    b AS (
      SELECT k.k, min(cum.cents) AS boundary_cents
      FROM (SELECT unnest(range(1, 32)) AS k) k
      JOIN cum ON cum.below_incl * 32 >= k.k * cum.n
      GROUP BY k.k)
    SELECT CAST(b.k AS INT) AS k, b.boundary_cents,
           CAST(min(cum.below_incl) AS BIGINT) AS rows_at_or_below
    FROM b JOIN cum ON cum.cents = b.boundary_cents
    GROUP BY b.k, b.boundary_cents
    """,
)
def sort_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner planning — the exact split-point computation
    behind a balanced 32-way global sort (what RangePartitioner
    approximates by sampling): boundary k is the smallest key whose
    inclusive rank covers k/32 of the rows. The 100 TB trick is that
    the single-partition cumulative window never sees the fact table —
    the facts collapse into a bounded DISTINCT-KEY HISTOGRAM first
    (map-side-combined groupBy; the cents domain is bounded), and only
    that histogram flows through the global cumsum. For unbounded key
    domains production falls back to reservoir-sampled quantiles; for
    bounded/low-cardinality keys this exact plan is strictly better —
    and deterministic, so it oracle-checks. Output: 31 split points
    with their exact inclusive ranks (integer cross-multiplied rank
    test — no division)."""
    ev = load_table(spark, sf_dir, "events")
    # a NULL key is not a range boundary candidate: drop it on both
    # engines (r14 NULL-probe class — the NULL histogram group otherwise
    # ranks NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting
    # every cumulative rank)
    c = ev.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents")
    )
    h = c.groupBy("cents").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    n1 = F.broadcast(c.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    cum = h.select(
        "cents",
        F.sum("cnt").over(Window.orderBy("cents")).alias("below_incl"),
    ).join(n1)
    ks = F.broadcast(
        spark.range(1, 32).select(F.col("id").cast("int").alias("k"))
    )
    qualifying = cum.join(
        ks, F.col("below_incl") * 32 >= F.col("k") * F.col("n")
    )
    b = qualifying.groupBy("k").agg(F.min("cents").alias("boundary_cents"))
    return (
        b.join(cum.select("cents", "below_incl"),
               b.boundary_cents == F.col("cents"))
        .groupBy("k", "boundary_cents")
        .agg(F.min("below_incl").cast("bigint").alias("rows_at_or_below"))
        .select(F.col("k").cast("int").alias("k"), "boundary_cents",
                "rows_at_or_below")
    )
