"""B-3 joins (SURVEY.md §2).

The reference's exported schema *forces* joins as the canonical read pattern:
facts↔dims via keys and resource↔resource traversal via ``link_<from>_<to>``
tables (reference tests/collect_test.py:33-39 — even the minimal example
graph has 7 link tables). The reference delegates execution to the
destination SQL engine (README.md:221-224); here Catalyst executes them.

Scale notes (100 TB posture):

- Bounded dims (region 5 rows, nation 25) are explicitly ``F.broadcast`` —
  no shuffle of the fact side, at any scale.
- Fact↔fact equi-joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew splitting and converts to broadcast when a filtered side
  turns out small at runtime.
- The as-of join is the single-shuffle window formulation (sort within
  user partitions + running last-value), NOT a per-row range join —
  O(n log n) per partition and no candidate explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.queries.rounding import (
    ratio_round_oracle,
    ratio_round_spark,
)
from cloud2sql_spark.registry import register


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join orders⋈customer. Catalyst picks broadcast-hash or
    sort-merge from sizes; AQE may switch at runtime."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the bounded dims — the fact side never shuffles for the
    join; only the tiny group-by keys shuffle after partial aggregation.
    Balance totals sum in DECIMAL(18,2) — exact on 2-decimal sources at
    any row count, where the prior round(sum(double),2) was partition-
    combine-order dependent past ~1e10 rows (queries/rounding.py,
    converted round 12)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "join_multiway_star",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join — the link-table traversal pattern
    (reference tests/collect_test.py:33-39). The two fact tables join on
    l_orderkey after the orders side is cut down by the pushed-down date
    filter; dims broadcast so the only real shuffle is lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, with their very large orders or NULLs."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: all nations, with suppliers or NULLs (supplier covers
    only a subset of nations in the fixtures)."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supplier.join(nation, supplier.s_nationkey == nation.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_nationkey", "n_name"
    )


@register(
    "join_full",
    oracle="""
    SELECT coalesce(cs.nk, ss.nk) AS nationkey, cs.n_customers, ss.n_suppliers
    FROM (SELECT c_nationkey AS nk, count(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cs
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) ss
      ON cs.nk = ss.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two aggregates with partially-overlapping keys."""
    cs = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    ss = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cs.join(ss, cs.nk == ss.nk, "full").select(
        F.coalesce(cs.nk, ss.nk).alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — left-semi join: customer rows pass through at most once,
    no duplication from the probe side (unlike inner join + distinct)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT p.p_partkey, p.p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left-anti join: parts never ordered in bulk."""
    part = load_table(spark, sf_dir, "part")
    bulk = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, seg.c_mktsegment
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two bounded inputs (5 regions × 5 segments).
    Cross joins are only ever used dim×dim; fact-side cartesians are
    structurally avoided (LSH for similarity, window for as-of)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    segments = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return region.crossJoin(segments)


@register(
    "join_theta_range",
    oracle=f"""
    SELECT s.s_nationkey, count(*) AS n_pairs,
           {ratio_round_oracle(
               "sum(CAST(round(s.s_acctbal * 100) AS BIGINT)"
               " - CAST(round(c.c_acctbal * 100) AS BIGINT))",
               "count(*) * 100",
               2,
           )} AS avg_gap
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nation) + range predicate (acctbal). Catalyst
    executes it as a hash join on the equi part with the range condition as
    a post-join filter — no nested-loop explosion.

    avg_gap rounds through exact integer arithmetic
    (queries/rounding.py, converted r11): acctbals are exact 2-decimal
    money, so the pair-gap mean is (sum of cent gaps)/(100·n) — an
    exact integer ratio, previously on plain round() under the audit's
    "unstructured denominator, P(boundary) < 1e-4" exemption. The r11
    composed perturbation×multi-split probe FALSIFIED that exemption
    empirically: the money-×3 perturbed sf0.01 corpus lands one
    nation's mean exactly on a half (Spark 8063.82 vs DuckDB 8063.81),
    so the site converts per the convert-when-touched policy."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    return (
        supplier.join(
            customer,
            (supplier.s_nationkey == customer.c_nationkey)
            & (supplier.s_acctbal > customer.c_acctbal),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.expr("CAST(round(s_acctbal * 100) AS BIGINT)")
                - F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
            ).alias("_gap_cents"),
        )
        .select(
            "s_nationkey",
            "n_pairs",
            F.expr(
                ratio_round_spark("_gap_cents", "n_pairs * 100", 2)
            ).alias("avg_gap"),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           round(c.value, 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest strictly-prior
    click (reference has no such operator; SURVEY §4.2(3) custom work).

    Spark-first formulation: one shuffle by user_id, sort by ts within the
    partition, and a running ``max(click struct)`` over a RANGE frame ending
    strictly before the current timestamp — O(n log n), no range-join
    candidate explosion, works unchanged at 100 TB because state per user is
    one struct. DuckDB verifies with its native ASOF JOIN.

    The frame is rangeBetween over unix microseconds ending at -1, not a
    rowsBetween(-1): a ROWS frame ordered by (ts, event_id) would admit a
    same-timestamp click whose event_id sorts earlier, diverging from the
    oracle's strict ``p.ts > c.ts`` (ADVICE r1). The RANGE frame excludes
    every tied row; max(struct(ts, event_id, value)) then picks the latest
    strictly-prior click deterministically (largest event_id on ts ties).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    click = F.when(
        F.col("event_type") == "click", F.struct("ts", "event_id", "value")
    )
    return (
        ev.withColumn("prev_click", F.max(click).over(w))
        .filter((F.col("event_type") == "purchase") & F.col("prev_click").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("prev_click.ts").alias("click_ts"),
            F.round("prev_click.value", 2).alias("click_value"),
        )
    )


@register(
    "join_self_edges",
    oracle="""
    SELECT e1.from_id AS nationkey, count(*) AS n_orders_2hop
    FROM (SELECT c_nationkey AS from_id, c_custkey AS to_id FROM customer) e1
    JOIN (SELECT o_custkey AS from_id, o_orderkey AS to_id FROM orders) e2
      ON e1.to_id = e2.from_id
    GROUP BY e1.from_id
    """,
)
def join_self_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop edge traversal — the reference's core read pattern over
    ``link_<from>_<to>`` tables (tests/collect_test.py:33-39): build edge
    sets (nation→customer, customer→order) and chain them e1.to==e2.from.
    At scale both edge lists shuffle on the shared hop key only."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    e1 = customer.select(
        F.col("c_nationkey").alias("from_id"), F.col("c_custkey").alias("to_id")
    )
    e2 = orders.select(
        F.col("o_custkey").alias("from_id"), F.col("o_orderkey").alias("to_id")
    )
    return (
        e1.join(e2, e1.to_id == e2.from_id)
        .groupBy(e1.from_id.alias("nationkey"))
        .agg(F.count("*").alias("n_orders_2hop"))
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH t AS (SELECT l_returnflag,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS flag_total
               FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag, l.l_linestatus,
           count(*) AS n,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / max(t.flag_total) * 100, 6) AS pct_of_flag
    FROM lineitem l JOIN t ON l.l_returnflag = t.l_returnflag
    GROUP BY l.l_returnflag, l.l_linestatus
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join against a hot-key dimension: l_returnflag has 3 distinct
    values, so a plain shuffle join lands the whole fact table on 3
    reducers. The fact side gets a deterministic salt (l_orderkey % 16)
    and the dim side is exploded over all 16 salts, turning 3 hot
    partitions into 48 uniform ones — result identical to the unsalted
    join (the oracle IS the unsalted join). Salting is the key-space fix
    for skew a runtime re-plan can't touch (one key bigger than an
    executor); AQE's skewJoin handles the milder split-a-big-partition
    case automatically. The merge hint forces the shuffle join that makes
    the demonstration real — at scale the dim is too big to broadcast.
    """
    n_salts = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        (F.col("l_orderkey") % n_salts).cast("int").alias("salt"),
    )
    totals = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("flag_total")
        )
    )
    salted_dim = totals.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        li.hint("merge")
        .join(salted_dim, ["l_returnflag", "salt"])
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum("price").cast("double") / F.max("flag_total") * 100, 6
            ).alias("pct_of_flag"),
        )
    )


@register(
    "join_bloom_pruned",
    oracle="""
    SELECT p.p_type,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
    GROUP BY p.p_type
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension join in the runtime-filter shape: the filtered
    build side (one brand, ~1/25 of part) is exactly what Spark's
    InjectRuntimeFilter turns into a bloom filter / semi-join pushdown on
    the fact scan, eliminating ~96% of lineitem rows BEFORE the join.
    On a cluster the enabling confs are
    spark.sql.optimizer.runtime.bloomFilter.enabled=true (default 3.3+)
    with creation/application size thresholds sized to the dim/fact; at
    test scale the application-side threshold (10GB) keeps it off, so the
    plan test pins the SHUFFLE_HASH fallback instead. The hint avoids a
    sort on the fact side (hash build on the small filtered side)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    return (
        li.join(part.hint("SHUFFLE_HASH"), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT p.user_id, count(*) AS n_pairs
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY p.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (clicks within 1h after a purchase, per user),
    executed as a BINNED equality join: each purchase emits its covering
    hour bins (≤2 via sequence-explode), clicks key to their single bin,
    and the join runs on (user_id, bin) with the exact range predicate as
    a post-filter. A pair matches in exactly one bin (the click's), so no
    dedup is needed. This is the range-join-optimization shape: shuffle
    volume is O(rows·bins_per_interval), never the O(n·m) per-user
    nested loop a raw inequality join degrades to at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.expr("ts + INTERVAL 1 HOUR").alias("p_end"),
    )
    p_binned = purchases.select(
        "user_id",
        "p_ts",
        "p_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "p_ts"),
                F.date_trunc("hour", "p_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.date_trunc("hour", "ts").alias("bin"),
    )
    return (
        p_binned.join(clicks, ["user_id", "bin"])
        .filter((F.col("c_ts") >= F.col("p_ts")) & (F.col("c_ts") < F.col("p_end")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# Price tiers for join_range_bucketed: (tier, lo, hi) with hi exclusive.
# Bounds are multiples of the 5000 bucket step so each tier expands to an
# exact set of covered buckets.
_PRICE_TIERS = [
    ("budget", 0, 10_000),
    ("mid", 10_000, 30_000),
    ("premium", 30_000, 60_000),
    ("luxury", 60_000, 110_000),
]


@register(
    "join_range_bucketed",
    oracle="""
    WITH tiers(tier, lo, hi) AS (VALUES
        ('budget', 0, 10000), ('mid', 10000, 30000),
        ('premium', 30000, 60000), ('luxury', 60000, 110000))
    SELECT t.tier,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN tiers t
      ON l.l_extendedprice >= t.lo AND l.l_extendedprice < t.hi
    GROUP BY t.tier
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join executed as a BUCKETED EQUALITY join: each tier row
    expands to the fixed-width buckets it covers (sequence/explode on the
    tiny dim side only), the fact side computes floor(price/step) once,
    and the join is a broadcast hash join on the bucket id with the exact
    range predicate as a residual filter. A raw `lo <= x < hi` theta join
    is a broadcast nested loop — every fact row probes every tier; the
    bucket form keeps hash-join semantics and survives a dim side too big
    to broadcast (it shuffles on bucket). Same shape as
    join_interval_overlap's hour binning, over numeric ranges."""
    step = 5000
    li = load_table(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(_PRICE_TIERS, "tier STRING, lo INT, hi INT")
    # dim side: one row per covered bucket (hi is exclusive and
    # step-aligned, so the last bucket starts at hi - step)
    tier_buckets = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / step),
                F.floor((F.col("hi") - 1) / step),
            )
        ).alias("bucket"),
    )
    fact = li.select(
        "l_extendedprice",
        F.floor(F.col("l_extendedprice") / step).alias("bucket"),
    )
    joined = fact.join(F.broadcast(tier_buckets), "bucket").filter(
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi"))
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "join_fuzzy_edit",
    oracle="""
    WITH names AS (
      SELECT p_name, count(*) AS cnt,
             string_split(p_name, ' ')[-1] AS noun
      FROM part GROUP BY p_name),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
             a.cnt * b.cnt AS n_pairs
      FROM names a JOIN names b
        ON a.noun = b.noun AND a.p_name < b.p_name)
    SELECT name_a, name_b, dist, n_pairs
    FROM pairs WHERE dist <= 2
    """,
)
def join_fuzzy_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join on part names (edit distance <= 2) done at the
    VOCABULARY level: names dedupe to a tiny dim first (62 distinct names
    regardless of fact rows), candidate pairs come from an equality join
    on a blocking key (the trailing noun token), and levenshtein runs
    only on blocked candidates — never corpus x corpus. n_pairs = cnt_a *
    cnt_b recovers the row-level pair count arithmetically. At 100 TB the
    vocab stays broadcast-size while the fact side is touched once by the
    groupBy; the naive formulation (levenshtein as a theta-join predicate
    over facts) is a nested-loop cross product."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    names = names.withColumn(
        "noun", F.element_at(F.split("p_name", " "), -1)
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        "noun",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        "noun",
    )
    pairs = a.join(F.broadcast(b), "noun").filter(F.col("name_a") < F.col("name_b"))
    dist = F.levenshtein("name_a", "name_b").cast("int")
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") <= 2)
        .select(
            "name_a",
            "name_b",
            "dist",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        )
    )


@register(
    "join_spatial_grid",
    oracle="""
    WITH cpts AS (
      SELECT c_custkey, (c_custkey * 2654435761) % 1000 AS x,
                        (c_custkey * 40503) % 1000 AS y
      FROM customer),
    spts AS (
      SELECT s_suppkey, (s_suppkey * 2654435761) % 1000 AS x,
                        (s_suppkey * 40503) % 1000 AS y
      FROM supplier)
    SELECT c.c_custkey, s.s_suppkey,
           (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2
    FROM cpts c JOIN spts s
      ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 2500
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join (points within 50 units on a 1000x1000 integer
    grid) executed as a GRID-CELL equality join: cell width = the radius,
    so every partner lies in the point's own or one of its 8 neighbor
    cells. The small side explodes to its 9 covering cells (bounded
    fan-out, map-side), the join is a plain hash join on (cx, cy), and
    the exact integer distance check is a residual filter — each
    qualifying pair is produced exactly once because the probe side joins
    only its home cell. Coordinates are synthesized by multiplicative
    hashing of the keys (pure BIGINT arithmetic, bit-identical across
    engines). The oracle is the brute-force theta join; the grid plan is
    what survives when both sides are too big for a nested loop."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cpts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 2654435761) % 1000).alias("x"),
        ((F.col("c_custkey") * 40503) % 1000).alias("y"),
    )
    spts = supp.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 2654435761) % 1000).alias("x"),
        ((F.col("s_suppkey") * 40503) % 1000).alias("y"),
    )
    # supplier side fans out to its 9 neighbor cells; customer probes its
    # own cell only, so no pair dedup is needed
    s9 = (
        spts.withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "s_suppkey",
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            (F.floor(F.col("x") / 50) + F.col("dx")).alias("cx"),
            (F.floor(F.col("y") / 50) + F.col("dy")).alias("cy"),
        )
    )
    cgrid = cpts.select(
        "c_custkey",
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.floor(F.col("x") / 50).alias("cx"),
        F.floor(F.col("y") / 50).alias("cy"),
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    return (
        cgrid.join(F.broadcast(s9), ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= 2500)
        .select("c_custkey", "s_suppkey", "d2")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH cb AS (
      SELECT c_custkey,
             CASE WHEN c_nationkey % 5 = 0 THEN NULL
                  ELSE c_nationkey % 5 END AS band
      FROM customer),
    sb AS (
      SELECT s_suppkey,
             CASE WHEN s_nationkey % 5 = 0 THEN NULL
                  ELSE s_nationkey % 5 END AS band
      FROM supplier)
    SELECT cb.band, count(*) AS n_pairs,
           count(DISTINCT cb.c_custkey) AS n_cust,
           count(DISTINCT sb.s_suppkey) AS n_supp
    FROM cb JOIN sb ON cb.band IS NOT DISTINCT FROM sb.band
    GROUP BY cb.band
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL bands
    match each other instead of vanishing, the semantics ETL needs when
    joining on optional attributes. Spark plans eqNullSafe as an ordinary
    hash join (the key is wrapped in a null-coalescing struct) — no
    nested loop, no NULL-row fallout to reconcile afterwards.

    The aggregates are computed per SIDE before the join: the band key
    has 5 values, so joining the raw tables materializes the full
    per-band cartesian (|C_b|·|S_b| rows — ~3M at sf0.1, quadratic in
    table size at any scale) only to count it. Every output is
    derivable from per-side band aggregates — n_pairs = n_c·n_s (each
    customer row meets every supplier row in its band), and a DISTINCT
    count over the pairs equals the side's own DISTINCT count because
    the join fans each key out verbatim — so the null-safe join runs
    over two ≤6-row aggregates and the pair stream never exists. Inner
    join semantics preserved: a band empty on either side drops in
    both shapes. The NULL row still proves the null-safe semantics —
    a plain equi-join would drop it."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    band = lambda col: F.when(col % 5 == 0, F.lit(None)).otherwise(col % 5)
    cagg = (
        cust.select("c_custkey", band(F.col("c_nationkey")).alias("band"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.count_distinct("c_custkey").alias("n_cust"),
        )
    )
    sagg = (
        supp.select("s_suppkey", band(F.col("s_nationkey")).alias("band_s"))
        .groupBy("band_s")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.count_distinct("s_suppkey").alias("n_supp"),
        )
    )
    return cagg.join(
        F.broadcast(sagg), cagg["band"].eqNullSafe(sagg["band_s"])
    ).select(
        "band",
        (F.col("n_c") * F.col("n_s")).alias("n_pairs"),
        "n_cust",
        "n_supp",
    )


# Shared by the forward and nearest as-of joins: the (purchase, click)
# event slice with exact epoch micros and the zero-padded (micros,
# event_id) candidate key whose lexicographic min/max is an
# engine-portable tie-break. One definition, used by both Spark
# functions and both oracle CTEs (_ASOF_CANDIDATES_SQL) — the four
# copies this replaces could silently diverge on pad width or separator.
_ASOF_CANDIDATES_SQL = """v AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
             CASE WHEN event_type = 'click'
                  THEN lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
                       lpad(CAST(event_id AS VARCHAR), 10, '0') END AS ck
      FROM events WHERE event_type IN ('purchase', 'click'))"""


def _asof_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, event_type, tus, ck) mirror of
    ``_ASOF_CANDIDATES_SQL``."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tus = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
    ck = F.when(
        F.col("event_type") == "click",
        F.concat(
            F.lpad(tus.cast("string"), 20, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        ),
    )
    return ev.select(
        "event_id", "user_id", "event_type", tus.alias("tus"), ck.alias("ck")
    )


@register(
    "join_asof_forward",
    oracle=f"""
    WITH {_ASOF_CANDIDATES_SQL}
    SELECT event_id, user_id,
           CAST(substr(nxt, 22, 10) AS BIGINT) AS next_click_id,
           CAST((CAST(substr(nxt, 1, 20) AS BIGINT) - tus) // 1000000
                AS BIGINT) AS gap_seconds
    FROM (
      SELECT *, min(ck) OVER (PARTITION BY user_id ORDER BY tus
                  RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING) AS nxt
      FROM v)
    WHERE event_type = 'purchase' AND nxt IS NOT NULL
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH tolerance (pandas merge_asof
    direction='forward' parity): each purchase matched to the user's
    EARLIEST click strictly after it but within one hour. The tolerance
    is built INTO the window frame — RANGE (1 FOLLOWING, 1h FOLLOWING)
    over exact epoch micros — so it never becomes an inequality join;
    like join_asof this is one shuffle + one sort with O(1) state per
    row. The match key is a zero-padded (micros, event_id) string: min()
    over it picks the earliest following click, ties on identical micros
    resolving to the smallest event_id IDENTICALLY in both engines
    (struct-min tie semantics would be Spark-private; lexicographic min
    over fixed-width digits is engine-portable arithmetic)."""
    v = _asof_candidates(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(1, 3_600_000_000)
    )
    return (
        v.withColumn("nxt", F.min("ck").over(w))
        .filter((F.col("event_type") == "purchase") & F.col("nxt").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.substring("nxt", 22, 10).cast("long").alias("next_click_id"),
            (
                (F.substring("nxt", 1, 20).cast("long") - F.col("tus"))
                / 1_000_000
            )
            .cast("long")
            .alias("gap_seconds"),
        )
    )


@register(
    "join_asof_nearest",
    oracle=f"""
    WITH {_ASOF_CANDIDATES_SQL},
    w AS (
      SELECT *,
             max(ck) OVER (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) AS bk,
             min(ck) OVER (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING) AS fw
      FROM v),
    g AS (
      SELECT event_id, user_id, tus, bk, fw,
             CASE WHEN bk IS NOT NULL
                  THEN tus - CAST(substr(bk, 1, 20) AS BIGINT) END AS bgap,
             CASE WHEN fw IS NOT NULL
                  THEN CAST(substr(fw, 1, 20) AS BIGINT) - tus END AS fgap
      FROM w WHERE event_type = 'purchase' AND (bk IS NOT NULL OR fw IS NOT NULL))
    SELECT event_id, user_id,
           CASE WHEN fgap IS NULL OR (bgap IS NOT NULL AND bgap <= fgap)
                THEN CAST(substr(bk, 22, 10) AS BIGINT)
                ELSE CAST(substr(fw, 22, 10) AS BIGINT) END AS click_id,
           CASE WHEN fgap IS NULL OR (bgap IS NOT NULL AND bgap <= fgap)
                THEN 'backward' ELSE 'forward' END AS direction,
           CAST((CASE WHEN fgap IS NULL OR (bgap IS NOT NULL AND bgap <= fgap)
                      THEN bgap ELSE fgap END) // 1000000 AS BIGINT)
               AS gap_seconds
    FROM g
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest' shape,
    ±1h tolerance, but with STRICT exclusive bounds like join_asof: a
    click at the exact purchase microsecond is excluded, where pandas'
    allow_exact_matches=True default would take it at distance 0): each
    purchase matched to the user's temporally closest click in either
    direction, ties resolved backward (the strictly-prior click wins an
    equal-distance race).

    Completes the as-of family (backward join_asof, forward
    join_asof_forward) with the same scale shape: both direction frames
    ride ONE (user_id, ts) sort — RANGE (1h PRECEDING, -1) for the
    latest prior and RANGE (+1, 1h FOLLOWING) for the earliest next —
    so Spark plans a single Exchange with two Window aggregates and O(1)
    state per row; no inequality join at any scale. Gap comparison and
    the tie rule are exact integer microsecond arithmetic, identical in
    both engines; candidate keys are the zero-padded (micros, event_id)
    strings join_asof_forward uses for engine-portable tie-breaks."""
    v = _asof_candidates(spark, sf_dir)
    hour = 3_600_000_000
    wb = Window.partitionBy("user_id").orderBy("tus").rangeBetween(-hour, -1)
    wf = Window.partitionBy("user_id").orderBy("tus").rangeBetween(1, hour)
    g = (
        v.withColumn("bk", F.max("ck").over(wb))
        .withColumn("fw", F.min("ck").over(wf))
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("bk").isNotNull() | F.col("fw").isNotNull())
        )
        .withColumn("bgap", F.col("tus") - F.substring("bk", 1, 20).cast("long"))
        .withColumn("fgap", F.substring("fw", 1, 20).cast("long") - F.col("tus"))
    )
    take_back = F.col("fgap").isNull() | (
        F.col("bgap").isNotNull() & (F.col("bgap") <= F.col("fgap"))
    )
    chosen = F.when(take_back, F.col("bk")).otherwise(F.col("fw"))
    gap = F.when(take_back, F.col("bgap")).otherwise(F.col("fgap"))
    return g.select(
        "event_id",
        "user_id",
        F.substring(chosen, 22, 10).cast("long").alias("click_id"),
        F.when(take_back, F.lit("backward")).otherwise(F.lit("forward")).alias(
            "direction"
        ),
        (gap / 1_000_000).cast("long").alias("gap_seconds"),
    )


@register(
    "join_scd2_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             DATE '1996-01-01' + CAST(c_custkey % 1000 AS INT) AS split_day
      FROM customer),
    versions AS (
      SELECT c_custkey, c_mktsegment, 'v1' AS version,
             DATE '1990-01-01' AS valid_from, split_day AS valid_to
      FROM dim
      UNION ALL
      SELECT c_custkey, c_mktsegment, 'v2',
             split_day, DATE '2999-12-31'
      FROM dim),
    pit AS (
      SELECT v.version, v.c_mktsegment
      FROM orders o
      JOIN versions v
        ON o.o_custkey = v.c_custkey
       AND CAST(o.o_orderdate AS DATE) >= v.valid_from
       AND CAST(o.o_orderdate AS DATE) < v.valid_to)
    SELECT version, c_mktsegment, count(*) AS n_orders
    FROM pit GROUP BY version, c_mktsegment
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD Type 2) point-in-time join — the
    warehouse pattern for 'which version of the customer was current when
    the order was placed'. The fixture carries no versioned dim, so a
    two-version history is synthesized deterministically (each customer's
    attributes roll over on a per-key split day); the fact then joins its
    dimension KEY with a residual validity-window predicate.

    Scale shape: this is an EQUI-join on the dimension key with a range
    filter applied to the matched rows — per-key fan-out is bounded by
    the version count (2 here, rarely >10 in practice), so the join
    never degenerates into the interval-join quadratic case and the
    optimizer keeps the hash/broadcast strategy of a plain dim join.
    Validity windows use half-open [from, to) date intervals — integer
    date arithmetic, no interval-constant hazards."""
    customer = load_table(spark, sf_dir, "customer")
    split_day = F.date_add(
        F.lit("1996-01-01").cast("date"),
        (F.col("c_custkey") % 1000).cast("int"),
    )
    dim = customer.select("c_custkey", "c_mktsegment", split_day.alias("split_day"))
    versions = dim.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(
            F.array(
                F.struct(
                    F.lit("v1").alias("version"),
                    F.lit("1990-01-01").cast("date").alias("valid_from"),
                    F.col("split_day").alias("valid_to"),
                ),
                F.struct(
                    F.lit("v2").alias("version"),
                    F.col("split_day").alias("valid_from"),
                    F.lit("2999-12-31").cast("date").alias("valid_to"),
                ),
            )
        ).alias("v"),
    ).select("c_custkey", "c_mktsegment", "v.version", "v.valid_from", "v.valid_to")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("o_day")
    )
    pit = orders.join(
        F.broadcast(versions),
        (orders.o_custkey == versions.c_custkey)
        & (F.col("o_day") >= F.col("valid_from"))
        & (F.col("o_day") < F.col("valid_to")),
    )
    return pit.groupBy("version", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "join_record_linkage",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS d_id,
             CASE c_custkey % 4
               WHEN 0 THEN upper(c_name)
               WHEN 1 THEN c_name
               WHEN 2 THEN replace(c_name, '#', '# ')
               ELSE 'Unknown-' || CAST(c_custkey AS VARCHAR) END AS d_name,
             CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY-TYPO'
                  ELSE c_mktsegment END AS d_segment,
             c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 50.0
                              ELSE 0.0 END AS d_acctbal
      FROM customer),
    db AS (SELECT *,
                  CAST(regexp_extract(d_name, '([0-9]+)', 1) AS BIGINT) % 499
                      AS blk,
                  lower(replace(d_name, ' ', '')) AS d_norm
           FROM dirty),
    cb AS (SELECT c_custkey, c_mktsegment, c_acctbal,
                  c_custkey % 499 AS blk,
                  lower(replace(c_name, ' ', '')) AS c_norm
           FROM customer),
    scored AS (
      SELECT db.d_id, cb.c_custkey,
             (CASE WHEN db.d_norm = cb.c_norm THEN 24 ELSE -5 END
              + CASE WHEN db.d_segment = cb.c_mktsegment THEN 8 ELSE -3 END
              + CASE WHEN abs(db.d_acctbal - cb.c_acctbal) <= 1.0 THEN 5
                     ELSE -2 END) AS score
      FROM db JOIN cb ON db.blk = cb.blk),
    best AS (
      SELECT d_id, c_custkey, score,
             row_number() OVER (PARTITION BY d_id
                                ORDER BY score DESC, c_custkey) AS rn
      FROM scored WHERE score >= 20)
    SELECT d_id, c_custkey AS linked_custkey, CAST(score AS INT) AS score
    FROM best WHERE rn = 1
    """,
)
def join_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (the Fellegi-Sunter shape): dirty
    records — synthesized deterministically from customer with case
    flips, whitespace injection, segment typos, balance drift, and an
    unmatchable 25% — link back to the clean table via BLOCKING +
    field-agreement scoring + best-match selection. Blocking on the
    digits-of-name mod 499 (never the true key) bounds candidate pairs
    to block-size x block-size instead of n²; agreement weights are
    integers (name +24/-5, segment +8/-3, balance-within-1.00 +5/-2)
    so scores are exact; threshold >= 20 forces name agreement; the
    winner per dirty record is (score desc, custkey) — deterministic.
    The balance comparison is exact because drift is +50.0 or 0.0 on
    identical doubles. One blocked equi-join + one per-record window."""
    customer = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dirty = customer.select(
        (k + 1000000).alias("d_id"),
        F.when(k % 4 == 0, F.upper("c_name"))
        .when(k % 4 == 1, F.col("c_name"))
        .when(k % 4 == 2, F.replace(F.col("c_name"), F.lit("#"), F.lit("# ")))
        .otherwise(F.concat(F.lit("Unknown-"), k.cast("string")))
        .alias("d_name"),
        F.when(k % 5 == 0, F.lit("MACHINERY-TYPO"))
        .otherwise(F.col("c_mktsegment"))
        .alias("d_segment"),
        (
            F.col("c_acctbal")
            + F.when(k % 7 == 0, F.lit(50.0)).otherwise(F.lit(0.0))
        ).alias("d_acctbal"),
    )
    db = dirty.select(
        "*",
        (F.regexp_extract("d_name", r"([0-9]+)", 1).cast("bigint") % 499).alias(
            "blk"
        ),
        F.lower(F.replace(F.col("d_name"), F.lit(" "), F.lit(""))).alias(
            "d_norm"
        ),
    )
    cb = customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        (k % 499).alias("blk"),
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit(""))).alias(
            "c_norm"
        ),
    )
    score = (
        F.when(F.col("d_norm") == F.col("c_norm"), 24).otherwise(-5)
        + F.when(F.col("d_segment") == F.col("c_mktsegment"), 8).otherwise(-3)
        + F.when(
            F.abs(F.col("d_acctbal") - F.col("c_acctbal")) <= 1.0, 5
        ).otherwise(-2)
    )
    scored = db.join(cb, "blk").select(
        "d_id", "c_custkey", score.alias("score")
    )
    w = Window.partitionBy("d_id").orderBy(F.col("score").desc(), "c_custkey")
    return (
        scored.filter(F.col("score") >= 20)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "d_id",
            F.col("c_custkey").alias("linked_custkey"),
            F.col("score").cast("int").alias("score"),
        )
    )


@register(
    "join_temporal_foreign_key",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'signup'
                  THEN CAST(CAST(round(value * 100, 0) AS BIGINT) % 3 AS INT)
             END AS tier,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_dim,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT) END AS cents
      FROM events WHERE event_type IN ('signup', 'purchase')),
    r AS (
      SELECT user_id, is_dim, cents,
             last_value(tier IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY ts, is_dim DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS effective_tier
      FROM u)
    SELECT effective_tier,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM r WHERE is_dim = 0 GROUP BY effective_tier
    """,
)
def join_temporal_foreign_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal foreign-key resolution WITHOUT a range join — each
    purchase resolves the plan tier set by the user's most recent
    signup at-or-before its timestamp (same-instant signup wins via the
    is_dim-first tie-break), the validity-interval FK lookup behind
    SCD-style dimensions. Instead of the O(|fact|·|versions|) ts <= ts
    inequality join, version and fact rows UNION into one stream and a
    single last_value(... IGNORE NULLS) window carries the tier forward
    — the merge-join-free as-of idiom that shuffles each row exactly
    once on user_id at any scale (the join_asof docstring's sort-merge
    alternative, taken to its no-join endpoint). Purchases before any
    signup report a NULL tier — the referential-integrity signal a
    temporal-FK audit exists to surface. Money is exact cents
    throughout."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", (cents % 3).cast("int")).alias(
            "tier"
        ),
        F.when(F.col("event_type") == "signup", 1).otherwise(0).alias("is_dim"),
        F.when(F.col("event_type") == "purchase", cents).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_dim").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = u.select(
        "is_dim",
        "cents",
        F.last("tier", ignorenulls=True).over(w).alias("effective_tier"),
    )
    return (
        r.filter(F.col("is_dim") == 0)
        .groupBy("effective_tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
