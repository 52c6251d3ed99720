"""B-5 window functions (SURVEY.md §2).

The reference delegates reporting queries to its SQL destinations
(README.md:221-224); windows are the canonical reporting surface over the
exported per-kind tables. Every window ORDER BY carries a unique tie-break
key (SURVEY §5.2(5)) so rank/ntile/frame results are deterministic across
engines.

Scale notes: all windows here are PARTITIONED (by customer / user / nation)
— state is bounded per key and Spark's WindowExec sorts within partitions
after one hash shuffle. The only conceptually-global window (cumulative
revenue by day) is computed scalably: aggregate to days first (tiny), then
window over the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


@register(
    "win_row_number",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (tie-broken on o_orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           ntile(4)     OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over suppliers by account
    balance within nation."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return supplier.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(lag(ts)  OVER w AS TIMESTAMP) AS prev_ts,
           CAST(lead(ts) OVER w AS TIMESTAMP) AS next_ts,
           round(value - lag(value) OVER w, 2) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prior/next event per user — the sessionization precursor."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT day, daily_revenue,
           round(sum(daily_revenue) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cumulative_revenue
    FROM (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS daily_revenue
          FROM orders GROUP BY 1)
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue by day. Scalable global-cumulative pattern:
    pre-aggregate to days (bounded: one row per day regardless of data
    volume), THEN run the single-partition window over the tiny aggregate —
    the unpartitioned sort never sees raw facts."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("daily_revenue"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "daily_revenue",
        F.round(F.sum("daily_revenue").over(w), 2).alias("cumulative_revenue"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           round(avg(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS movavg_7
    FROM lineitem
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding average of shipped quantity per supplier.

    The measure is integer-valued: an average of ≤7 integers can never land
    exactly on a 2-decimal half-way boundary (denominators 2..7 have no
    thousandths ending in 5), so round(x, 2) agrees across engines — unlike
    averaging 2-decimal money, where n=2 frames hit .xx5 exactly and
    Spark/DuckDB round opposite ways (verify gotcha #2).

    l_quantity is the FINAL ordering key because (l_orderkey,
    l_linenumber) is not unique in every fixture generation: the r09
    regeneration samples lineitem with replacement (600k rows, 457k
    distinct key pairs), so rows can tie on (shipdate, orderkey,
    linenumber) with DIFFERENT quantities — a ROWS frame over such a
    partial order is nondeterministic (flaky Spark-vs-Spark AND
    Spark-vs-DuckDB; caught by back-to-back sf0.1 sweeps disagreeing).
    With quantity appended, any residual ties agree on every
    output-visible value, so each frame's quantity multiset — and the
    output row set — is order-invariant.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-6, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.avg("l_quantity").over(w), 2).alias("movavg_7"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: per customer, how many of their orders
    fall within 50k below this order's price. Count over a RANGE frame is
    tie-safe: peers share the same frame in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(first_value(o_orderdate) OVER w AS TIMESTAMP) AS first_order_date,
           CAST(last_value(o_orderdate)  OVER w AS TIMESTAMP) AS last_order_date,
           first_value(o_orderkey) OVER w AS first_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an explicit unbounded frame (the default frame
    for last_value — RANGE … CURRENT ROW — is a classic trap; both sides
    pin the full-partition frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("last_order_date"),
        F.first("o_orderkey").over(w).alias("first_order_key"),
    )


@register(
    "win_ntile_percent",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist per customer ordered by spend. Rank positions are integers
    and the divisors are row counts, so the rounded ratios are exact
    rationals — identical across engines. o_orderkey tie-break keeps the
    frame deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "win_ignore_nulls",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts,
             CASE WHEN value >= 1 THEN CAST(value AS DECIMAL(18,2)) END AS v
      FROM events)
    SELECT user_id, event_id,
           CAST(last_value(v IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS DOUBLE) AS prev_valid,
           CAST(last_value(v IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS last_valid
    FROM v
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation — gap-filling (last observation
    carried forward) over a sparse measure, the sensor/ticker idiom.
    Both frames share one (user_id, ts, event_id) window spec: one
    Exchange + Sort, stacked Window operators. Spark's last(col,
    ignorenulls=True) over an UNBOUNDED-to-(-1) frame IS lag IGNORE
    NULLS; the values ride DECIMAL so the carried measure hashes
    identically."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("value") >= 1, F.col("value").cast("decimal(18,2)")
        ).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return v.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("double")
        .alias("prev_valid"),
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("last_valid"),
    )


@register(
    "win_cume_dist_median",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice), 6) AS cd,
           round(percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice), 6) AS pr,
           round(median(o_totalprice) OVER (PARTITION BY o_orderpriority), 2)
               AS grp_median
    FROM orders
    """,
)
def win_cume_dist_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows (cume_dist / percent_rank) plus a
    whole-partition median window — each row scored against its group's
    distribution in ONE pass (the anti-join alternative computes the
    median per group then joins back: two shuffles and a join vs one
    sort). cume_dist/percent_rank are exact rationals (tie-safe: equal
    order keys share a value); the median of an even count is the mean of
    the two middle values in both engines, rounded at 2 decimals on
    2-decimal money."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wp = Window.partitionBy("o_orderpriority")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.expr("median(o_totalprice)").over(wp), 2).alias(
            "grp_median"
        ),
    )


@register(
    "win_range_interval",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events)
    SELECT user_id, event_id,
           CAST(sum(v) OVER w AS DOUBLE) AS hour_value,
           CAST(count(*) OVER w AS BIGINT) AS hour_events
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, the trailing one-hour sum/count
    at every event — the sensor/clickstream sliding aggregate expressed
    as a window instead of a self-join. The frame is RANGE over exact
    epoch MICROSECONDS (no second-truncation tie ambiguity; peers with
    identical micros share a frame in both engines), so the inequality
    never becomes a join: one hash Exchange on user_id + one Sort, state
    bounded by each user's one-hour event density. The epoch conversion
    is timestampdiff from an NTZ literal — TZ-free, so the cutoff cannot
    shift on a non-UTC host (ts is TIMESTAMP_NTZ). Money rides
    DECIMAL(18,2) so the trailing sums hash identically; the DuckDB
    side renders through the repo-wide CAST(... AS DOUBLE/BIGINT)
    convention (DuckDB widens sums to DECIMAL(38,2)/HUGEINT)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        ).alias("tus"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return v.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("double").alias("hour_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_events"),
    )


@register(
    "win_median_sliding",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             list_sort(list_filter(
                 list(CAST(round(value * 100, 0) AS BIGINT)) OVER fr,
                 x -> x IS NOT NULL)) AS w_vals
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id, cents,
           CAST(len(w_vals) AS INT) AS w_n,
           CASE WHEN len(w_vals) > 0
                THEN w_vals[CAST((len(w_vals) + 1) // 2 AS INT)] END
               AS sliding_median_cents
    FROM w
    """,
)
def win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window MEDIAN (7-row trailing, per user) — the robust
    smoother moving averages can't give you (one outlier wrecks a mean;
    the median shrugs). Spark has no percentile window aggregate, so the
    frame's values are collected and sorted per row (collect_list over a
    ROWS frame + array_sort) and the LOWER median (element ceil(n/2),
    1-based) is picked — an exact integer-cents value, no interpolation,
    so the contract is deterministic (the gotcha: interpolated medians
    of 2-decimal data must never be rounded back to 2 decimals). O(w log
    w) per row on a bounded frame is the honest cost; at 100 TB the same
    plan holds because the frame, not the partition, bounds the work.
    One (user, ts, event_id) window shuffle total."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    # w_n counts PRESENT values (count(col) skips NULLs, mirroring the
    # oracle's post-filter list length): a NULL measurement contributes
    # no mass to the median, and an all-NULL frame yields NULL — the
    # r14 NULL-probe contract (count(*) + element_at on the NULL-free
    # collected array otherwise indexes past the array and throws)
    staged = ev.select(
        "user_id",
        "event_id",
        cents.alias("cents"),
        F.count(cents).over(fr).cast("int").alias("w_n"),
        F.array_sort(F.collect_list(cents).over(fr)).alias("w_vals"),
    )
    return staged.select(
        "user_id",
        "event_id",
        "cents",
        "w_n",
        F.when(
            F.col("w_n") > 0,
            F.element_at("w_vals", ((F.col("w_n") + 1) / 2).cast("int")),
        ).alias("sliding_median_cents"),
    )


@register(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT user_id, event_id,
           CAST(sum(first_seen) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT DISTINCT per user over time — the window frame SQL
    cannot express directly (DISTINCT inside a windowed aggregate is
    unsupported in both engines): decomposed into a first-occurrence
    flag (row_number = 1 on the (user, type) ordering) plus a running
    SUM of flags on the (user) ordering. Both windows hash-partition on
    user_id — the second reuses the first's shuffle (one Exchange
    total, plan-tested), so the trick costs one extra in-partition sort,
    not a shuffle. The standard cardinality-over-time primitive
    (features-seen, vocabulary-growth curves) at any user count."""
    # One explicit user_id partitioning serves BOTH windows: the
    # (user, type) window's clustering requirement is satisfied by the
    # coarser user_id hash (subset-of-clustering-keys rule), so neither
    # window adds an exchange of its own.
    ev = load_table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias(
            "distinct_types_so_far"
        ),
    )


@register(
    "win_conditional_streak_reset",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) >= 10000 AS hit
      FROM events),
    grp AS (
      SELECT user_id, event_id, ts, hit,
             sum(CASE WHEN hit THEN 0 ELSE 1 END) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM c)
    SELECT user_id, event_id,
           CAST(CASE WHEN hit THEN
                  sum(CASE WHEN hit THEN 1 ELSE 0 END) OVER (
                      PARTITION BY user_id, g ORDER BY ts, event_id)
                ELSE 0 END AS BIGINT) AS streak
    FROM grp
    """,
)
def win_conditional_streak_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional streak with reset — per user, the running count of
    CONSECUTIVE events whose value clears a threshold (>= 100.00),
    snapping back to 0 the moment one misses. The standard
    gaps-and-islands decomposition: a running count of MISSES is the
    island id (each miss starts a new island), and the streak is the
    running count of hits WITHIN the island — no self-join, no
    recursion. Both windows cluster on user_id (the island window's
    (user, g) keys are a superset), so the finer window reuses the
    coarser one's hash exchange: ONE shuffle total at any scale, the
    same subset-of-clustering-keys reuse win_running_distinct pins.
    Money compares as exact integer cents; streaks are exact integers
    — no float anywhere in the contract."""
    ev = load_table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    hit = F.round(F.col("value") * 100, 0).cast("bigint") >= 10000
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grp = ev.select(
        "user_id",
        "event_id",
        "ts",
        hit.alias("hit"),
    ).withColumn(
        "g", F.sum(F.when(F.col("hit"), 0).otherwise(1)).over(w_user)
    )
    w_isle = Window.partitionBy("user_id", "g").orderBy("ts", "event_id")
    streak = F.when(
        F.col("hit"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).over(w_isle),
    ).otherwise(0)
    return grp.select(
        "user_id", "event_id", streak.cast("bigint").alias("streak")
    )
