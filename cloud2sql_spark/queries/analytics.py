"""Event-analytics operators over ``events`` (B-12 extension surface).

Product-analytics shapes a resource-event stream needs at warehouse scale:
ordered funnels, cohort retention, time-bucketed rollups (the hypertable
continuous-aggregate shape), sequence pattern matching, and graph degree
distributions. The reference delegates all of this to the destination
database (README.md:221-224); here each is a first-class Spark plan.

Scale notes: every operator below is one-or-two keyed shuffles — funnels
and pattern matches are a single window partition per user (state bounded
by that user's events), retention is a co-partitioned user join, rollups
are partial-aggregated. No self-joins over the fact table, no driver
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


@register(
    "events_funnel",
    oracle="""
    WITH staged AS (
      SELECT user_id, event_type, ts, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END) OVER w_prev
                 AS view_before
      FROM events
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), clicked AS (
      SELECT *,
             min(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
                      THEN ts END) OVER w_prev AS click_before
      FROM staged
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
                      THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' AND click_before IS NOT NULL
                      THEN ts END) AS t_purchase
      FROM clicked
      GROUP BY user_id)
    SELECT count(*)          AS n_users,
           count(t_view)     AS users_view,
           count(t_click)    AS users_view_click,
           count(t_purchase) AS users_view_click_purchase
    FROM per_user
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (view -> click -> purchase): a click counts
    only if a view precedes it in the user's event order, a purchase only
    if such a click precedes it. Single-pass design: running min-of-stage
    timestamps over one (user_id, ts, event_id)-ordered window — Spark
    plans consecutive windows over the same spec as ONE Exchange + Sort
    with stacked Window operators, so the whole funnel is one shuffle; the
    classic per-stage self-join would be three. Event order (ts, event_id)
    breaks timestamp ties deterministically."""
    events = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = events.withColumn(
        "view_before",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w_prev),
    )
    clicked = staged.withColumn(
        "click_before",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("view_before").isNotNull(),
                F.col("ts"),
            )
        ).over(w_prev),
    )
    per_user = clicked.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("view_before").isNotNull(),
                F.col("ts"),
            )
        ).alias("t_click"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("click_before").isNotNull(),
                F.col("ts"),
            )
        ).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("users_view"),
        F.count("t_click").alias("users_view_click"),
        F.count("t_purchase").alias("users_view_click_purchase"),
    )


@register(
    "events_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS activity_week
      FROM events)
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.activity_week) / 7 AS INT)
               AS week_offset,
           count(*) AS n_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, counted
    in every subsequent week they return. Two aggregations plus one
    user_id-keyed join — both sides arrive hash-partitioned on user_id
    from their own groupBy/distinct, so the join reuses the partitioning
    (no extra Exchange). Offsets are exact-day arithmetic on
    week-truncated dates (always multiples of 7)."""
    events = load_table(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("activity_week")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_rollup_time",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(hour(ts) AS INT) AS hr,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY ROLLUP (day, hr)
    """,
)
def events_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (hour within day within grand total) — the
    hypertable continuous-aggregate shape: one scan produces all three
    granularities via partial aggregation (map-side combine shrinks each
    grain before the shuffle). Value sums ride DECIMAL(18,2) so both
    engines add exactly (double accumulation is order-dependent)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.hour("ts").alias("hr"),
            "value",
            "user_id",
        )
        .rollup("day", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "win_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id, value
    FROM seq
    WHERE value > v1 AND v1 > v2
    """,
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern detection (MATCH_RECOGNIZE-lite): flag events that
    complete three strictly-rising values within a user's event order.
    Fixed-lookbehind patterns compile to lag() columns over ONE window
    shuffle — no self-joins, state bounded by the lag depth. Doubles are
    compared, never arithmetically combined, so results are exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value", 1).over(w).alias("v1"),
            F.lag("value", 2).over(w).alias("v2"),
        )
        .filter((F.col("value") > F.col("v1")) & (F.col("v1") > F.col("v2")))
        .select("user_id", "event_id", "value")
    )


@register(
    "graph_degree",
    oracle="""
    WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    deg AS (SELECT l_partkey, count(*) AS degree FROM edges GROUP BY 1)
    SELECT degree, count(*) AS n_parts
    FROM deg GROUP BY degree
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part--supplier bipartite graph implied
    by lineitem: distinct edges, per-node degree, then the degree
    histogram. Each step is a keyed partial aggregation; the histogram's
    key space is tiny so the final shuffle is negligible. The same plan
    shape powers join-skew diagnosis at 100 TB (find the heavy keys before
    they find you)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    deg = edges.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_parts"))
