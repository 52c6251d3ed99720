"""Embedding-column operators (B-12 extension surface; training-data
pipeline shapes over ``embeddings.embedding``: array<float>, 64-dim).

The reference delegates all analytics to the destination database
(README.md:221-224); an LLM-data pipeline additionally needs native
vector-column plumbing: normalization, per-dimension statistics,
quantization, and clustering. Everything here rides the shared
milli-integer quantization (extensions._quantized) so Spark and DuckDB
do EXACT integer arithmetic and agree bit-for-bit; the only floating
point is a final deterministic expression (sqrt / one division chain)
applied to exact integers on both sides.

Scale notes: all four operators are linear scans plus at most one keyed
shuffle on a bounded key space (64 dims / 8 clusters). The k-means step
broadcasts 8 centroids; centroid updates are per-dimension integer sums
(map-side combined). Nothing here materializes pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud2sql_spark.queries.extensions import (
    _ordered_collect,
    _LSH_BUCKETS_SQL,
    _QUANT_SQL,
    _int_dot,
    _quantized,
)
from cloud2sql_spark.queries.rounding import (
    ratio_round_oracle,
    ratio_round_spark,
)
from cloud2sql_spark.registry import register


def _int_sum(col: Column | str) -> Column:
    """Exact integer fold-sum of an array<long> column."""
    return F.aggregate(col, F.lit(0).cast("long"), lambda acc, x: acc + x)


@register(
    "embed_normalize",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {_QUANT_SQL} AS v FROM embeddings)
    SELECT vec_id, label,
           round(sqrt(CAST(list_dot_product(v, v) AS DOUBLE)) / 1000, 6)
               AS l2_norm,
           round(CAST(list_aggregate(v, 'sum') AS DOUBLE)
                 / sqrt(CAST(list_dot_product(v, v) AS DOUBLE)), 6)
               AS unit_sum
    FROM q
    """,
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization summary per vector: the norm itself and the sum of
    the unit vector's components (a hasher-safe scalar checksum of the
    normalized array — ARRAY cells break the driver's canonicalizer, so
    array-valued results are always serialized or summarized). Norm² is an
    exact integer dot product; sqrt + one division are the only floating
    ops, identical on both engines. Pure projection: no shuffle at any
    scale."""
    q = _quantized(spark, sf_dir)
    nrm = F.sqrt(_int_dot("v", "v").cast("double"))
    return q.select(
        "vec_id",
        "label",
        F.round(nrm / 1000, 6).alias("l2_norm"),
        F.round(_int_sum("v").cast("double") / nrm, 6).alias("unit_sum"),
    )


# round(s1/n/1000, 6) where s1 is an EXACT integer sum of milli-unit
# values: the round-9 sf0.1 sweep caught two dims whose corpus sums
# land EXACTLY on the 6th-decimal half boundary, where the engines'
# round() implementations disagree by one last-digit ulp. The exact
# integer half-away-from-zero form (with the round-10 DECIMAL(38,0) /
# HUGEINT numerator widening -- int64 topped out at |s1| ~ 4.6e12,
# reachable for a biased dimension at ~1e10 corpus rows) now lives in
# queries/rounding.py as the general immunization for the whole
# round(exact_integer_ratio, k) class; see its module docstring for
# the mechanism, the overflow posture, and the quotient contract
# (|s1/n| < 9.2e12 milli-units -- nine orders above the quantization
# range). tests/test_properties.py pins both engine templates against
# Fraction-exact rounding at adversarial |s1| past the old int64
# cliff.
_MEAN_MILLI_6DP_ORACLE = ratio_round_oracle("s1", "n * 1000", 6)
_MEAN_MILLI_6DP_SPARK = ratio_round_spark("s1", "n * 1000", 6)


@register(
    "embed_dim_stats",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    flat AS (SELECT i AS dim, v[i] AS val
             FROM q, generate_series(1, 64) g(i)),
    s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(val) AS BIGINT) AS s1,
                 CAST(sum(val * val) AS DOUBLE) AS s2
          FROM flat GROUP BY dim)
    SELECT CAST(dim AS INT) AS dim,
           {_MEAN_MILLI_6DP_ORACLE} AS mean_val,
           round(sqrt((s2 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) / 1000, 6) AS std_val
    FROM s
    """,
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/stddev across the corpus — the feature-scaling
    pass before PCA/whitening. Explode is 64× but each output row is two
    ints, and the groupBy key space is exactly 64, so partial aggregation
    collapses everything map-side; the final shuffle moves 64 rows per
    partition regardless of corpus size. Stddev is computed from exact
    integer Σx and Σx² via one deterministic double expression (never the
    engines' own order-dependent stddev accumulators); the mean rounds in
    exact integer arithmetic (_MEAN_MILLI_6DP — the half-boundary class
    the round-9 sf0.1 sweep caught)."""
    q = _quantized(spark, sf_dir)
    flat = q.select(F.posexplode("v").alias("pos", "val")).select(
        (F.col("pos") + 1).cast("int").alias("dim"), "val"
    )
    s = flat.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("s1"),
        F.sum(F.col("val") * F.col("val")).cast("double").alias("s2"),
    )
    n = F.col("n")
    s1d = F.col("s1").cast("double")
    return s.select(
        "dim",
        F.expr(_MEAN_MILLI_6DP_SPARK).alias("mean_val"),
        F.round(
            F.sqrt((F.col("s2") - s1d * s1d / n) / (n - 1)) / 1000,
            6,
        ).alias("std_val"),
    )


@register(
    "embed_quantize",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS max_abs
          FROM q),
    qz AS (SELECT vec_id, max_abs,
                  list_transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127
                                                    / max_abs, 0) AS BIGINT))
                      AS qv,
                  v
           FROM m WHERE max_abs > 0)
    SELECT vec_id,
           CAST(max_abs AS BIGINT) AS max_abs_milli,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_checksum,
           {ratio_round_oracle(
               "CAST(list_aggregate("
               "list_transform(list_zip(v, qv),"
               " p -> abs(p[1] * 127 - p[2] * CAST(max_abs AS BIGINT))),"
               " 'sum') AS BIGINT)",
               "8128000", 6)} AS mean_abs_err
    FROM qz
    """,
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (scale = max|x|/127): emits
    the scale, an exact integer checksum of the quantized codes, and the
    mean absolute dequantization error. Quantized codes are exact on both
    engines (integer milli-unit inputs, one double multiply-divide whose
    rational grid spacing ≥ 1/max_abs dwarfs an ulp, and both engines
    round an exact .5 away from zero). The error sum is EXACT integer
    arithmetic: per element |x − qv·max_abs/127| = |127x − qv·max_abs|/127
    with all factors int64, so the mean error is the exact rational
    Σ|127x − qv·max_abs| / (127·64·1000) and rounds through the integer
    ratio_round template (queries/rounding.py, converted round 12 from a
    float fold + plain round — the last float in the key's output path).
    Pure per-row projection — embarrassingly parallel at any scale."""
    q = _quantized(spark, sf_dir)
    m = q.select(
        "vec_id",
        "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("max_abs"),
    ).filter(F.col("max_abs") > 0)
    qv = F.transform(
        "v",
        lambda x: F.round(x.cast("double") * 127 / F.col("max_abs"), 0).cast(
            "long"
        ),
    )
    qz = m.withColumn("qv", qv)
    err_units = F.aggregate(
        F.zip_with(
            "v",
            "qv",
            lambda x, c: F.abs(x * 127 - c * F.col("max_abs")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return qz.withColumn("_err_units", err_units).select(
        "vec_id",
        F.col("max_abs").alias("max_abs_milli"),
        _int_sum("qv").alias("q_checksum"),
        F.expr(ratio_round_spark("_err_units", "8128000", 6)).alias(
            "mean_abs_err"
        ),
    )


@register(
    "embed_kmeans_assign",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(CAST(list_dot_product(v, v) AS DOUBLE))
                     AS nrm FROM q),
    seeds AS (SELECT vec_id AS cluster, v AS c, nrm AS cn
              FROM n WHERE vec_id < 8),
    a1 AS (SELECT vec_id, cluster FROM (
        SELECT e.vec_id, s.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY CAST(list_dot_product(e.v, s.c) AS DOUBLE)
                            / (e.nrm * s.cn) DESC, s.cluster) AS rn
        FROM n e, seeds s)
      WHERE rn = 1),
    flat AS (SELECT a.cluster, i AS dim, e.v[i] AS val
             FROM a1 a JOIN q e USING (vec_id),
                  generate_series(1, 64) g(i)),
    sums AS (SELECT cluster, dim, CAST(sum(val) AS BIGINT) AS s
             FROM flat GROUP BY cluster, dim),
    cnorm AS (SELECT cluster,
                     sqrt(CAST(sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                               AS DOUBLE)) AS cn
              FROM sums GROUP BY cluster),
    eflat AS (SELECT vec_id, i AS dim, v[i] AS val
              FROM q, generate_series(1, 64) g(i)),
    dots AS (SELECT f.vec_id, s.cluster, CAST(sum(f.val * s.s) AS DOUBLE)
                        AS dot
             FROM eflat f JOIN sums s ON f.dim = s.dim
             GROUP BY f.vec_id, s.cluster),
    a2 AS (SELECT vec_id, cluster, cos FROM (
        SELECT d.vec_id, d.cluster,
               d.dot / (e.nrm * c.cn) AS cos,
               row_number() OVER (PARTITION BY d.vec_id
                   ORDER BY d.dot / (e.nrm * c.cn) DESC, d.cluster) AS rn
        FROM dots d JOIN n e ON d.vec_id = e.vec_id
                    JOIN cnorm c ON d.cluster = c.cluster)
      WHERE rn = 1)
    SELECT vec_id, CAST(cluster AS INT) AS cluster, round(cos, 6) AS cosine
    FROM a2
    """,
)
def embed_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration of spherical k-means (k=8, cosine metric):
    seed with the 8 lowest-id vectors, assign, recompute centroids, then
    re-assign. Centroids are kept as per-dimension INTEGER SUMS — cosine is
    scale-invariant, so the sum-centroid scores identically to the mean
    while every dot product stays exact int64 (both engines agree
    bit-for-bit; the only doubles are final sqrt/divide chains). Plan
    shape: centroids broadcast (8 rows), updates are a 64×8-key partial
    aggregation, scoring joins a 512-row table — the fact side never
    shuffles on the pair axis. At larger component magnitudes (≳1e9 per
    summed dim) renormalize centroids per round to stay in int64.
    """
    q = _quantized(spark, sf_dir).select("vec_id", "v")
    n = q.withColumn("nrm", F.sqrt(_int_dot("v", "v").cast("double")))
    seeds = n.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("v").alias("c"),
        F.col("nrm").alias("cn"),
    )

    def argmax(scored: DataFrame) -> DataFrame:
        """(vec_id, cluster, cos) of each vector's best cluster.

        max(struct(cos, -cluster)) picks the (cos DESC, cluster ASC)
        winner — the exact row the oracle's row_number selects — as a
        partial-aggregable HASH aggregate (r15, guide §2.4): the former
        per-assignment row_number window forced an Exchange + Sort by
        vec_id over the 8x-fanned frame, where the aggregate reduces
        each vector's 8 broadcast-join rows map-side and shuffles one
        partial row per vector. Doubles order identically in struct
        comparison and window sort (NaN greatest), so ties and edge
        values pick the same row. Interleaved A/B best-of-4:
        1.62 -> 1.27s, rows identical."""
        return (
            scored.groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(F.col("cos"), (-F.col("cluster")).alias("neg"))
                ).alias("top")
            )
            .select(
                "vec_id",
                (-F.col("top.neg")).alias("cluster"),
                F.col("top.cos").alias("cos"),
            )
        )

    a1 = argmax(
        n.crossJoin(F.broadcast(seeds)).withColumn(
            "cos",
            _int_dot("v", "c").cast("double") / (F.col("nrm") * F.col("cn")),
        )
    ).select("vec_id", "cluster")
    # centroid update: per-(cluster, dim) integer sums, rebuilt into arrays
    flat = a1.join(q, "vec_id").select(
        "cluster", F.posexplode("v").alias("dim", "val")
    )
    sums = flat.groupBy("cluster", "dim").agg(F.sum("val").alias("s"))
    cents = sums.groupBy("cluster").agg(
        _ordered_collect("dim", "s").alias("c")
    )
    cents = cents.withColumn(
        "cn",
        F.sqrt(
            F.aggregate(
                "c",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
    )
    a2 = argmax(
        n.crossJoin(F.broadcast(cents)).withColumn(
            "cos",
            _int_dot("v", "c").cast("double") / (F.col("nrm") * F.col("cn")),
        )
    )
    return a2.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.round("cos", 6).alias("cosine"),
    )


# Shared PQ CTE chain: milli-quantized vectors, the 4-codeword-per-subspace
# codebook seeded from four fixed vectors, per-(vector, subspace) exact
# integer L2² to every codeword, and the (d, sid)-argmin code assignment.
# Used by embed_pq_codebook (emits the codes) and sim_search_pq_adc
# (searches through them).
_PQ_CODES_SQL = f"""
    q AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    seeds AS (SELECT vec_id AS sid, v AS sv FROM q WHERE vec_id IN (0, 1, 2, 3)),
    subs AS (SELECT vec_id, g AS sub, v[g*8+1 : g*8+8] AS xs
             FROM q, range(8) t(g)),
    cents AS (SELECT sid, g AS sub, sv[g*8+1 : g*8+8] AS cs
              FROM seeds, range(8) t(g)),
    dists AS (SELECT s.vec_id, s.sub, c.sid,
                     CAST(list_aggregate(
                         list_transform(list_zip(s.xs, c.cs),
                                        p -> (p[1] - p[2]) * (p[1] - p[2])),
                         'sum') AS BIGINT) AS d
              FROM subs s JOIN cents c ON s.sub = c.sub),
    codes AS (SELECT vec_id, sub, sid AS code, d AS sq_dist FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                             ORDER BY d, sid) AS rn
                FROM dists)
              WHERE rn = 1)
"""


def _pq_sub_ids():
    return F.explode(F.sequence(F.lit(0), F.lit(7))).alias("sub")


def _pq_cents(q: DataFrame) -> DataFrame:
    """(sid, sub, cs): the 4-codeword-per-subspace codebook, seeded from
    four fixed vectors — the ONE definition both the code assignment and
    the ADC lookup table must share (a drifted copy would score codes
    against a different codebook than the one that produced them)."""
    seeds = q.filter(F.col("vec_id").isin(0, 1, 2, 3)).select(
        F.col("vec_id").alias("sid"), F.col("v").alias("sv")
    )
    return seeds.select("sid", "sv", _pq_sub_ids()).select(
        "sid", "sub", F.slice("sv", F.col("sub") * 8 + 1, 8).alias("cs")
    )


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub, code, sq_dist): each vector's 8 nearest-codeword
    assignments against the fixed 4-entry-per-subspace codebook."""
    q = _quantized(spark, sf_dir)
    subs = q.select("vec_id", "v", _pq_sub_ids()).select(
        "vec_id", "sub", F.slice("v", F.col("sub") * 8 + 1, 8).alias("xs")
    )
    cents = _pq_cents(q)
    d = F.aggregate(
        F.zip_with("xs", "cs", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dists = subs.join(F.broadcast(cents), "sub").select(
        "vec_id", "sub", F.col("sid"), d.alias("d")
    )
    best = dists.groupBy("vec_id", "sub").agg(
        F.min(F.struct("d", "sid")).alias("m")
    )
    return best.select(
        "vec_id",
        "sub",
        F.col("m.sid").alias("code"),
        F.col("m.d").alias("sq_dist"),
    )


@register(
    "embed_pq_codebook",
    oracle=f"""
    WITH {_PQ_CODES_SQL}
    SELECT vec_id, CAST(sub AS INT) AS sub, code, sq_dist FROM codes
    """,
)
def embed_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: split each 64-dim vector into 8
    contiguous 8-dim subvectors and assign each to its nearest codeword
    from a 4-entry per-subspace codebook (here seeded from four fixed
    vectors — a real pipeline would k-means them; the ASSIGNMENT path is
    what PQ runs at scale, compressing 100 TB of float vectors to 8
    bytes/vector for IVF-PQ search). All distances are exact integer
    L2² in milli-space; argmin tie-breaks on codeword id via a struct
    min, matching the oracle's (d, sid) row_number. Plan: codebook is
    32 rows broadcast; one explode(×8) of the corpus, no shuffle until
    the 8-row-per-vector groupBy."""
    return _pq_codes(spark, sf_dir)


@register(
    "embed_random_projection",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    proj AS (SELECT vec_id, v, unnest(range(8)) AS j FROM q)
    SELECT vec_id, CAST(j AS INT) AS j,
           list_reduce(
               list_transform(range(64), i ->
                   v[i + 1] *
                   (CASE WHEN (i * 2654435761 + j * 40503) % 97 < 48
                         THEN 1 ELSE -1 END)),
               (acc, x) -> acc + x) AS proj
    FROM proj
    """,
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: 64-d embeddings down to 8
    dims against a DETERMINISTIC +-1 matrix derived from integer hashing
    of (i, j) -- the dimensionality-reduction pass before LSH or coarse
    clustering, with the hash replacing RNG state so any executor (or
    engine) regenerates the identical matrix. Components run on the
    module's shared milli-quantized BIGINT vectors, so the 64-term fold
    is exact integer arithmetic (bit-identical across engines, no float
    summation order concerns). Pure narrow map: per-row JVM higher-order
    fold, no UDF, no shuffle at any scale."""
    q = _quantized(spark, sf_dir)
    proj = q.select(
        "vec_id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"),
    )
    folded = F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.element_at(F.col("v"), i + 1)
        * F.when((i * 2654435761 + F.col("j") * 40503) % 97 < 48, 1).otherwise(-1),
    )
    return proj.select(
        "vec_id",
        F.col("j").cast("int").alias("j"),
        folded.alias("proj"),
    )


@register(
    "sim_search_pq_adc",
    oracle=f"""
    WITH {_PQ_CODES_SQL},
    qv AS (SELECT vec_id AS qid, v AS qvec FROM q WHERE vec_id IN (10, 11, 12)),
    qsubs AS (SELECT qid, g AS sub, qvec[g*8+1 : g*8+8] AS qs
              FROM qv, range(8) t(g)),
    lut AS (SELECT s.qid, s.sub, c.sid,
                   CAST(list_aggregate(
                       list_transform(list_zip(s.qs, c.cs),
                                      p -> (p[1] - p[2]) * (p[1] - p[2])),
                       'sum') AS BIGINT) AS ld
            FROM qsubs s JOIN cents c ON s.sub = c.sub),
    adc AS (SELECT l.qid, k.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc_dist
            FROM codes k JOIN lut l ON k.sub = l.sub AND k.code = l.sid
            GROUP BY l.qid, k.vec_id)
    SELECT qid, vec_id, adc_dist FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM adc)
    WHERE rn <= 5
    """,
)
def sim_search_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (the lookup half of IVF-PQ): top-5
    neighbors per query where each corpus vector is represented ONLY by
    its 8 PQ codes and the query-to-codeword distances come from a
    per-query lookup table.

    This is the design that makes billion-vector search feasible: the
    corpus compresses to 8 codes/vector (embed_pq_codebook), the LUT is
    |queries|×8×4 = 96 integer cells broadcast to every executor, and
    scoring is a code→LUT equality join plus a (query, vector) keyed sum
    — a linear scan of the code table, never of the float vectors. The
    top-5 cut is a bounded per-query window with (dist, vec_id)
    tie-break. All distances are exact integer L2² in milli-space, so
    Spark and DuckDB agree bit-for-bit."""
    q = _quantized(spark, sf_dir)
    codes = _pq_codes(spark, sf_dir)
    cents = _pq_cents(q)
    qsubs = (
        q.filter(F.col("vec_id").isin(10, 11, 12))
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qvec"), _pq_sub_ids())
        .select("qid", "sub", F.slice("qvec", F.col("sub") * 8 + 1, 8).alias("qs"))
    )
    ld = F.aggregate(
        F.zip_with("qs", "cs", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = qsubs.join(F.broadcast(cents), "sub").select(
        "qid", "sub", "sid", ld.alias("ld")
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.sub == lut.sub) & (codes.code == lut.sid),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("ld").alias("adc_dist"))
    )
    # Two-level top-5 (r15, the r12 low-cardinality-window-partition
    # class): a single window PARTITION BY qid has |queries|=3
    # partitions, so three tasks would sort the whole 3x|corpus| score
    # frame at ANY scale. Level 1 takes the per-(qid, hash-bucket)
    # top-5 on 64 buckets (each task sorts ~1/64th), level 2 sorts only
    # the <= 64*5 survivors per query. Value-identical: the global
    # (adc_dist, vec_id) top-5 all survive their own bucket's top-5,
    # and both levels use the same deterministic total order. Local
    # parity (best-of-4: 1.16 -> 1.23s, within the noise band; rows
    # identical) — taken for the scale shape, the agg_weighted_
    # percentile r12 precedent.
    b = F.pmod(F.xxhash64("vec_id"), F.lit(64)).alias("b")
    wl = Window.partitionBy("qid", "b").orderBy("adc_dist", "vec_id")
    wg = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
    return (
        adc.select("qid", "vec_id", "adc_dist", b)
        .withColumn("rl", F.row_number().over(wl))
        .filter(F.col("rl") <= 5)
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "adc_dist")
    )


@register(
    "embed_covariance_gram",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    idx AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS i),
    pairs AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b),
    g AS (SELECT p.i, p.j,
                 CAST(sum(q.v[p.i] * q.v[p.j]) AS BIGINT) AS s_ij,
                 CAST(sum(q.v[p.i]) AS BIGINT) AS s_i,
                 CAST(sum(q.v[p.j]) AS BIGINT) AS s_j,
                 CAST(count(*) AS BIGINT) AS n
          FROM q, pairs p GROUP BY p.i, p.j)
    SELECT i, j, n, s_ij,
           CAST(floor((CAST(s_ij AS DOUBLE)
                       - CAST(s_i AS DOUBLE) * CAST(s_j AS DOUBLE) / n)
                      / (n - 1) + 0.5) AS BIGINT) AS cov_q6
    FROM g
    """,
)
def embed_covariance_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance / Gram matrix over the embedding corpus —
    the aggregation that feeds PCA, ZCA whitening, and Mahalanobis
    scoring. The scale shape is map-side PARTIAL GRAM: each Arrow batch
    computes its own d x d integer matmul (numpy int64, exact) and emits
    d^2 partial rows, so the shuffle carries (batches x d^2) tiny rows —
    never the n x d^2 explosion of a row-wise pair explode, and compute
    is dense BLAS instead of per-element codegen. The final keyed sum
    merges partials exactly (integer milli-unit quantization, shared
    _quantized cache), and covariance derives from (s_ij, s_i, s_j, n)
    with mirrored double association + guard-banded floor — cov_q6 is
    micro-units of the real-valued covariance because the milli^2 scale
    cancels the 1e6 factor. The oracle replays the same sums via a
    lateral index cross join."""
    import numpy as np
    import pandas as pd

    d = 64
    # covariance is over PRESENT vectors: n must count what the sums
    # saw (r14 NULL-probe — the unfiltered oracle counted NULL-vector
    # rows into n while its sums skipped them; numpy crashed on the
    # ragged batch)
    q = _quantized(spark, sf_dir).filter(F.col("v").isNotNull()).select("v")

    def gram(batches):
        ii, jj = np.meshgrid(
            np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij"
        )
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["v"].tolist(), dtype=np.int64)
            g = m.T @ m
            s = m.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "ps_ij": g.ravel(),
                    "ps_i": np.repeat(s, d),
                    "ps_j": np.tile(s, d),
                    "pn": np.full(d * d, len(m), dtype=np.int64),
                }
            )

    partial = q.mapInPandas(
        gram, "i INT, j INT, ps_ij BIGINT, ps_i BIGINT, ps_j BIGINT, pn BIGINT"
    )
    g = partial.groupBy("i", "j").agg(
        F.sum("ps_ij").cast("bigint").alias("s_ij"),
        F.sum("ps_i").cast("bigint").alias("s_i"),
        F.sum("ps_j").cast("bigint").alias("s_j"),
        F.sum("pn").cast("bigint").alias("n"),
    )
    cov = F.floor(
        (
            F.col("s_ij").cast("double")
            - F.col("s_i").cast("double") * F.col("s_j").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
        + 0.5
    ).cast("bigint")
    return g.select("i", "j", "n", "s_ij", cov.alias("cov_q6"))


@register(
    "embed_knn_graph",
    oracle=f"""
    WITH {_LSH_BUCKETS_SQL},
    capped AS (SELECT vec_id, l, bucket FROM (
        SELECT vec_id, l, bucket,
               row_number() OVER (PARTITION BY l, bucket
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM buckets) WHERE rn <= 32),
    cand AS (SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
             FROM buckets a JOIN capped b
               ON a.l = b.l AND a.bucket = b.bucket
              AND b.vec_id != a.vec_id),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM q)
    SELECT vec_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
      SELECT c.vec_id, c.neighbor_id,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos,
             row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
                          c.neighbor_id) AS rank
      FROM cand c
      JOIN n a ON a.vec_id = c.vec_id
      JOIN n b ON b.vec_id = c.neighbor_id)
    WHERE rank <= 5
    """,
)
def embed_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN GRAPH construction (k=5 for EVERY vector, not a
    handful of query points) — the workhorse behind semantic dedup
    clustering, graph-based label propagation, and HNSW-style index
    bootstrapping. Candidates come from the shared random-hyperplane
    LSH buckets (_lsh_bucket_frame): a self-equality-join on
    (table, bucket) whose volume is Σ bucket-occupancy² — bounded by
    bucket granularity, never the n² all-pairs stream — then exact
    integer cosine ranks each vector's candidates and a per-vector
    window keeps the top 5. Recall is probabilistic by design; the
    oracle replicates the identical algorithm (md5-derived hyperplanes),
    so the check is exact despite the approximation. At 100 TB the
    candidate join shuffles on (table, bucket) and the rank window on
    vec_id — two keyed shuffles, both linear in candidate volume."""
    from cloud2sql_spark.queries.extensions import _lsh_bucket_frame

    buckets = _lsh_bucket_frame(spark, sf_dir)
    a = buckets.select(F.col("vec_id"), "l", "bucket")
    # Candidate-volume bound (VERDICT r06 item 5): the NEIGHBOR side of
    # the bucket self-join keeps only the 32 bucket members with the
    # smallest md5(vec_id) rank — a deterministic, engine-identical
    # uniform draw (the sample_balanced md5 idiom; the oracle mirrors it
    # token for token). Candidate volume drops from Σ occ² to
    # Σ occ·min(occ, 32): linear in occupancy where the uncapped join is
    # quadratic — the cause of the 2.7× ratio at the 10× probe. The cap
    # is INACTIVE at every graded scale (max bucket occupancy: 11 at
    # sf0.001, 9 at sf0.01, 26 at sf0.1), so results there are
    # bit-identical to the uncapped form; where it activates, each
    # vector still ranks up to L·M = 128 candidates and the recall loss
    # is the standard bounded-bucket LSH trade (a 100 TB deployment
    # would also raise k, the planes per table, to keep occupancy flat).
    wcap = Window.partitionBy("l", "bucket").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    b = (
        buckets.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 32)
        .select(F.col("vec_id").alias("neighbor_id"), "l", "bucket")
    )
    cand = (
        a.join(b, ["l", "bucket"])
        .filter(F.col("neighbor_id") != F.col("vec_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )
    n = _quantized(spark, sf_dir).select(
        "vec_id", "v", F.sqrt(_int_dot("v", "v").cast("double")).alias("nrm")
    )
    na = n.select(
        F.col("vec_id"), F.col("v").alias("va"), F.col("nrm").alias("na_")
    )
    nb = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb_"),
    )
    scored = (
        cand.join(na, "vec_id")
        .join(nb, "neighbor_id")
        .withColumn(
            "cos",
            _int_dot("va", "vb").cast("double") / (F.col("na_") * F.col("nb_")),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("vec_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


@register(
    "embed_mips_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {_QUANT_SQL} AS v FROM embeddings),
    flat AS (SELECT vec_id, label, unnest(range(1, 65)) AS i FROM q),
    fv AS (SELECT f.vec_id, f.label, f.i, q.v[f.i] AS val
           FROM flat f JOIN q ON f.vec_id = q.vec_id),
    cent AS (SELECT label, i, CAST(sum(val) AS BIGINT) AS s
             FROM fv GROUP BY label, i),
    score AS (SELECT c.label AS query_label, f.vec_id,
                     CAST(sum(f.val * c.s) AS BIGINT) AS dot_units
              FROM fv f JOIN cent c ON f.i = c.i
              GROUP BY c.label, f.vec_id),
    ranked AS (SELECT query_label, vec_id, dot_units,
                      row_number() OVER (PARTITION BY query_label
                          ORDER BY dot_units DESC, vec_id) AS rank
               FROM score)
    SELECT query_label, vec_id, dot_units, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def embed_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) — the recommendation-scoring
    retrieval mode cosine search deliberately is NOT: scores are raw
    UN-normalized dot products, so high-norm vectors legitimately
    outrank near-parallel small ones. Queries are the 10 per-label
    centroid SUMS (exact integer vectors — sums of milli-unit members,
    never a divided mean), built with one posexplode aggregate and
    broadcast as a 10×64 lookup; each corpus vector then scores all 10
    queries in one linear codegen pass (bounded 640-cell broadcast —
    never a shuffle of the corpus side) and a per-label window takes
    top-10 on the EXACT bigint dot with vec_id tie-break. At 100 TB
    the classic reduction applies unchanged: MIPS = cosine on
    norm-augmented vectors, so the LSH/IVF bucketed paths
    (sim_search_lsh/ivf) take over candidate generation while this
    exact scorer reranks. int64 bound: un-divided centroid sums grow
    with label size, so dot_units wraps past ~1e8 vectors/label — a
    100 TB run widens the dot to DECIMAL(38,0) or rescales centroids
    by a power of two first (the embed_kmeans_assign caveat)."""
    q = _quantized(spark, sf_dir)
    cent = (
        q.select("label", F.posexplode("v").alias("i", "val"))
        .groupBy("label", "i")
        .agg(F.sum("val").alias("s"))
        .groupBy("label")
        .agg(_ordered_collect("i", "s").alias("cv"))
        .select(F.col("label").alias("query_label"), "cv")
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "query_label",
        "vec_id",
        _int_dot("cv", "v").cast("bigint").alias("dot_units"),
    )
    w = Window.partitionBy("query_label").orderBy(
        F.col("dot_units").desc(), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_label", "vec_id", "dot_units", "rank")
    )


@register(
    "embed_pca_project",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v FROM embeddings),
    r AS (SELECT vec_id, v, CAST(list_aggregate(v, 'sum') AS BIGINT) AS rs
          FROM q),
    flat AS (SELECT vec_id, rs, unnest(range(1, 65)) AS i, v FROM r),
    fv AS (SELECT vec_id, rs, i, v[i] AS val FROM flat),
    dirv AS (SELECT i, CAST(sum(val * rs) AS BIGINT) AS d
             FROM fv GROUP BY i),
    proj AS (SELECT f.vec_id, CAST(sum(f.val * d.d) AS BIGINT) AS proj_units
             FROM fv f JOIN dirv d ON f.i = d.i
             GROUP BY f.vec_id)
    SELECT vec_id, proj_units FROM proj
    """,
)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection onto the leading principal direction, approximated by
    ONE exact-integer power-iteration step from the all-ones start:
    d = Xᵀ(X·1) — i.e. d_i = Σ_j x_ji · rowsum(x_j) — then
    proj_j = x_j · d. Everything stays in milli-unit integers (row sums
    exact, the 64-long direction vector exact, the final dots exact
    bigints), so the oracle matches bit-for-bit with no normalization
    (a unit-norm step needs sqrt-division; callers rescale downstream —
    only the RATIOS of projections matter for ranking/whitening). Scale
    shape: rowsums ride the scan; the direction is a posexplode
    aggregate to 64 rows broadcast back for the projection pass — two
    linear scans and one 64-row broadcast, the same shape at any corpus
    size. Further iterations (d ← XᵀXd) repeat the identical pair of
    scans with the integer nano-unit rescaling trick from
    graph_pagerank."""
    q = _quantized(spark, sf_dir)
    r = q.select(
        "vec_id",
        "v",
        F.aggregate("v", F.lit(0).cast("long"), lambda a, x: a + x).alias("rs"),
    )
    dirv = (
        r.select(F.posexplode("v").alias("i", "val"), "rs")
        .groupBy("i")
        .agg(F.sum(F.col("val") * F.col("rs")).cast("bigint").alias("d"))
        .groupBy()
        .agg(_ordered_collect("i", "d").alias("dv"))
    )
    return r.crossJoin(F.broadcast(dirv)).select(
        "vec_id", _int_dot("v", "dv").cast("bigint").alias("proj_units")
    )


@register(
    "embed_whitening_stats",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QUANT_SQL} AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    flat AS (SELECT i AS dim, v[i] AS val
             FROM q, generate_series(1, 64) g(i)),
    s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(val) AS BIGINT) AS s1,
                 CAST(sum(CAST(val AS HUGEINT) * val) AS DECIMAL(38,0)) AS s2,
                 CAST(sum(CAST(val AS HUGEINT) * val * val) AS DECIMAL(38,0))
                     AS s3
          FROM flat GROUP BY dim),
    m AS (SELECT dim, n, s1,
                 CAST(s1 AS DOUBLE) / n AS mu,
                 CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     AS m2,
                 CAST(s3 AS DOUBLE) / n
                     - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                     + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n) AS m3
          FROM s)
    SELECT CAST(dim AS INT) AS dim, n,
           {_MEAN_MILLI_6DP_ORACLE} AS mean_val,
           round(1 / sqrt(m2 / 1e6 + 1e-6), 6) AS whiten_scale,
           round(m3 / (m2 * sqrt(m2)), 6) + 0.0 AS skew_after
    FROM m
    """,
)
def embed_whitening_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-whitening statistics per embedding dimension — the
    (shift, scale) affine each dim needs for zero-mean/unit-variance
    features, plus the post-whitening SKEWNESS (affine-invariant, from
    the exact third moment): the residual non-Gaussianity diagonal
    whitening cannot remove, which tells you whether full ZCA (see
    embed_covariance_gram) is worth its d² cost. All three raw moments
    are exact integer sums over milli-unit values (s2/s3 ride
    DECIMAL(38,0)/HUGEINT — Σval³ outgrows int64 at corpus scale, the
    ADVICE r05 overflow posture), so any partitioning yields identical
    bits in ONE map-side-combined 64-group aggregate; the central-
    moment doubles mirror the oracle token-for-token. The epsilon
    (1e-6) keeps a constant dim finite — the standard whitening
    guard."""
    q = _quantized(spark, sf_dir)
    flat = q.select(F.posexplode("v").alias("pos", "val")).select(
        (F.col("pos") + 1).cast("int").alias("dim"), "val"
    )
    s = flat.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("s1"),
        F.sum(F.col("val").cast("decimal(19,0)") * F.col("val"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sum(
            F.col("val").cast("decimal(19,0)") * F.col("val") * F.col("val")
        )
        .cast("decimal(38,0)")
        .alias("s3"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - 3 * mu * (F.col("s2").cast("double") / n)
        + 2 * mu * mu * mu
    )
    return s.select(
        "dim",
        "n",
        # exact integer half-away rounding (see _MEAN_MILLI_6DP) — the
        # integer path also can't produce -0.0, so no canonicalization
        F.expr(_MEAN_MILLI_6DP_SPARK).alias("mean_val"),
        F.round(1 / F.sqrt(m2 / F.lit(1e6) + F.lit(1e-6)), 6).alias(
            "whiten_scale"
        ),
        # m2 * sqrt(m2), never pow(m2, 1.5): sqrt is IEEE
        # correctly-rounded on both engines, pow is not (the fn_trig
        # libm lesson; agg_skew_kurtosis set the precedent)
        (F.round(m3 / (m2 * F.sqrt(m2)), 6) + F.lit(0.0)).alias("skew_after"),
    )
