"""Network/IP operators (B-8 scalar surface extension, cloud-domain).

cloud2sql's domain is cloud resources, whose tables are full of IP
addresses and CIDR blocks (the reference's collected kinds carry
`private_ip_address` / `cidr_block`-style columns; querying them is
delegated to the destination DB, reference README.md:221-224). These two
keys give the engine native integer IP arithmetic and the scalable CIDR
containment join.

Determinism: the fixtures carry no IP columns, so both operators derive
addresses from keys via exact int64 modular arithmetic (multiplicative
hashing — the same numbers in Spark and DuckDB, no RNG, no hex parsing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.catalog import load_table
from cloud2sql_spark.registry import register


@register(
    "fn_ip_parse",
    oracle="""
    WITH ip AS (SELECT c_custkey,
                       ((c_custkey % 1048576) * 2654435761) % 4294967296 AS ip_int
                FROM customer),
    o AS (SELECT c_custkey, ip_int,
                 (ip_int >> 24) & 255 AS o1,
                 (ip_int >> 16) & 255 AS o2,
                 (ip_int >> 8) & 255 AS o3,
                 ip_int & 255 AS o4
          FROM ip)
    SELECT c_custkey, ip_int,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS dotted,
           (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
            OR (o1 = 192 AND o2 = 168)) AS is_private,
           o1 = 127 AS is_loopback,
           (ip_int >> 16) AS net16
    FROM o
    """,
)
def fn_ip_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 integer parsing: octet extraction via shifts/masks, dotted
    rendering, RFC 1918 private-range and loopback classification, and
    the /16 network id. Pure projection in whole-stage codegen — integer
    bit ops, no UDF, no shuffle at any scale. (The key is pre-reduced
    mod 2^20 so the multiplicative hash stays inside int64 at any
    custkey range.)"""
    c = load_table(spark, sf_dir, "customer")
    ip_int = ((F.col("c_custkey") % 1048576) * 2654435761) % F.lit(4294967296)
    o = c.select("c_custkey", ip_int.alias("ip_int")).select(
        "c_custkey",
        "ip_int",
        F.shiftright("ip_int", 24).bitwiseAND(F.lit(255)).alias("o1"),
        F.shiftright("ip_int", 16).bitwiseAND(F.lit(255)).alias("o2"),
        F.shiftright("ip_int", 8).bitwiseAND(F.lit(255)).alias("o3"),
        F.col("ip_int").bitwiseAND(F.lit(255)).alias("o4"),
    )
    return o.select(
        "c_custkey",
        "ip_int",
        F.concat_ws(".", "o1", "o2", "o3", "o4").alias("dotted"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
        (F.col("o1") == 127).alias("is_loopback"),
        F.shiftright("ip_int", 16).alias("net16"),
    )


@register(
    "join_cidr_contains",
    oracle="""
    WITH ip AS (SELECT c_custkey,
                       (10 * 16777216)
                       + (((c_custkey * 2654435761) % 64) * 65536)
                       + (((c_custkey * 97) % 256) * 256)
                       + ((c_custkey * 31) % 256) AS ip_int
                FROM customer),
    net AS (SELECT s_suppkey,
                   CASE WHEN s_suppkey % 2 = 1 THEN 24 ELSE 16 END AS plen,
                   (10 * 16777216) + ((s_suppkey % 64) * 65536)
                   + (CASE WHEN s_suppkey % 2 = 1
                           THEN ((s_suppkey * 13) % 256) * 256 ELSE 0 END)
                       AS net_int
            FROM supplier),
    m AS (SELECT n.s_suppkey, n.plen, n.net_int, i.c_custkey, i.ip_int
          FROM ip i JOIN net n
            ON (i.ip_int >> 16) = (n.net_int >> 16)
          WHERE (i.ip_int >> (32 - n.plen)) = (n.net_int >> (32 - n.plen)))
    SELECT s_suppkey, plen, net_int, c_custkey, ip_int FROM m
    """,
)
def join_cidr_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR containment join: which addresses fall inside which network
    blocks (mixed /16 and /24 prefixes), the security-group / subnet
    membership query of every cloud inventory.

    Naively this is an inequality join (range containment). The scale
    formulation used here: every network, whatever its prefix length,
    is aligned to a /16 bucket, so a coarse EQUALITY join on the top 16
    bits finds all candidates (hash join, broadcastable network table),
    and the exact prefix mask is a residual post-filter
    (ip >> (32-plen) == net >> (32-plen)). Networks with plen < 16
    would simply expand to their covering /16 buckets first — the same
    explode-to-buckets trick join_interval_overlap uses for time bins.
    Addresses and blocks derive from keys by exact modular arithmetic,
    identical in both engines."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("c_custkey")
    ip = c.select(
        "c_custkey",
        (
            F.lit(10 * 16777216)
            + ((k * 2654435761) % 64) * 65536
            + ((k * 97) % 256) * 256
            + (k * 31) % 256
        ).alias("ip_int"),
    )
    sk = F.col("s_suppkey")
    plen = F.when(sk % 2 == 1, 24).otherwise(16)
    net_int = (
        F.lit(10 * 16777216)
        + (sk % 64) * 65536
        + F.when(sk % 2 == 1, ((sk * 13) % 256) * 256).otherwise(0)
    )
    net = s.select("s_suppkey", plen.alias("plen"), net_int.alias("net_int"))
    m = ip.join(
        F.broadcast(net),
        F.shiftright("ip_int", 16) == F.shiftright("net_int", 16),
    ).filter(
        F.expr("shiftright(ip_int, 32 - plen)")
        == F.expr("shiftright(net_int, 32 - plen)")
    )
    return m.select("s_suppkey", "plen", "net_int", "c_custkey", "ip_int")
