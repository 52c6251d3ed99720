"""Fixture catalog: explicit schemas + loaders for the driver test tables.

Explicit schemas (no inference) for the TPC-H-ish star schema documented in
/root/repo/FIXTURES.md §2. Timestamps are read as TIMESTAMP_NTZ: the parquet
files store tz-naive values (pyarrow isAdjustedToUTC=false) and the DuckDB
oracle reads them as naive TIMESTAMP, so NTZ is the semantically identical
Spark type regardless of session timezone.

``events.ts`` has shipped as TIMESTAMP(NANOS) (rounds 1-2) and
TIMESTAMP(MICROS) (round 3). ``load_table`` peeks the parquet footer for the
real unit: MICROS reads natively as TIMESTAMP_NTZ; NANOS (which Spark's
reader rejects) falls back to ``spark.sql.legacy.parquet.nanosAsLong=true``
+ an exact ns -> µs -> TIMESTAMP_NTZ conversion matching DuckDB's truncation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions we broadcast in joins (bounded row counts at any scale).
BROADCAST_DIMS = {"region", "nation"}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # events.ts is read as long ns (see module docstring) and converted.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# ns-epoch long -> TIMESTAMP_NTZ at µs precision, timezone-independent:
# epoch + exact DECIMAL seconds (truncating ns -> µs like DuckDB does on read).
_NS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval(0, 0, 0, "
    "CAST({col} DIV 1000 AS DECIMAL(20, 0)) / CAST(1000000 AS DECIMAL(10, 0)))"
)

# events schema variant for fixtures whose ts is already µs TIMESTAMP —
# read natively as NTZ (full pushdown; no conversion expression needed).
_EVENTS_TS_NTZ = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
        for f in SCHEMAS["events"].fields
    ]
)

_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    """Peek the parquet footer for the physical time unit of ``ts``.

    Driver-side metadata-only read (one footer, no row groups) — O(KB)
    regardless of table size, so it is scale-safe. The fixture generator has
    shipped both TIMESTAMP(NANOS) (rounds 1-2) and TIMESTAMP(MICROS)
    (round 3) files; trusting a hardcoded unit silently shifts every event
    into 1970, so we look instead of guessing.
    """
    if path not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            inner = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            probe = os.path.join(path, inner[0])
        field = pq.ParquetFile(probe).schema_arrow.field("ts")
        _TS_UNIT_CACHE[path] = getattr(field.type, "unit", "us")
    return _TS_UNIT_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with the canonical schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_unit(path) == "ns":
            # TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
            # the raw ns long (legacy flag is runtime-settable — set
            # defensively in case the caller's session was built without
            # it) and convert ns -> µs -> NTZ exactly like DuckDB does.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.schema(SCHEMAS[name]).parquet(path)
            return df.withColumn("ts", F.expr(_NS_TO_NTZ.format(col="ts")))
        return spark.read.schema(_EVENTS_TS_NTZ).parquet(path)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all fixture tables as temp views (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
