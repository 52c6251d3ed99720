"""ETL orchestration (reference A4/A15/A19: collect_from_plugins,
cloud2sql/collect.py:154-214): run sources -> flatten -> load destinations
-> atomic snapshot promote; fail-fast with no partial promote.

Parallelism mapping (reference A15/A16 -> Spark):

- inter-source: the reference runs 4 collector threads (collect.py:186);
  here each source is a Spark job — submit from driver threads under FAIR
  scheduling if overlap matters, or sequentially (I/O-bound sources don't
  contend with executor CPU).
- intra-source: the reference forks per account and pools per region
  (config-template.yaml:17-32); ``distributed_collect`` re-expresses that
  as a mapInPandas fan-out over an accounts×regions task table, so fetch
  runs ON EXECUTORS and scales with the cluster, not the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from cloud2sql_spark.etl import sinks
from cloud2sql_spark.etl.config import FileDestination, JdbcDestination
from cloud2sql_spark.etl.example_source import collect_example, example_catalog
from cloud2sql_spark.etl.flatten import flatten_graph
from cloud2sql_spark.etl.model import KindCatalog

# source registry (reference A2: entry-points discovery collect.py:48-71;
# a plain dict here — extension = register a callable)
SourceFn = Callable[[SparkSession], tuple[DataFrame, DataFrame]]
SOURCES: dict[str, tuple[SourceFn, Callable[[], KindCatalog]]] = {
    "example": (collect_example, example_catalog),
}


def collect(
    spark: SparkSession,
    config: dict,
    destination: FileDestination | JdbcDestination,
) -> dict[str, int]:
    """Run every configured source, flatten, load, then promote the
    snapshot. Returns per-table row counts (the reference's analytics
    payload, collect.py:194-196). Any failure aborts BEFORE promotion, so
    readers keep the previous snapshot (reference collect.py:198-212)."""
    tables: dict[str, DataFrame] = {}
    for name in sorted(config["sources"]):
        if name not in SOURCES:
            raise ValueError(f"unknown source: {name}")
        source_fn, catalog_fn = SOURCES[name]
        nodes, edges = source_fn(spark)
        tables.update(flatten_graph(nodes, edges, catalog_fn()))

    counts: dict[str, int] = {}
    if isinstance(destination, JdbcDestination):
        # fail fast with an install hint if the dialect's JDBC driver is
        # absent (reference check_db_driver, util.py:70-87)
        from cloud2sql_spark.etl.dialects import check_jdbc_driver

        check_jdbc_driver(spark, destination.url)
        writer = sinks.JdbcSnapshotWriter(
            spark, destination.url, destination.batch_size
        )
        for tname, df in tables.items():
            writer.stage(tname, _jsonify_complex(df))
            counts[tname] = df.count()
        writer.swap()  # atomic promote only after every load succeeded
    else:
        for tname, df in tables.items():
            path = f"{destination.path}/{tname}"
            if destination.format == "csv":
                sinks.write_csv(_jsonify_complex(df), path)
            else:
                sinks.write_parquet_snapshot(df, path)
            counts[tname] = df.count()
    return counts


def _jsonify_complex(df: DataFrame) -> DataFrame:
    """Complex/array/map columns -> JSON text at the flat-sink boundary
    (the reference's SqlUpdater stores complex properties as JSON [dep];
    SURVEY §1.3 'keep as StructType internally')."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            cols.append(F.to_json(f.name).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def distributed_collect(
    spark: SparkSession,
    accounts: list[str],
    regions: list[str],
    fetch: Callable[[str, str], list[dict]],
    result_schema: str,
) -> DataFrame:
    """Executor-side fetch (reference A16: per-account forks + per-region
    thread pools, config-template.yaml:17-32): build an accounts×regions
    task DataFrame, repartition so each task lands on its own executor
    slot, and run ``fetch`` inside mapInPandas. At 1000 executors this is
    1000-way parallel API fetch with no driver bottleneck."""
    import pandas as pd

    tasks = spark.createDataFrame(
        [(a, r) for a in accounts for r in regions], "account STRING, region STRING"
    ).repartition(max(1, len(accounts) * len(regions)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for account, region in zip(pdf["account"], pdf["region"]):
                rows.extend(fetch(account, region))
            if rows:
                yield pd.DataFrame(rows)

    return tasks.mapInPandas(run, result_schema)
