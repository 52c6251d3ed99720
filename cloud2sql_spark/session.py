"""SparkSession factory.

Local-mode defaults tuned for the test container (local[N], single JVM); the
same configs are the right starting point on a real cluster — AQE handles
runtime re-planning (partition coalescing, skew joins, broadcast switching),
and UTC session time keeps timestamp semantics aligned with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cloud2sql_spark", cpus: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession with scale-aware defaults.

    - AQE on: runtime join-strategy switching, partition coalescing, skew
      handling — the knobs that matter at 100 TB are enabled declaratively.
    - shuffle.partitions ~ cores locally; on a cluster AQE coalesces from a
      higher initial number, so this is safe to leave.
    - UTC session timezone: fixtures are tz-naive; oracle (DuckDB) is UTC-naive.
    - nanosAsLong: the events fixture stores TIMESTAMP(NANOS) which Spark's
      vectorized parquet reader rejects; we read ns as long and convert
      (see catalog.load_table).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[N] puts executors in the driver JVM: size the heap for N
        # concurrent tasks + broadcasts + shuffle buffers. 8g showed
        # GC-driven 10-30s stalls late in long sessions (accumulated
        # broadcast blocks only free on GC); 24g removes them. On a real
        # cluster this maps to ordinary executor memory, not driver memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # shuffle/spill files on tmpfs: with /tmp disk-backed, the writeback
        # + cleaner-deletion storm after a heavy query mix stalled following
        # queries 5-20× for ~a minute. On a cluster this is the standard
        # local-SSD/ramdisk scratch-dir sizing decision.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
