"""Drive the driver contract the way the grading driver does.

Vanilla SparkSession (no session.py configs), sf0.01, every queries() key
run and — when an oracle exists — compared against DuckDB with the same
normalization as tests/oracle.py. Prints PASS/FAIL per key and a summary.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tests.oracle import compare

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
from cloud2sql_spark.catalog import TABLES  # noqa: E402

for name in TABLES:
    path = os.path.join(SF_DIR, f"{name}.parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

only = sys.argv[1:]  # optional key filters (exact name or prefix)

if not only:
    t0 = time.time()
    rows = len(mod.entry(spark).collect())
    print(f"entry rows: {rows} ({time.time() - t0:.1f}s)", flush=True)
    assert rows > 0

qs = mod.queries()
if only:
    qs = {k: v for k, v in qs.items() if any(k == o or k.startswith(o) for o in only)}
oracles = mod.oracle_sql()
failed: list[str] = []
for key in sorted(qs):
    t0 = time.time()
    try:
        df = qs[key](spark, SF_DIR)
        if key in oracles:
            compare(df, con, oracles[key], key=key)
            status = "PASS(oracle)"
        else:
            n = len(df.collect())
            status = f"PASS(rows={n})"
    except Exception as exc:  # noqa: BLE001
        status = f"FAIL: {exc}"
        traceback.print_exc()
        failed.append(key)
    print(f"{key:28s} {status}  {time.time() - t0:.1f}s", flush=True)

print(f"\n{len(qs) - len(failed)}/{len(qs)} passed; oracles={len(oracles)}")
if failed:
    print("FAILED:", failed)
    sys.exit(1)
