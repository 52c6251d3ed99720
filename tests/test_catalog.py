"""Catalog loader regression tests.

The fixture generator has shipped ``events.ts`` as TIMESTAMP(NANOS)
(rounds 1-2) and TIMESTAMP(MICROS) (round 3). ``load_table`` peeks the
parquet footer and must read BOTH correctly — the round-3 regeneration
silently shifted every event to 1970 under the hardcoded nanos path
(order-preserving, so only bucket-based time queries caught it).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud2sql_spark.catalog import load_table

_TS = [
    "2024-01-01 00:09:58.778549",
    "2024-01-15 12:30:00.000001",
    "2024-01-30 23:26:16.220708",
]


def _write_events(path: str, unit: str) -> None:
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(_TS),
            "user_id": [10, 11, 12],
            "event_type": ["view", "click", "purchase"],
            "value": [1.5, 2.5, 3.5],
            "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp(unit)),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), path
    )


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_reads_both_ts_units(unit, spark, tmp_path):
    """Spark's loaded ts must equal DuckDB's read of the same file (the
    oracle's view of truth) for both physical units, to µs precision."""
    path = os.path.join(str(tmp_path), "events.parquet")
    _write_events(path, unit)
    got = [
        r.ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        for r in load_table(spark, str(tmp_path), "events")
        .orderBy("event_id")
        .collect()
    ]
    con = duckdb.connect()
    try:
        want = [
            r[0].strftime("%Y-%m-%d %H:%M:%S.%f")
            for r in con.execute(
                f"SELECT ts FROM read_parquet('{path}') ORDER BY event_id"
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == want == _TS
