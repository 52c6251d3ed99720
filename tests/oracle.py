"""Differential-compare helper: Spark DataFrame vs DuckDB oracle result.

Mirrors the driver's check (row-count + schema + order-insensitive
value-hash) but with exact value diffs for debuggability. Columns are sorted
by name and rows compared as multisets, so result order never matters.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and collapse float32/float64 printing noise
        return round(v + 0.0, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def compare(spark_df, duck_con, sql: str, key: str = "?") -> None:
    """Assert the Spark result and the DuckDB result are identical as
    (column-name-sorted) row multisets."""
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)

    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"[{key}] column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"[{key}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    s_set = sorted(
        (tuple(_norm(row[spark_cols[i]]) for i in order) for row in spark_rows),
        key=repr,
    )
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    d_set = sorted(
        (tuple(_norm(row[i]) for i in d_order) for row in duck_rows), key=repr
    )

    if s_set != d_set:
        diffs = [
            (s, d) for s, d in zip(s_set, d_set) if s != d
        ][:5]
        raise AssertionError(
            f"[{key}] value mismatch; first diffs (spark, duck): {diffs}"
        )
