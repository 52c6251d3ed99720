"""Differential oracle test over every registered query (SURVEY.md §5.2(1)).

For each key in the registry: run the PySpark query and, when an oracle SQL
exists, compare against DuckDB exactly like the driver does. Keys without an
oracle get a rows-runnable smoke check.
"""

from __future__ import annotations

import pytest

from cloud2sql_spark.registry import oracle_sql, queries
from tests.oracle import compare

_QUERIES = queries()
_ORACLES = oracle_sql()


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_query_matches_oracle(key, spark, duck, sf_dir):
    df = _QUERIES[key](spark, sf_dir)
    if key in _ORACLES:
        compare(df, duck, _ORACLES[key], key=key)
    else:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
