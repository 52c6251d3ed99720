"""Layer 1 — ETL parity with the reference pipeline.

The reference collects cloud resource graphs, flattens them to one table per
resource kind plus one ``link_<from>_<to>`` table per edge-kind pair, and
loads the result into SQL/Parquet/CSV destinations with snapshot-swap
semantics (reference: cloud2sql/collect.py, tests/collect_test.py:26-45).

Spark re-expression:

- ``model``      kind model -> StructType catalog (reference SqlUpdater DDL
                 derivation, collect.py:22 [dep])
- ``flatten``    nodes/edges DataFrames -> per-kind + link DataFrames
                 (reference collect_sql, collect.py:158)
- ``sinks``      parquet/csv/jdbc writers + atomic snapshot swap
                 (collect.py:98-149, 198-203)
- ``config``     YAML config surface (collect.py:74-151)
- ``example_source``  the synthetic "example" graph used by the reference's
                 golden tests (tests/collect_test.py:26-40)
"""
