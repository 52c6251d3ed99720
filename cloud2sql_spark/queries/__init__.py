"""Operator query families (SURVEY.md §2 Part B).

Each module registers ``(key, spark_fn, oracle_sql)`` triples with
``cloud2sql_spark.registry``. Shared conventions (SURVEY.md §5.2(5)):

- alias every computed column identically in Spark and the oracle SQL;
- ``round(x, 2)`` on double aggregates on both sides;
- every window ORDER BY carries a unique tie-break key;
- ``sort_array(collect_list(...))`` for array aggregations;
- no bare LIMIT without a total order.
"""
