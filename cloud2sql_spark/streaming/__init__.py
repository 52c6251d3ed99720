"""B-9 Structured Streaming layer (SURVEY.md §2).

The reference is batch-only (snapshot collect → swap,
cloud2sql/collect.py:175-203); streaming is part of the Spark-native
mandate. Design: every streaming operator is a PURE ``DataFrame ->
DataFrame`` transform (``transforms``) applied identically to a static
DataFrame (batch verification against the DuckDB oracle, driver contract)
and to a ``readStream`` source (``replay`` + tests, availableNow trigger).
Batch result == streaming replay result is the equivalence gate
(SURVEY §5.2(4)).
"""

from cloud2sql_spark.streaming import replay, transforms  # noqa: F401
