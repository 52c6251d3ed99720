"""cloud2sql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of someengineering/cloud2sql.

The reference (/root/reference) is a batch ETL tool: collect cloud resource
graphs, flatten to one-table-per-kind + link tables, load into SQL/Parquet/CSV
destinations, and let users query with ordinary SQL (reference README.md:221-224).

This engine provides both layers natively on Spark:

- Layer 1 (ETL parity): graph ingestion -> kind catalog -> flatten -> sinks
  with snapshot-swap semantics (``cloud2sql_spark.etl``).
- Layer 2 (query surface): the relational operator surface users run against
  the exported schema — scans, filters, joins, aggregations, windows, set ops,
  scalar functions, streaming — plus large-scale training-data operators
  (dedup, similarity search, text analysis, multimodal columns), all expressed
  with the DataFrame/Spark-SQL API so Catalyst/Tungsten pick the physical plan
  (``cloud2sql_spark.queries``).
"""

__version__ = "0.1.0"
