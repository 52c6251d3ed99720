"""Driver-visible proof of the Layer-1 ETL surface.

The driver's correctness gate only sees ``queries()`` keys; the collector
-> flatten -> link-table pipeline (SURVEY Part A) is otherwise proven
only by the repo's own tests. This module registers the end-to-end
collect of BOTH mock cloud collectors as a query whose oracle is the
md5-determined golden counts — so CORRECTNESS_r{N} records the ETL path
passing under a vanilla session, same as every operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.registry import register


def _golden_union_sql() -> str:
    from cloud2sql_spark.etl.aws_mock_source import GOLDEN_COUNTS as AWS
    from cloud2sql_spark.etl.k8s_mock_source import GOLDEN_COUNTS as K8S

    rows = ", ".join(
        f"('{name}', {n})"
        for name, n in sorted({**AWS, **K8S}.items())
    )
    return (
        "SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows "
        f"FROM (VALUES {rows}) t(tbl, n_rows)"
    )


@register("etl_flatten_counts", oracle=_golden_union_sql())
def etl_flatten_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect the AWS- and k8s-shaped mock clouds (executor-side fetch
    through distributed_collect), flatten both graphs through the kind
    catalogs, and emit one (table, row-count) row per kind + link table.
    The oracle is the pure-python golden counts — any drift in the fetch
    fan-out, the JSON payload flatten, or the edge derivation (including
    the cross-subtree pod -> config_map name resolution join) changes a
    count and fails the hash. ``sf_dir`` is unused: the collectors ARE
    the source, exactly as in the reference (its collectors take cloud
    credentials, not input files)."""
    from cloud2sql_spark.etl.aws_mock_source import (
        aws_mock_catalog,
        collect_aws_mock,
    )
    from cloud2sql_spark.etl.flatten import flatten_graph
    from cloud2sql_spark.etl.k8s_mock_source import (
        collect_k8s_mock,
        k8s_mock_catalog,
    )

    tables: dict[str, DataFrame] = {}
    nodes, edges = collect_aws_mock(spark)
    tables.update(flatten_graph(nodes, edges, aws_mock_catalog()))
    nodes, edges = collect_k8s_mock(spark)
    tables.update(flatten_graph(nodes, edges, k8s_mock_catalog()))

    out = None
    for name in sorted(tables):
        one = tables[name].agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        out = one if out is None else out.unionByName(one)
    return out
