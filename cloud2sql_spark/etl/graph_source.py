"""Pre-collected ("remote") graph source — A5 (reference:
RemoteGraphCollector, cloud2sql/collect.py:20,60-63 + requirements.txt:7
``resotodatalink[remote-graph]``; the reference ingests a graph that was
already collected elsewhere instead of calling cloud APIs itself).

Wire format: a directory (any Hadoop-readable URI — file://, s3a://,
hdfs://) holding

- ``nodes/``  — ndjson lines ``{"node_id", "kind", "payload", "cloud",
  "account", "region"}`` where ``payload`` is either a nested JSON object
  or a JSON-encoded string of one (both shapes are accepted);
- ``edges/``  — ndjson lines ``{"from_id", "to_id", "from_kind",
  "to_kind"}``;
- ``kinds.json`` — the kind catalog ``{"kinds": {name: {prop: type}}}``
  with reference model type names (etl/model.py).

Scale notes: nodes/edges are read as plain text and the fields extracted
with ``get_json_object`` (JVM-side JSON path) — a single scan with NO
schema-inference pre-pass over what may be terabytes of export;
``get_json_object('$.payload')`` returns the raw JSON text for an object
and the decoded string for a string payload, so both shapes land in the
same STRING column that the flatten step parses with the kind's
StructType. kinds.json is read through Spark's text reader (works on any
filesystem) and collected — bounded by the number of kinds, not data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud2sql_spark.etl.model import Kind, KindCatalog

_NODE_FIELDS = ("node_id", "kind", "payload", "cloud", "account", "region")
_EDGE_FIELDS = ("from_id", "to_id", "from_kind", "to_kind")


def read_graph(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Load the nodes and edges DataFrames from an exported graph."""
    nodes = spark.read.text(os.path.join(path, "nodes")).select(
        *[
            F.get_json_object("value", f"$.{f}").alias(f)
            for f in _NODE_FIELDS
        ]
    )
    edges = spark.read.text(os.path.join(path, "edges")).select(
        *[
            F.get_json_object("value", f"$.{f}").alias(f)
            for f in _EDGE_FIELDS
        ]
    )
    return nodes, edges


def read_catalog(spark: SparkSession, path: str) -> KindCatalog:
    """kinds.json -> KindCatalog (driver-side; bounded by kind count)."""
    lines = spark.read.text(os.path.join(path, "kinds.json")).collect()
    doc = json.loads("\n".join(r["value"] for r in lines))
    return KindCatalog(
        [Kind(name, props or {}) for name, props in sorted(doc["kinds"].items())]
    )


def export_graph(
    nodes: DataFrame, edges: DataFrame, catalog: KindCatalog, path: str
) -> None:
    """Write a graph in the wire format above (the producer side a
    collector runs elsewhere; partition-parallel ndjson via Spark's JSON
    writer). kinds.json is written driver-side — it is catalog metadata,
    not data."""
    nodes.write.mode("overwrite").json(os.path.join(path, "nodes"))
    edges.write.mode("overwrite").json(os.path.join(path, "edges"))
    kinds = {
        name: catalog.properties(name) for name in catalog.kinds()
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "kinds.json"), "w") as fh:
        json.dump({"kinds": kinds}, fh, indent=2, sort_keys=True)


def make_graph_source(cfg: dict | None):
    """Source factory for the registry: config needs ``path`` (the export
    directory/URI)."""
    cfg = cfg or {}
    if "path" not in cfg:
        raise ValueError("remote_graph source requires 'path'")
    path = cfg["path"]

    def source_fn(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        return read_graph(spark, path)

    def catalog_fn() -> KindCatalog:
        from cloud2sql_spark.session import get_spark

        spark = SparkSession.getActiveSession() or get_spark("graph-source")
        return read_catalog(spark, path)

    return source_fn, catalog_fn
