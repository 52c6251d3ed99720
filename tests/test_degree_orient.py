"""Degree-orientation scale switch for graph_triangle_count.

The default path orients co-purchase edges low-id -> high-id; the opt-in
SPARK_GRAFT_DEGREE_ORIENT=1 path re-orients by the (degree, id) total
order, bounding every out-adjacency list by sqrt(2m) on skewed graphs
(the documented 100 TB refinement, now implemented). These tests pin:

1. identical output rows (n_nodes, n_edges, n_triangles) on the real
   sf0.001 fixture — any total vertex order counts each triangle exactly
   once, so the paths must agree bit-for-bit;
2. on a crafted hub graph, the hub's out-list is EMPTY under degree
   orientation (all its edges point into it) while id-orientation gives
   the low-id hub an O(n) out-list — the skew bound is real, not
   cosmetic;
3. _degree_orient is a pure re-orientation: same unordered edge pairs,
   no duplicates, no drops.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud2sql_spark.queries.analytics import _degree_orient
from cloud2sql_spark.registry import queries

_QUERIES = queries()


def test_degree_orient_matches_default_on_fixture(spark, sf_dir, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DEGREE_ORIENT", raising=False)
    exact = _QUERIES["graph_triangle_count"](spark, sf_dir).collect()
    monkeypatch.setenv("SPARK_GRAFT_DEGREE_ORIENT", "1")
    oriented = _QUERIES["graph_triangle_count"](spark, sf_dir).collect()
    assert [r.asDict() for r in exact] == [r.asDict() for r in oriented]
    assert exact[0]["n_triangles"] > 0  # fixture actually has triangles


def _hub_edges(spark):
    """Hub vertex 0 joined to spokes 1..10, plus spoke edge (1, 2):
    one triangle {0, 1, 2}. Id-oriented (u < v) like _copurchase_edges."""
    rows = [(0, i) for i in range(1, 11)] + [(1, 2)]
    return spark.createDataFrame(rows, "u bigint, v bigint")


def test_hub_out_list_bounded(spark):
    e = _hub_edges(spark)
    # id orientation: the low-id hub carries all 10 spokes in its out-list
    id_out = (
        e.groupBy("u").agg(F.count(F.lit(1)).alias("d")).filter("u = 0")
    ).collect()
    assert id_out[0]["d"] == 10
    # degree orientation: deg(0)=10 > deg(spoke)<=2, so every hub edge
    # flips inward — hub out-degree 0, max out-degree <= 2 <= sqrt(2m)
    o = _degree_orient(e)
    out_deg = o.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    assert out_deg.filter("u = 0").count() == 0
    assert out_deg.agg(F.max("d")).first()[0] <= 2


def test_degree_orient_preserves_edge_multiset(spark):
    e = _hub_edges(spark)
    o = _degree_orient(e)
    canon = lambda df: sorted(  # noqa: E731
        (min(r.u, r.v), max(r.u, r.v)) for r in df.collect()
    )
    assert canon(o) == canon(e)


def test_hub_triangle_count_agrees(spark):
    """The full intersection scheme over the reoriented crafted graph
    finds exactly the one triangle (independent of the operator's edge
    builder, which is fixture-bound)."""
    for edges in (_hub_edges(spark), _degree_orient(_hub_edges(spark))):
        adj = edges.groupBy("u").agg(
            F.sort_array(F.collect_list("v")).alias("nbrs")
        )
        au = adj.select(F.col("u").alias("au"), F.col("nbrs").alias("nu"))
        av = adj.select(F.col("u").alias("av"), F.col("nbrs").alias("nv"))
        tri = (
            edges.join(au, edges.u == au.au)
            .join(av, edges.v == av.av, "left")
            .select(
                F.size(
                    F.array_intersect(
                        "nu", F.coalesce("nv", F.array().cast("array<bigint>"))
                    )
                ).alias("c")
            )
            .agg(F.sum("c").alias("n"))
        )
        assert tri.first()["n"] == 1
