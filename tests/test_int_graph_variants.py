"""The integer-encoded fast paths (triangles/kcore/linkpred, and the
broadcast rounds of components/bfs/wsp) must produce byte-identical
results to the string-space formulations they optimize."""

import pytest
from pyspark.sql import functions as F

from prec_spark.plans.components import (
    cc_encode,
    cc_graph,
    cc_iterate,
    selfloop_edges,
)
from prec_spark.plans.kcore import kcore, kcore_ids
from prec_spark.plans.linkpred import linkpred_scores, linkpred_scores_ids
from prec_spark.plans.triangles import triangle_counts_from_und, triangle_counts_ids


@pytest.fixture(scope="module")
def graph(spark):
    # two triangles sharing a node, a chain, and a hub
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("d", "e"), ("c", "e"),
        ("e", "f"), ("f", "g"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
        ("hub", "e"), ("hub", "f"), ("hub", "g"),
    ]
    und = cc_graph(spark.createDataFrame(edges, "src string, dst string"))[0]
    nodes = und.select(F.col("src").alias("node")).distinct()
    ids, iund = cc_encode(und, nodes)
    return und, ids.localCheckpoint(), iund.localCheckpoint()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_triangles_int_matches_string(graph):
    und, ids, iund = graph
    assert _rows(triangle_counts_ids(ids, iund)) == _rows(
        triangle_counts_from_und(und)
    )


def test_kcore_int_matches_string(graph):
    und, ids, iund = graph
    assert _rows(kcore_ids(ids, iund, k=2, peels=4)) == _rows(
        kcore(und, k=2, peels=4)
    )


def test_linkpred_int_matches_string(graph):
    und, ids, iund = graph
    assert _rows(linkpred_scores_ids(ids, iund, dmax=4, min_cn=1)) == _rows(
        linkpred_scores(und, dmax=4, min_cn=1)
    )


def test_triangles_broadcast_close_matches_shuffle_close(spark, graph):
    und, ids, iund = graph
    fast = _rows(triangle_counts_ids(ids, iund))
    # force the shuffle-close fallback by disabling auto-broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        slow = _rows(triangle_counts_ids(ids, iund))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert fast == slow == _rows(triangle_counts_from_und(und))


def test_components_broadcast_path_matches_fallback(spark, graph):
    und, ids, iund = graph
    fast = _rows(cc_iterate(und, und.select(F.col("src").alias("node")).distinct()))
    # force the co-partitioned fallback by disabling auto-broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        slow = _rows(
            cc_iterate(und, und.select(F.col("src").alias("node")).distinct())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert fast == slow


def test_selfloop_edges_shape(graph):
    _und, ids, iund = graph
    sl = selfloop_edges(ids, iund)
    n_nodes = ids.count()
    assert sl.count() == iund.count() + n_nodes
    assert sl.filter(F.col("w") == 0).count() == n_nodes
