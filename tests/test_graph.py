"""PageRank over similarity graphs (operators/graph.py): hand-computed
values on a known topology, isolated-vertex floor, hub ordering, and
the single-materialization plan property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import graph


@pytest.fixture()
def star(spark):
    """Hub 0 connected to 1,2,3; vertex 9 isolated."""
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 9)], "id long")
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    return nodes, graph.symmetrize(pairs)


def _reference_pagerank(edges, n_nodes, iterations=3, d=0.85):
    """Pure-python fixed-iteration PR, no-dangling-redistribution."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    pr = {v: 1.0 / n_nodes for v in range(n_nodes)}
    for _ in range(iterations):
        nxt = {v: (1.0 - d) / n_nodes for v in pr}
        for s, ts in out.items():
            share = pr[s] / len(ts)
            for t in ts:
                nxt[t] = nxt[t] + d * share
        pr = nxt
    return pr


def test_pagerank_matches_hand_computation(spark, star):
    nodes, edges = star
    got = {
        r["id"]: r["pagerank"]
        for r in graph.pagerank(nodes, edges, "id", iterations=3).collect()
    }
    es = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)]
    # map vertex 9 -> index 4 for the dense reference
    ref = _reference_pagerank(es, 5)
    for v, idx in [(0, 0), (1, 1), (2, 2), (3, 3)]:
        assert got[v] == round(ref[idx], 6), (v, got[v], ref[idx])
    # isolated vertex sits exactly on the (1-d)/N floor
    assert got[9] == round(0.15 / 5, 6)
    # the hub dominates its spokes, spokes beat the isolated floor
    assert got[0] > got[1] > got[9]
    assert got[1] == got[2] == got[3]


def test_pagerank_edge_lineage_materialized_once(spark, star):
    """With checkpoint_edges the executed plan must contain no repeated
    edge-generation subtree — the iterations read the checkpoint."""
    nodes, edges = star
    pr = graph.pagerank(nodes, edges, "id", iterations=3)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    # the union that builds the symmetrized edge list must not appear
    # once per iteration (3x) in the physical plan
    assert plan.count("Union") <= 1, plan.count("Union")


def test_pagerank_no_edges_all_floor(spark):
    """Edge-free graph: every vertex sits on the (1-d)/N floor."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r["id"]: r["pagerank"]
           for r in graph.pagerank(nodes, edges, "id", iterations=3).collect()}
    assert set(got.values()) == {round(0.15 / 4, 6)}
