"""Connected-components tests (dedup clustering) against a driver-side
union-find ground truth."""

from __future__ import annotations

import random

import pytest

from stream2segment_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(n, edges)
    got = {r.id: r.cluster_id for r in connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long"),
        nodes=spark.range(n).withColumnRenamed("id", "id"),
    ).collect()}
    assert got == want


def test_chain_propagates_and_cap_raises(spark):
    # a 12-node path graph: diameter 11 -> needs ~11 rounds
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id
           for r in connected_components(df, max_iterations=15).collect()}
    assert got == {i: 0 for i in range(12)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=2)


def test_no_edges_all_singletons(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in connected_components(
        empty, nodes=spark.range(5)).collect()}
    assert got == {i: i for i in range(5)}
