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
        # the cap lives on the distributed loop; small graphs take the
        # driver union-find fallback, so force the loop to test it
        connected_components(df, max_iterations=2, small_graph_edges=0)


def test_small_graph_fallback_matches_distributed(spark):
    # r9 opt round: the driver union-find fallback must label exactly
    # like the distributed loop — min node id per component, including
    # a multi-component graph with chains and isolated nodes=
    edges = [(3, 7), (7, 9), (20, 21), (5, 3), (40, 41), (41, 20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r.id: r.cluster_id for r in connected_components(df).collect()}
    slow = {r.id: r.cluster_id for r in connected_components(
        df, small_graph_edges=0).collect()}
    assert fast == slow == {3: 3, 5: 3, 7: 3, 9: 3,
                            20: 20, 21: 20, 40: 20, 41: 20}
    nodes = spark.range(0, 4).withColumnRenamed("id", "id")
    with_nodes = {r.id: r.cluster_id for r in connected_components(
        df, nodes=nodes).collect()}
    assert with_nodes[0] == 0 and with_nodes[3] == 3


def test_no_edges_all_singletons(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in connected_components(
        empty, nodes=spark.range(5)).collect()}
    assert got == {i: i for i in range(5)}


# ---------------------------------------------------------------------------
# pagerank_quantized
# ---------------------------------------------------------------------------

def _pagerank_fixed_point(edges, iterations=3, scale=10**9,
                          num=85, den=100, extra_nodes=()):
    """Driver-side replay of the exact integer update rule."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges}
                   | set(extra_nodes))
    n = len(nodes)
    outw = {}
    for a, _, w in edges:
        outw[a] = outw.get(a, 0) + w
    r = {v: scale // n for v in nodes}
    base = (scale * (den - num)) // (den * n)
    for _ in range(iterations):
        inr = {v: 0 for v in nodes}
        for a, b, w in edges:
            inr[b] += (r[a] * w) // outw[a]
        r = {v: base + (num * inr[v]) // den for v in nodes}
    return r


def test_pagerank_matches_driver_replay(spark):
    from stream2segment_spark.operators.graph import pagerank_quantized
    rng = random.Random(7)
    raw = {}
    for _ in range(200):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            raw[(a, b)] = raw.get((a, b), 0) + 1
    edges = [(a, b, w) for (a, b), w in raw.items()]
    want = _pagerank_fixed_point(edges)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.rank_q for r in
           pagerank_quantized(df, iterations=3).collect()}
    assert got == want


def test_pagerank_sink_accumulates_and_mass_decays(spark):
    from stream2segment_spark.operators.graph import pagerank_quantized
    # 0 -> 2, 1 -> 2: node 2 is a pure sink and must outrank the sources;
    # its dangling mass is dropped, so total rank strictly decays
    df = spark.createDataFrame([(0, 2, 1), (1, 2, 1)],
                               "src long, dst long, w long")
    got = {r.id: r.rank_q for r in
           pagerank_quantized(df, iterations=2, persist=False).collect()}
    assert got[2] > got[0] == got[1]
    assert sum(got.values()) < 10**9


def test_pagerank_nodes_param_and_weighting(spark):
    from stream2segment_spark.operators.graph import pagerank_quantized
    # 0 -> 1 (w=3), 0 -> 2 (w=1): rank must split 3:1 after one round
    df = spark.createDataFrame([(0, 1, 3), (0, 2, 1)],
                               "src long, dst long, w long")
    nodes = spark.createDataFrame([(0,), (1,), (2,), (9,)], "id long")
    got = {r.id: r.rank_q for r in
           pagerank_quantized(df, iterations=1, nodes=nodes).collect()}
    assert set(got) == {0, 1, 2, 9}
    base = got[0]  # no in-links: base only
    assert got[9] == base
    s = 10**9 // 4
    assert got[1] == base + (85 * ((s * 3) // 4)) // 100
    assert got[2] == base + (85 * ((s * 1) // 4)) // 100


def test_pagerank_validation(spark):
    from stream2segment_spark.operators.graph import pagerank_quantized
    df = spark.createDataFrame([(0, 1, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank_quantized(df, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank_quantized(df, damping_num=100, damping_den=100)
    with pytest.raises(ValueError, match="scale"):
        pagerank_quantized(df, scale=0)


def test_rank_cli_end_to_end(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main
    edges = spark.createDataFrame(
        [(0, 2, 1), (1, 2, 1), (2, 0, 1)], "src long, dst long, w long")
    src = str(tmp_path / "edges.parquet")
    edges.write.parquet(src)
    out = str(tmp_path / "ranks.parquet")
    rc = cli_main(["rank", "-i", src, "-o", out, "--weight", "w",
                   "--iterations", "3"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["nodes"] == 3 and stats["top"][0]["id"] == "2"
    got = {r.id: r.rank_q for r in spark.read.parquet(out).collect()}
    want = _pagerank_fixed_point([(0, 2, 1), (1, 2, 1), (2, 0, 1)],
                                 iterations=3)
    assert got == want
    # missing column diagnosed; bad iterations argued
    assert cli_main(["rank", "-i", src, "-o", out,
                     "--src", "nope"]) == 2
    assert "lacks column" in capsys.readouterr().err
    assert cli_main(["rank", "-i", src, "-o", out,
                     "--iterations", "0"]) == 2
    assert "iterations" in capsys.readouterr().err


def test_pagerank_rejects_bad_edge_weights(spark):
    """NULL / non-positive weights are rejected up front (ADVICE r7):
    a zero __outw would make Spark's integer div yield NULL (silently
    dropped contribution) while the documented DuckDB CTE replay errors
    on division by zero — a cross-engine divergence, so argue instead."""
    import pytest

    from stream2segment_spark.operators.graph import pagerank_quantized

    for w in (0, -3, None):
        df = spark.createDataFrame([(1, 2, 5), (2, 1, w)],
                                   "src long, dst long, w long")
        with pytest.raises(ValueError, match="non-positive"):
            pagerank_quantized(df, iterations=1)
    # unweighted mode never reads the column: no validation scan
    df = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    assert pagerank_quantized(df, weight=None, iterations=1).count() == 2
