"""operators/search: inverted-index BM25-ish retrieval."""
from __future__ import annotations

import math

import pytest

from stream2segment_spark.operators import search as S


def _bm25ish(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = (n_docs - df + 0.5) / (df + 0.5)
    # parenthesization matters at the ulp level: the operator contract is
    # idf * (num / denom), not (idf * num) / denom
    return idf * ((tf * (k1 + 1.0))
                  / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))


def test_search_scores_match_hand_computation(spark):
    rows = [
        (1, "spark spark spark join"),          # tf(spark)=3, dl=4
        (2, "spark join join"),                 # tf(spark)=1, dl=3
        (3, "filter scan merge hash row"),      # no hit for 'spark'
        (4, "spark"),                           # tf=1, dl=1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (S.search_topk(docs, "doc_id", "text", ["spark", "join"], k=10)
           .toPandas().set_index(["term", "doc_id"]).sort_index())
    n_docs, avgdl = 4, (4 + 3 + 5 + 1) / 4
    # df(spark)=3, df(join)=2
    for (term, doc), (tf, dl, dfc) in {
            ("spark", 1): (3, 4, 3), ("spark", 2): (1, 3, 3),
            ("spark", 4): (1, 1, 3),
            ("join", 1): (1, 4, 2), ("join", 2): (2, 3, 2)}.items():
        got = out.loc[(term, doc), "score"]
        want = _bm25ish(tf, dfc, dl, n_docs, avgdl)
        assert math.isclose(got, want, rel_tol=0, abs_tol=0), (term, doc)
    # ranking: per term, scores descend; ties impossible here
    for term in ("spark", "join"):
        sub = out.loc[term].sort_values("rank")
        assert list(sub["score"]) == sorted(sub["score"], reverse=True)
    # no-hit doc never appears
    assert 3 not in out.index.get_level_values("doc_id")


def test_search_topk_truncates_and_tie_breaks(spark):
    # five docs with IDENTICAL single-token text: same score, rank by id
    rows = [(i, "alpha") for i in range(1, 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (S.search_topk(docs, "doc_id", "text", ["alpha"], k=3)
           .toPandas().sort_values("rank"))
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["rank"]) == [1, 2, 3]


def test_search_empty_terms_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="term"):
        S.bm25ish_scores(docs, "doc_id", "text", [])


def test_search_normalizes_query_terms(spark):
    """'Spark' / 'don't' / 'C++' must match the lowercased alnum corpus
    tokens; normalization also splits multi-token queries and dedupes."""
    from stream2segment_spark.operators.search import normalize_terms

    assert normalize_terms(["Spark", "don't", "C++", "spark"]) == \
        ["spark", "don", "t", "c"]
    docs = spark.createDataFrame(
        [(1, "spark rules"), (2, "nothing here")],
        "doc_id long, text string")
    out = S.search_topk(docs, "doc_id", "text", ["Spark!"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    with pytest.raises(ValueError, match="term"):
        S.bm25ish_scores(docs, "doc_id", "text", ["!!!", "--"])


def test_index_equals_online_search(spark, tmp_path):
    from pyspark.sql import Row

    from stream2segment_spark.operators.search import (
        build_search_index, index_search_topk, search_topk)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate([
            "spark shuffles data across the cluster",
            "the shuffle service moves shuffle blocks",
            "no relevant words here at all",
            "spark spark spark tiny doc",
            None,
        ])])
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, index_files=4)
    online = {(r["term"], r["doc_id"]): (r["score"], r["rank"])
              for r in search_topk(docs, "doc_id", "text",
                                   ["Spark", "shuffle"], k=3).collect()}
    viaidx = {(r["term"], r["id"]): (r["score"], r["rank"])
              for r in index_search_topk(spark, idx,
                                         ["Spark", "shuffle"],
                                         k=3).collect()}
    assert viaidx == online          # scores bit-equal, same ranking
    # the query path is pruned + broadcast: no text scan, no shuffle
    # joins; the only window is the per-term top-k
    plan = index_search_topk(spark, idx, ["spark"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [" in plan or "In(term" in plan, plan
    with pytest.raises(ValueError, match="at least one"):
        index_search_topk(spark, idx, ["..."])


def test_search_cli_index_lifecycle(spark, tmp_path, capsys):
    import json

    from pyspark.sql import Row

    from stream2segment_spark.cli import main as cli_main
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [Row(doc_id=1, text="spark moves data"),
         Row(doc_id=2, text="spark spark again")]).write.parquet(src)
    idx = str(tmp_path / "idx")
    assert cli_main(["search", "-i", src, "--build-index", idx]) == 0
    capsys.readouterr()
    assert cli_main(["search", "--index", idx, "-q", "spark"]) == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [2, 1]  # tf 2 beats tf 1
    assert cli_main(["search", "-q", "spark"]) == 2      # no source
    assert cli_main(["search", "--build-index", idx]) == 2  # no corpus


def test_append_equals_rebuild(spark, tmp_path):
    from pyspark.sql import Row

    from stream2segment_spark.operators.search import (
        append_to_search_index, build_search_index, index_search_topk)
    a = spark.createDataFrame(
        [Row(doc_id=1, text="spark moves data"),
         Row(doc_id=2, text="shuffle shuffle blocks")])
    b = spark.createDataFrame(
        [Row(doc_id=3, text="spark again and again"),
         Row(doc_id=4, text=None)])
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_search_index(a, "doc_id", "text", inc, index_files=2)
    append_to_search_index(b, "doc_id", "text", inc, index_files=2)
    build_search_index(a.unionByName(b), "doc_id", "text", full,
                       index_files=2)
    for part in ("postings", "terms", "stats"):
        got = {tuple(r) for r in
               spark.read.parquet(f"{inc}/{part}").collect()}
        want = {tuple(r) for r in
                spark.read.parquet(f"{full}/{part}").collect()}
        assert got == want, part
    qi = sorted(map(tuple, index_search_topk(
        spark, inc, ["spark", "shuffle"], k=5).collect()))
    qf = sorted(map(tuple, index_search_topk(
        spark, full, ["spark", "shuffle"], k=5).collect()))
    assert qi == qf  # appended index answers bit-equal to a rebuild
    # staging dirs (all three components are staged before the swap so
    # a mid-append failure can't leave stale terms/stats live) are gone
    import os
    for staged in ("postings_new", "terms_new", "stats_new"):
        assert not os.path.exists(f"{inc}/{staged}"), staged


def test_fs_swap_backup_first(spark, tmp_path):
    """_fs_swap must never delete the live component before the staged
    one is safely promoted (r6 ADVICE): the swap goes live -> live.bak,
    staged -> live, then drops the backup — verified here for the
    existing-live, missing-live, and stale-backup-present cases."""
    import os

    from stream2segment_spark.operators.search import _fs_swap

    def mkdir_with(p, content):
        os.makedirs(p, exist_ok=True)
        with open(f"{p}/part-0", "w") as f:
            f.write(content)

    live, staged = str(tmp_path / "live"), str(tmp_path / "staged")
    # 1. normal promote over an existing live
    mkdir_with(live, "old")
    mkdir_with(staged, "new")
    _fs_swap(spark, staged, live)
    assert open(f"{live}/part-0").read() == "new"
    assert not os.path.exists(staged)
    assert not os.path.exists(live + ".bak")  # backup dropped on success
    # 2. first-ever promote (no live yet)
    live2, staged2 = str(tmp_path / "live2"), str(tmp_path / "staged2")
    mkdir_with(staged2, "first")
    _fs_swap(spark, staged2, live2)
    assert open(f"{live2}/part-0").read() == "first"
    # 3. a stale .bak from an earlier crash must not block the swap
    mkdir_with(live + ".bak", "stale")
    mkdir_with(staged, "newer")
    _fs_swap(spark, staged, live)
    assert open(f"{live}/part-0").read() == "newer"
    assert not os.path.exists(live + ".bak")


def test_normalize_terms_unicode_mode():
    from stream2segment_spark.operators.search import normalize_terms
    # ascii mode erases non-ASCII terms entirely
    assert normalize_terms(["東京", "Spark"]) == ["spark"]
    # unicode mode keeps them, ASCII-lowering only A-Z
    assert normalize_terms(["東京", "Spark"], tokenizer="unicode") == \
        ["東京", "spark"]


def test_unicode_index_self_describing(spark, tmp_path):
    """An index built with tokenizer='unicode' records the mode in its
    stats row; querying and appending read it back — the caller never
    passes (and so can never mismatch) the tokenizer."""
    from stream2segment_spark.operators.search import (
        append_to_search_index, build_search_index, index_search_topk,
        index_tokenizer)
    docs = spark.createDataFrame(
        [(1, "東京 は 首都"), (2, "plain english text"),
         (3, "東京 タワー")],
        "id long, text string")
    path = str(tmp_path / "uidx")
    build_search_index(docs, "id", "text", path, tokenizer="unicode")
    stats = spark.read.parquet(f"{path}/stats")
    assert index_tokenizer(stats) == "unicode"
    hits = index_search_topk(spark, path, ["東京"]).collect()
    assert sorted(r["id"] for r in hits) == [1, 3]
    # append tokenizes with the STORED mode: the CJK doc must land in
    # the postings (ascii mode would tokenize it to nothing)
    batch = spark.createDataFrame([(4, "東京 再訪")], "id long, text string")
    append_to_search_index(batch, "id", "text", path)
    hits2 = index_search_topk(spark, path, ["東京"]).collect()
    assert sorted(r["id"] for r in hits2) == [1, 3, 4]
    assert index_tokenizer(spark.read.parquet(f"{path}/stats")) == "unicode"


def test_pre_mode_index_reads_as_ascii(spark, tmp_path):
    """Indexes written before the tokenizer column existed load as
    'ascii' (the only mode that existed) — and an append upgrades the
    stats row in place without changing behavior."""
    from pyspark.sql import functions as F
    from stream2segment_spark.operators.search import (
        append_to_search_index, build_search_index, index_search_topk,
        index_tokenizer)
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "id long, text string")
    path = str(tmp_path / "oldidx")
    build_search_index(docs, "id", "text", path)
    # simulate the pre-mode format: drop the tokenizer column
    stats = spark.read.parquet(f"{path}/stats").drop("tokenizer")
    stats.write.mode("overwrite").parquet(f"{path}/stats_tmp")
    spark.read.parquet(f"{path}/stats_tmp").write.mode("overwrite") \
        .parquet(f"{path}/stats")
    assert index_tokenizer(spark.read.parquet(f"{path}/stats")) == "ascii"
    assert [r["id"] for r in
            index_search_topk(spark, path, ["gamma"]).collect()] == [2]
    batch = spark.createDataFrame([(3, "gamma delta")],
                                  "id long, text string")
    append_to_search_index(batch, "id", "text", path)
    st = spark.read.parquet(f"{path}/stats")
    assert index_tokenizer(st) == "ascii"
    assert sorted(r["id"] for r in
                  index_search_topk(spark, path, ["gamma"]).collect()) \
        == [2, 3]


# ---------------------------------------------------------------------------
# Hybrid RRF fusion
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hybrid_data(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"),
         (1, "spark join join merge"),
         (2, "spark scan merge hash"),
         (3, "nothing relevant here"),
         (4, "join scan")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]),
         (1, [0.9, 0.1, 0.0]),
         (2, [0.0, 1.0, 0.0]),
         (3, [0.95, 0.05, 0.0]),
         (4, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    return docs, emb


def test_hybrid_rrf_matches_hand_fusion(spark, hybrid_data):
    docs, emb = hybrid_data
    out = (S.hybrid_topk_rrf(docs, emb, ["join", "scan", "merge"], 0,
                             k=5, n_sparse=3, n_dense=3)
           .toPandas().set_index("doc_id").sort_index())
    # dense ranks vs query 0 (excluding itself): 3 (cos~.997), 1 (~.994),
    # then 2 and 4 at cosine 0 -> tie broken by id: 2 gets rank 3
    assert out.loc[3, "dense_rank"] == 1
    assert out.loc[1, "dense_rank"] == 2
    # sparse: doc 1 (join x2 + merge), 2 (scan+merge), 4 (join+scan)
    # all hit; docs 0/3 never — doc 3 is dense-only, doc 0 (the query,
    # excluded from dense; no sparse hits) is absent entirely
    assert out.loc[3, "sparse_rank"] == 0     # 0-sentinel, not NULL
    assert 0 not in out.index
    assert set(out.index) <= {1, 2, 3, 4}
    for doc_id, row in out.iterrows():
        want = 0.0
        if row["sparse_rank"] > 0:
            want += 1.0 / (60 + row["sparse_rank"])
        if row["dense_rank"] > 0:
            want += 1.0 / (60 + row["dense_rank"])
        assert row["rrf_score"] == pytest.approx(want, rel=0, abs=0)
    # fused order is rrf desc, then id
    ranked = out.sort_values("rank")
    assert list(ranked["rrf_score"]) == sorted(
        ranked["rrf_score"], reverse=True)
    # a doc in BOTH lists outranks a doc in only one at similar ranks
    assert out.loc[1, "rank"] < out.loc[3, "rank"]


def test_hybrid_rrf_query_doc_excluded_and_validation(spark, hybrid_data):
    docs, emb = hybrid_data
    out = S.hybrid_topk_rrf(docs, emb, ["alpha"], 0, k=5,
                            n_sparse=2, n_dense=2).toPandas()
    # vec 0 is the query: it may enter via the SPARSE list ('alpha'
    # matches doc 0) but never via the dense list
    sub = out.set_index("doc_id")
    if 0 in sub.index:
        assert sub.loc[0, "dense_rank"] == 0
    with pytest.raises(ValueError, match="rrf_k"):
        S.hybrid_topk_rrf(docs, emb, ["alpha"], 0, rrf_k=0)


def test_hybrid_rrf_deterministic_across_partitioning(spark, hybrid_data):
    docs, emb = hybrid_data
    a = S.hybrid_topk_rrf(docs.repartition(2), emb.repartition(3),
                          ["join", "scan", "merge"], 0, k=5).collect()
    b = S.hybrid_topk_rrf(docs.repartition(5), emb.repartition(1),
                          ["join", "scan", "merge"], 0, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
