"""Corpus-curation operator tests: line-level dedup, greedy sequence
packing, temperature source-mixing — edge cases the gate data can't hit
(empty/null docs, single-line docs, budget-straddling documents, strata
with equal counts) plus partitioning-invariance of every assignment."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.functions.packing import chunk_summary, pack_greedy
from stream2segment_spark.functions.sampling import (
    temperature_rates, temperature_sample)
from stream2segment_spark.operators.dedup import line_dedup


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lined(spark):
    rows = [
        Row(doc_id=1, text="keep me\ncommon banner\nunique one"),
        Row(doc_id=2, text="common banner\nanother keeper"),
        Row(doc_id=3, text="common banner\ncommon banner\nsolo line"),
        Row(doc_id=4, text=""),          # one empty line
        Row(doc_id=5, text=None),        # null text
    ]
    return spark.createDataFrame(rows).withColumn(
        "__lines", F.split(F.coalesce("text", F.lit("")), "\n"))


def test_line_dedup_drops_common_lines(spark, lined):
    out = {r.doc_id: r for r in
           line_dedup(lined, "doc_id", "__lines", max_df=2).collect()}
    # 'common banner' occurs in 3 DISTINCT docs (the in-doc repeat in doc 3
    # must not inflate the count beyond distinct docs) -> dropped everywhere
    assert out[1].cleaned_text == "keep me\nunique one"
    assert out[1].n_lines == 3 and out[1].n_kept == 2
    assert out[2].cleaned_text == "another keeper"
    assert out[3].cleaned_text == "solo line"
    assert out[3].n_lines == 3 and out[3].n_kept == 1
    # empty + null docs survive as one (empty) line: '' occurs in 2 docs <= max_df
    assert out[4].cleaned_text == "" and out[4].n_kept == 1
    assert out[5].cleaned_text == ""


def test_line_dedup_keeps_docs_with_empty_or_null_lines(spark, lined):
    """A doc whose lines array is empty or null still yields one output
    row (n_lines = n_kept = 0, cleaned_text = '') — posexplode produces
    no rows for it, so the aggregate must be left-joined back."""
    rows = [Row(doc_id=1, lines=["a", "b"]),
            Row(doc_id=2, lines=[]),
            Row(doc_id=3, lines=None)]
    df = spark.createDataFrame(
        rows, "doc_id: long, lines: array<string>")
    out = {r.doc_id: r for r in
           line_dedup(df, "doc_id", "lines", max_df=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_lines == 2 and out[1].cleaned_text == "a\nb"
    for d in (2, 3):
        assert out[d].n_lines == 0 and out[d].n_kept == 0
        assert out[d].cleaned_text == ""


def test_line_dedup_distinct_doc_threshold(spark, lined):
    # max_df=3 keeps 'common banner' (exactly 3 distinct docs)
    out = {r.doc_id: r.n_kept for r in
           line_dedup(lined, "doc_id", "__lines", max_df=3).collect()}
    assert out[1] == 3 and out[3] == 3


def test_line_dedup_order_preserved_any_partitioning(spark, lined):
    a = {r.doc_id: r.cleaned_text for r in
         line_dedup(lined.repartition(7), "doc_id", "__lines").collect()}
    b = {r.doc_id: r.cleaned_text for r in
         line_dedup(lined.coalesce(1), "doc_id", "__lines").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# duplicated_spans (substring-level dedup)
# ---------------------------------------------------------------------------

def test_duplicated_spans_marks_shared_runs(spark):
    from stream2segment_spark.operators.dedup import duplicated_spans
    shared1 = "one two three four five six seven eight nine ten"  # 10 toks
    shared2 = "red orange yellow green blue indigo violet gray"   # 8 toks
    rows = [
        # doc 0: shared1 at start + unique tail + shared2 at end -> 2 spans
        Row(doc_id=0, text=shared1 + " u1 u2 u3 u4 u5 " + shared2),
        Row(doc_id=1, text="x1 x2 " + shared1 + " y1 y2"),
        Row(doc_id=2, text=shared2 + " z1 z2 z3"),
        Row(doc_id=3, text="all unique tokens in this document entirely"),
        Row(doc_id=4, text="short doc"),                 # < k tokens
    ]
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    out = {r.doc_id: r for r in duplicated_spans(
        df, "doc_id", "toks", k=8, max_df=1).collect()}
    # doc 0: spans cover exactly the two shared runs (10 + 8 tokens)
    assert out[0].n_spans == 2 and out[0].dup_tokens == 18
    # doc 1: one 10-token span, 3 windows (starts 2,3,4)
    assert out[1].n_spans == 1 and out[1].dup_tokens == 10
    assert out[1].n_dup_windows == 3
    # doc 2: one 8-token span, single window
    assert out[2].n_spans == 1 and out[2].dup_tokens == 8
    assert out[2].n_dup_windows == 1
    # unique + short docs report zeros but keep their token counts
    assert out[3].n_spans == 0 and out[3].dup_frac == 0.0
    assert out[4].n_spans == 0 and out[4].n_tokens == 2


def test_duplicated_spans_null_toks_count_as_zero(spark):
    """size(null array) is -1 in Spark; a null token array must surface
    as n_tokens = 0 (and dup_frac 0), not the -1 sentinel."""
    from stream2segment_spark.operators.dedup import duplicated_spans
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=["a"] * 10), Row(doc_id=2, toks=None)],
        "doc_id: long, toks: array<string>")
    out = {r.doc_id: r for r in duplicated_spans(
        df, "doc_id", "toks", k=8, max_df=1).collect()}
    assert out[2].n_tokens == 0
    assert out[2].dup_frac == 0.0 and out[2].n_spans == 0


def test_duplicated_spans_in_doc_repeat_not_counted(spark):
    """A window repeated WITHIN one doc only (distinct-doc df = 1) is not
    duplication across the corpus."""
    from stream2segment_spark.operators.dedup import duplicated_spans
    run = "a b c d e f g h"
    df = spark.createDataFrame(
        [Row(doc_id=0, text=run + " mid1 mid2 " + run),
         Row(doc_id=1, text="totally different words here now ok fine yes")]
    ).select("doc_id", F.split("text", " ").alias("toks"))
    out = {r.doc_id: r for r in duplicated_spans(
        df, "doc_id", "toks", k=8, max_df=1).collect()}
    assert out[0].n_spans == 0 and out[0].dup_tokens == 0


# ---------------------------------------------------------------------------
# pack_greedy
# ---------------------------------------------------------------------------

def test_pack_chunks_respect_start_offsets(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(37)) + 1).alias("n_tok"))
    packed = pack_greedy(docs, "doc_id", "n_tok", budget=100, n_shards=4)
    rows = packed.collect()
    # replay the definition per shard in python
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.chunk_id == cum // 100, (shard, r)
            cum += r.n_tok
    # every doc assigned exactly once; chunk fill bounded by budget + max doc
    summ = chunk_summary(packed, "doc_id", "n_tok").collect()
    assert sum(c.n_docs for c in summ) == 500
    assert all(c.sum_tokens <= 100 + 37 for c in summ)


def test_pack_oversize_doc_gets_own_chunks(spark):
    # a doc bigger than the budget still lands in ONE chunk (start-offset
    # packing never splits); the next doc starts a later chunk
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_tok=t) for i, t in
         [(1, 10), (2, 500), (3, 10)]])
    packed = {r.doc_id: r.chunk_id for r in
              pack_greedy(docs, "doc_id", "n_tok", budget=100,
                          n_shards=1).collect()}
    assert packed[1] == 0 and packed[2] == 0   # starts at offset 10
    assert packed[3] == 5                      # starts at offset 520


def test_pack_partitioning_invariant(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit(17).alias("n_tok"))
    a = {r.doc_id: (r.shard, r.chunk_id) for r in
         pack_greedy(docs.repartition(13), "doc_id", "n_tok").collect()}
    b = {r.doc_id: (r.shard, r.chunk_id) for r in
         pack_greedy(docs.coalesce(1), "doc_id", "n_tok").collect()}
    assert a == b


def test_pack_rejects_bad_params(spark):
    docs = spark.range(3).select(F.col("id").alias("doc_id"),
                                 F.lit(1).alias("n_tok"))
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(docs, "doc_id", "n_tok", budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_greedy(docs, "doc_id", "n_tok", n_shards=0)


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed(spark):
    # 4 strata with counts 100 / 400 / 1600 / 6400 (16x spread)
    return spark.range(0, 8500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "a").when(F.col("id") < 500, "b")
         .when(F.col("id") < 2100, "c").otherwise("d").alias("source"))


def test_temperature_rates_sqrt_law(spark, skewed):
    rates = {r.source: r for r in
             temperature_rates(skewed, "source", alpha=0.5).collect()}
    assert rates["a"].rate == pytest.approx(1.0)      # smallest keeps all
    assert rates["b"].rate == pytest.approx(0.5)      # sqrt(100/400)
    assert rates["c"].rate == pytest.approx(0.25)
    assert rates["d"].rate == pytest.approx(0.125)
    assert rates["d"].n_total == 6400


def test_temperature_sample_achieves_sqrt_mix(spark, skewed):
    kept = {r.source: r["count"] for r in
            temperature_sample(skewed, "doc_id", "source")
            .groupBy("source").count().collect()}
    # kept counts proportional to sqrt(n): 100/200/400/800 (within md5 noise)
    assert kept["a"] == 100                           # rate 1.0 is exact
    for src, expect in [("b", 200), ("c", 400), ("d", 800)]:
        assert kept[src] == pytest.approx(expect, rel=0.2), src


def test_temperature_alpha_extremes(spark, skewed):
    # alpha=1 keeps the natural mix (every rate 1.0)
    nat = temperature_rates(skewed, "source", alpha=1.0).collect()
    assert all(r.rate == pytest.approx(1.0) for r in nat)
    # alpha=0 flattens: every stratum's kept count ~= n_min
    flat = {r.source: r.rate for r in
            temperature_rates(skewed, "source", alpha=0.0).collect()}
    assert flat["d"] == pytest.approx(100 / 6400)


# ---------------------------------------------------------------------------
# kmeans_quantized
# ---------------------------------------------------------------------------

def _blobs(spark, n_per=40, sep=10.0):
    # 3 well-separated 4-d blobs with deterministic in-blob jitter
    rows = []
    for b, center in enumerate([(0.0, 0.0, 0.0, 0.0),
                                (sep, sep, 0.0, 0.0),
                                (0.0, 0.0, sep, sep)]):
        for i in range(n_per):
            jit = [((i * 7 + d * 3) % 5 - 2) * 0.01 for d in range(4)]
            rows.append(Row(vec_id=b * n_per + i,
                            vec=[c + j for c, j in zip(center, jit)],
                            blob=b))
    return spark.createDataFrame(rows)


def test_kmeans_recovers_separated_blobs(spark):
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark)
    assigned, cents = kmeans_quantized(df, "vec_id", "vec", k=3, iters=3)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    truth = {r.vec_id: r.blob for r in df.collect()}
    # each true blob maps to exactly one cluster and vice versa
    mapping = {}
    for vid, cid in got.items():
        mapping.setdefault(truth[vid], set()).add(cid)
    assert all(len(cids) == 1 for cids in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)


def test_kmeans_partitioning_invariant(spark):
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark)
    a, ca = kmeans_quantized(df.repartition(9), "vec_id", "vec", k=4, iters=2)
    b, cb = kmeans_quantized(df.coalesce(1), "vec_id", "vec", k=4, iters=2)
    assert ca == cb
    assert ({(r.vec_id, r.cluster_id, r.dist2) for r in a.collect()}
            == {(r.vec_id, r.cluster_id, r.dist2) for r in b.collect()})


def test_kmeans_rejects_bad_k(spark):
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark, n_per=2)
    with pytest.raises(ValueError, match="k and iters"):
        kmeans_quantized(df, "vec_id", "vec", k=0)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_quantized(df, "vec_id", "vec", k=100)


def test_kmeans_farthest_init_separates_blobs_immediately(spark):
    """Farthest-point init places one seed per separated blob, so even
    ONE Lloyd iteration recovers the exact partition; and it is
    deterministic across partitionings."""
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark)
    assigned, cents = kmeans_quantized(df, "vec_id", "vec", k=3, iters=1,
                                       init="farthest")
    truth = {r.vec_id: r.blob for r in df.collect()}
    mapping = {}
    for r in assigned.collect():
        mapping.setdefault(truth[r.vec_id], set()).add(r.cluster_id)
    assert all(len(c) == 1 for c in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3
    _, cents2 = kmeans_quantized(df.repartition(5), "vec_id", "vec",
                                 k=3, iters=1, init="farthest")
    assert cents == cents2
    with pytest.raises(ValueError, match="unknown init"):
        kmeans_quantized(df, "vec_id", "vec", init="nope")


def test_kmeans_iteration_tightens_clusters(spark):
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark, sep=3.0)
    d1 = kmeans_quantized(df, "vec_id", "vec", k=3, iters=1)[0] \
        .agg(F.sum("dist2")).first()[0]
    d3 = kmeans_quantized(df, "vec_id", "vec", k=3, iters=3)[0] \
        .agg(F.sum("dist2")).first()[0]
    assert d3 <= d1


def test_temperature_null_stratum_passthrough(spark):
    """Rows with a NULL stratum survive unsampled and don't distort
    n_min: 10 NULL rows beside 100/10000 strata must not drag the
    100-row stratum's rate below 1.0, and must all be kept."""
    df = spark.range(0, 10110).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, None)
         .when(F.col("id") < 110, "small").otherwise("big")
         .alias("source"))
    rates = {r.source: r.rate for r in
             temperature_rates(df, "source").collect()}
    assert None not in rates
    assert rates["small"] == pytest.approx(1.0)
    kept = temperature_sample(df, "doc_id", "source")
    null_kept = kept.filter("source IS NULL").count()
    assert null_kept == 10                      # passthrough, no loss
    assert kept.filter("source = 'small'").count() == 100


def test_temperature_sample_partitioning_invariant(spark, skewed):
    a = sorted(r.doc_id for r in temperature_sample(
        skewed.repartition(11), "doc_id", "source").collect())
    b = sorted(r.doc_id for r in temperature_sample(
        skewed.coalesce(1), "doc_id", "source").collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# hashed n-gram embeddings
# ---------------------------------------------------------------------------

def test_hash_embedding_properties(spark):
    from stream2segment_spark.functions.embeddings import (
        embed_text, hashed_ngram_embeddings)
    import numpy as np
    v = embed_text("the quick brown fox")
    assert v.shape == (64,) and np.isclose(np.linalg.norm(v), 1.0)
    # normalization-insensitive: case/punct collapse identically
    assert np.array_equal(v, embed_text("The  QUICK, brown: fox!"))
    assert np.array_equal(embed_text(None), np.zeros(64))
    assert np.array_equal(embed_text("!!!"), np.zeros(64))
    # near-dup texts land close, unrelated far
    a = embed_text("the quick brown fox jumps over the lazy dog " * 3)
    b = embed_text("the quick brown fox jumps over the lazy cat " * 3)
    c = embed_text("entirely unrelated words appear in this corpus text")
    assert float(a @ b) > 0.8 > float(a @ c)
    # UDF path equals the driver-side twin, any partitioning
    from pyspark.sql import Row
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in
         enumerate(["alpha beta", "gamma delta", None, ""])])
    got = {r.doc_id: r.embedding for r in hashed_ngram_embeddings(
        df.repartition(3), "text", "doc_id").collect()}
    for i, t in enumerate(["alpha beta", "gamma delta", None, ""]):
        assert np.array_equal(np.array(got[i]), embed_text(t)), i


def test_hash_embedding_feeds_similarity_stack(spark):
    """Raw text -> hashed embeddings -> LSH cosine near-dup finds the
    engineered near-duplicate pair and nothing else at 0.9."""
    from pyspark.sql import Row

    from stream2segment_spark.functions.embeddings import (
        hashed_ngram_embeddings)
    from stream2segment_spark.operators.similarity import lsh_bucket_neardup
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "completely different subject matter discussing spark plans",
        "yet another unrelated document about parquet file layouts",
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, text=t) for i, t in enumerate(texts)])
    emb = hashed_ngram_embeddings(df, "text", "vec_id")
    pairs = {(r.id_a, r.id_b) for r in lsh_bucket_neardup(
        emb, id_col="vec_id", vec_col="embedding", dim=64,
        num_planes=8, threshold=0.9, multiprobe=True).collect()}
    assert pairs == {(0, 1)}


def test_kmeans_parallel_init_recovers_blobs(spark):
    """k-means|| init (deterministic Bahmani sampling + weighted greedy
    reduction) recovers the separated-blob partition in one Lloyd
    iteration, like farthest — but with O(rounds) jobs, not O(k)."""
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark)
    assigned, cents = kmeans_quantized(df, "vec_id", "vec", k=3, iters=1,
                                       init="parallel")
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    truth = {r.vec_id: r.blob for r in df.collect()}
    mapping = {}
    for vid, cid in got.items():
        mapping.setdefault(truth[vid], set()).add(cid)
    assert all(len(cids) == 1 for cids in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3


def test_kmeans_parallel_init_deterministic_any_partitioning(spark):
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark)
    a, ca = kmeans_quantized(df.repartition(11), "vec_id", "vec", k=5,
                             iters=2, init="parallel")
    b, cb = kmeans_quantized(df.coalesce(1), "vec_id", "vec", k=5,
                             iters=2, init="parallel")
    assert ca == cb
    assert ({(r.vec_id, r.cluster_id, r.dist2) for r in a.collect()}
            == {(r.vec_id, r.cluster_id, r.dist2) for r in b.collect()})


def test_kmeans_parallel_init_degenerate_topup(spark):
    """Fewer spread points than k: the init tops up from hash order and
    still returns k distinct seeds when the data allows it."""
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = _blobs(spark, n_per=3)  # 9 rows
    assigned, cents = kmeans_quantized(df, "vec_id", "vec", k=8, iters=1,
                                       init="parallel")
    assert len(cents) == 8
    assert assigned.count() == 9


# ---------------------------------------------------------------------------
# longest_duplicated_substring (exact, binary search on length)
# ---------------------------------------------------------------------------

def _lds(spark, rows, **kw):
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    return longest_duplicated_substring(df, "doc_id", "toks", **kw)


def test_longest_dup_finds_exact_max_run(spark):
    shared = "alpha beta gamma delta epsilon zeta"        # 6 tokens
    rows = [Row(doc_id=0, text="x1 " + shared + " y1 y2"),
            Row(doc_id=1, text=shared + " z9"),
            Row(doc_id=2, text="unrelated words entirely here now")]
    out = _lds(spark, rows).collect()
    assert len(out) == 1
    r = out[0]
    # the maximal shared run is `shared` + nothing: length 6, 2 docs
    assert r.length == 6 and r.text == shared
    assert r.n_docs == 2 and r.n_occ == 2


def test_longest_dup_reports_all_ties(spark):
    a = "one two three four"
    b = "red green blue white"
    rows = [Row(doc_id=0, text=a + " mid " + b),
            Row(doc_id=1, text=b + " x " + a)]
    out = {r.text: r for r in _lds(spark, rows).collect()}
    assert set(out) == {a, b}
    assert all(r.length == 4 and r.n_docs == 2 for r in out.values())


def test_longest_dup_in_doc_repeat_not_cross_doc(spark):
    run = "p q r s t"
    rows = [Row(doc_id=0, text=run + " mid " + run),   # only within doc 0
            Row(doc_id=1, text="different things here p q")]
    out = _lds(spark, rows).collect()
    # the only CROSS-doc duplicated substring is 'p q' (length 2)
    assert len(out) == 1 and out[0].text == "p q" and out[0].length == 2


def test_longest_dup_empty_when_no_duplication(spark):
    rows = [Row(doc_id=0, text="aa bb cc"), Row(doc_id=1, text="dd ee ff")]
    out = _lds(spark, rows)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "length", "text", "n_docs", "n_occ"]


def test_longest_dup_max_len_cap_and_min_len_floor(spark):
    shared = "a b c d e f g h"  # 8 tokens shared
    rows = [Row(doc_id=0, text=shared + " tail0"),
            Row(doc_id=1, text=shared + " tail1")]
    capped = _lds(spark, rows, max_len=5).collect()
    # the cap truncates the search at 5: EVERY 5-token sliding window of
    # the 8-token shared run is a duplicated substring of length 5
    assert {r.text for r in capped} == {
        "a b c d e", "b c d e f", "c d e f g", "d e f g h"}
    assert all(r.length == 5 and r.n_docs == 2 for r in capped)
    floor = _lds(spark, rows, min_len=9)
    assert floor.count() == 0  # nothing >= 9 duplicated


def test_longest_dup_null_toks_and_partitioning_invariance(spark):
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    shared = "k l m n"
    df = spark.createDataFrame(
        [Row(doc_id=0, toks=shared.split()),
         Row(doc_id=1, toks=("pre " + shared).split()),
         Row(doc_id=2, toks=None)],
        "doc_id: long, toks: array<string>")
    a = {(r.length, r.text, r.n_docs, r.n_occ) for r in
         longest_duplicated_substring(df.repartition(7), "doc_id",
                                      "toks").collect()}
    b = {(r.length, r.text, r.n_docs, r.n_occ) for r in
         longest_duplicated_substring(df.coalesce(1), "doc_id",
                                      "toks").collect()}
    assert a == b == {(4, shared, 2, 2)}


# ---------------------------------------------------------------------------
# cut_duplicated_spans (exact substring REMOVAL)
# ---------------------------------------------------------------------------

def test_cut_duplicated_spans_removes_all_occurrences(spark):
    from stream2segment_spark.operators.dedup import (
        cut_duplicated_spans, duplicated_spans)
    shared = "one two three four five six seven eight nine ten"  # 10 toks
    rows = [Row(doc_id=0, text=shared + " u1 u2 u3"),
            Row(doc_id=1, text="x1 x2 " + shared + " y1"),
            Row(doc_id=2, text="all unique tokens in this document here")]
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    out = {r.doc_id: r for r in cut_duplicated_spans(
        df, "doc_id", "toks", k=8, max_df=1).collect()}
    # ALL occurrences cut (Lee et al. ExactSubstr semantics)
    assert out[0].cleaned_text == "u1 u2 u3" and out[0].n_removed == 10
    assert out[1].cleaned_text == "x1 x2 y1" and out[1].n_removed == 10
    assert out[2].cleaned_text.startswith("all unique")
    assert out[2].n_removed == 0
    # n_removed agrees with the detection operator's dup_tokens
    det = {r.doc_id: r.dup_tokens for r in duplicated_spans(
        df, "doc_id", "toks", k=8, max_df=1).collect()}
    assert all(out[d].n_removed == det[d] for d in det)


def test_cut_duplicated_spans_edges(spark):
    from stream2segment_spark.operators.dedup import cut_duplicated_spans
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=["a"] * 3), Row(doc_id=2, toks=None),
         Row(doc_id=3, toks=[])],
        "doc_id: long, toks: array<string>")
    out = {r.doc_id: r for r in cut_duplicated_spans(
        df, "doc_id", "toks", k=8).collect()}
    assert out[1].cleaned_text == "a a a" and out[1].n_removed == 0
    for d in (2, 3):
        assert out[d].n_tokens == 0 and out[d].cleaned_text == ""


def test_cut_duplicated_spans_partitioning_invariant(spark):
    from stream2segment_spark.operators.dedup import cut_duplicated_spans
    run = "m n o p q r s t u"
    rows = [Row(doc_id=i, text=(f"w{i} " * (i + 1)) + run + f" z{i}")
            for i in range(6)]
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    a = {(r.doc_id, r.cleaned_text, r.n_removed) for r in
         cut_duplicated_spans(df.repartition(5), "doc_id", "toks",
                              k=8).collect()}
    b = {(r.doc_id, r.cleaned_text, r.n_removed) for r in
         cut_duplicated_spans(df.coalesce(1), "doc_id", "toks",
                              k=8).collect()}
    assert a == b
    assert all(t.endswith(f"z{d}") and run not in t for d, t, _ in a)


# ---------------------------------------------------------------------------
# repetition_signals (Gopher repetition filters)
# ---------------------------------------------------------------------------

def test_repetition_row_top_ngram_and_tiebreak():
    from stream2segment_spark.functions.text import _repetition_row
    # tokens: a b a b c  -> 2-grams: "a b" x2, "b a", "b c"; top = "a b"
    # (count 2), chars 2*2=4 over total 5
    r = _repetition_row("a b a b c")
    assert r[0] == 4 / 5
    # tie at count 1: lexicographically smallest 2-gram wins ("aa zz" vs
    # "zz bb" -> "aa zz", 4 chars of 8)
    r = _repetition_row("aa zz bb")
    assert r[0] == 4 / 6


def test_repetition_row_dup_coverage_counts_chars_once():
    from stream2segment_spark.functions.text import _repetition_row
    # "x1 x2 x3 x4 x5" repeated twice with a separator: the 5-gram
    # appears twice, covering all ten x-tokens (20 chars) but not "sep".
    text = "x1 x2 x3 x4 x5 sep x1 x2 x3 x4 x5"
    r = _repetition_row(text)
    total = 10 * 2 + 3
    assert r[3] == 20 / total          # dup_5gram_frac
    # overlapping dup windows must not double-count chars: 6-grams
    # "x2..sep x1" etc. are unique here -> 0
    assert r[4] == 0.0


def test_repetition_row_degenerate_inputs():
    from stream2segment_spark.functions.text import _repetition_row
    assert _repetition_row(None) == [0.0] * 11
    assert _repetition_row("") == [0.0] * 11
    assert _repetition_row("one") == [0.0] * 11       # < n tokens everywhere
    # punctuation-only: tokenizer yields nothing
    assert _repetition_row("!!! ???")[:9] == [0.0] * 9


def test_repetition_row_line_fractions():
    from stream2segment_spark.functions.text import _repetition_row
    r = _repetition_row("aaa\nbb\naaa\naaa")
    # 4 lines, 2 repeats of "aaa" after the first -> dup_line_frac 0.5;
    # repeated chars 6 of 11 total line chars
    assert r[9] == 2 / 4
    assert r[10] == 6 / 11


def test_repetition_signals_dataframe(spark):
    from stream2segment_spark.functions.text import (
        _repetition_row, repetition_signals)
    rows = [Row(doc_id=1, text="a b a b c"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="x1 x2 x3 x4 x5 sep x1 x2 x3 x4 x5")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           repetition_signals(df, "text", "doc_id").collect()}
    assert len(out) == 3
    for doc_id, text in [(1, "a b a b c"), (2, None),
                         (3, "x1 x2 x3 x4 x5 sep x1 x2 x3 x4 x5")]:
        expect = _repetition_row(text)
        got = [out[doc_id][n] for n in out[doc_id].asDict() if n != "doc_id"]
        assert got == expect, (doc_id, got, expect)


# ---------------------------------------------------------------------------
# c4_signals (C4 heuristic cleaning, Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

def _c4(spark, rows):
    from stream2segment_spark.functions.text import c4_signals
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in
            c4_signals(df, "doc_id", "text").collect()}


def test_c4_line_rules(spark):
    out = _c4(spark, [
        # terminal punct + >=5 words kept; short / unterminated /
        # javascript lines dropped
        (1, "This is a good long sentence here.\n"
            "short.\n"
            "Another full sentence with enough words!\n"
            "A question with plenty of words here?\n"
            "no terminal punctuation on this line\n"
            "This line mentions JavaScript and is dropped."),
    ])
    r = out[1]
    assert r["n_lines"] == 6 and r["n_kept"] == 3
    assert r["kept_frac"] == 3 / 6
    assert r["cleaned_text"].count("\n") == 2
    assert "short." not in r["cleaned_text"]
    assert "JavaScript" not in r["cleaned_text"]


def test_c4_quote_terminal_and_null(spark):
    out = _c4(spark, [
        (1, 'He said "stop right there immediately now"'),
        (2, None),
    ])
    assert out[1]["n_kept"] == 1          # end-quote is a terminal mark
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["cleaned_text"] == "" and out[2]["c4_keep"] is False


def test_c4_doc_rules(spark):
    good = ("Good line one with many words here.\n"
            "Good line two with many words here.\n"
            "Good line three with many words here.")
    out = _c4(spark, [
        (1, good),
        (2, good + "\nlorem ipsum dolor sit amet."),
        (3, good + "\ncode with { a brace } inside."),
        (4, good + "\nbuy viagra online now for cheap."),
        (5, "Only two good lines right here now.\n"
            "And the second good line here too."),
    ])
    assert out[1]["c4_keep"] is True
    assert out[2]["has_lorem"] and not out[2]["c4_keep"]
    assert out[3]["has_brace"] and not out[3]["c4_keep"]
    assert out[4]["has_bad_word"] and not out[4]["c4_keep"]
    assert out[5]["n_kept"] == 2 and out[5]["c4_keep"] is False


# ---------------------------------------------------------------------------
# gopher_quality_signals (Gopher table A1 §A1.1, non-repetition rules)
# ---------------------------------------------------------------------------

def _gq(spark, rows):
    from stream2segment_spark.functions.text import gopher_quality_signals
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in
            gopher_quality_signals(df, "doc_id", "text").collect()}


def test_gopher_rules_each_fire(spark):
    good = " ".join(
        f"the data and words of that have with extra filler w{i}"
        for i in range(6))                      # 66 words, 6 stopwords
    out = _gq(spark, [
        (1, good),
        (2, None),                               # degenerate
        (3, good + " " + "# " * 20),             # symbol ratio
        (4, good + "\n" + "\n".join("• b" for _ in range(40))),  # bullets
        (5, good + "\n" + "\n".join(f"l{i}..." for i in range(3))),
        (6, " ".join(str(i) for i in range(80))),  # no alpha, no stopwords
    ])
    assert out[1]["gopher_keep"] is True and out[1]["n_stopwords"] >= 2
    assert out[2]["n_words"] == 0 and out[2]["gopher_keep"] is False
    assert out[3]["symbol_word_ratio"] > 0.1 and not out[3]["gopher_keep"]
    assert out[4]["bullet_line_frac"] > 0.9 and not out[4]["gopher_keep"]
    assert out[5]["ellipsis_line_frac"] > 0.3 and not out[5]["gopher_keep"]
    assert out[6]["alpha_word_frac"] == 0.0 and not out[6]["gopher_keep"]


def test_gopher_word_count_and_mean_length_bands(spark):
    out = _gq(spark, [
        (1, "the be to of and that have with short doc"),  # 10 words < 50
        (2, " ".join(["the be to of and that have with"]
                     + ["supercalifragilistic"] * 60)),     # mwl > 10
    ])
    assert out[1]["n_words"] == 10 and not out[1]["gopher_keep"]
    assert out[2]["mean_word_len"] > 10 and not out[2]["gopher_keep"]


# ---------------------------------------------------------------------------
# chunk_documents (overlapping token windows)
# ---------------------------------------------------------------------------

def test_chunk_documents_exact_windows(spark):
    from stream2segment_spark.functions.packing import chunk_documents
    rows = [(1, [f"t{i}" for i in range(11)]),  # 11 toks, w=4, o=1 -> 4
            (2, []), (3, None),
            (4, [f"x{i}" for i in range(4)])]   # exactly one window
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    out = chunk_documents(df, "doc_id", "toks", window=4, overlap=1)
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk_toks"]
           for r in out.collect()}
    assert got[(1, 0)] == ["t0", "t1", "t2", "t3"]
    assert got[(1, 1)] == ["t3", "t4", "t5", "t6"]
    assert got[(1, 2)] == ["t6", "t7", "t8", "t9"]
    assert got[(1, 3)] == ["t9", "t10"]          # short tail chunk
    assert got[(2, 0)] == [] and got[(3, 0)] == []   # one empty chunk
    assert got[(4, 0)] == ["x0", "x1", "x2", "x3"]
    assert len(got) == 4 + 1 + 1 + 1
    # coverage: consecutive chunks overlap by exactly `overlap` tokens
    assert got[(1, 0)][-1:] == got[(1, 1)][:1]


def test_chunk_documents_validation(spark):
    from stream2segment_spark.functions.packing import chunk_documents
    df = spark.createDataFrame([(1, ["a"])], "doc_id long, toks array<string>")
    with pytest.raises(ValueError, match="window"):
        chunk_documents(df, "doc_id", "toks", window=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "toks", window=4, overlap=4)


# ---------------------------------------------------------------------------
# winnow_fingerprints (Schleimer et al. winnowing)
# ---------------------------------------------------------------------------

def test_winnowing_guarantee_and_density(spark):
    """Any shared run of >= k+w-1 tokens yields a shared fingerprint;
    selection density is ~1/w."""
    from stream2segment_spark.operators.dedup import winnow_fingerprints
    base = " ".join(f"u{i}" for i in range(40))
    shared = " ".join(f"s{i}" for i in range(8))     # k+w-1 = 8 tokens
    rows = [(1, base + " " + shared),
            (2, shared + " " + " ".join(f"v{i}" for i in range(40)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect()
    by = {}
    for r in fps:
        by.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by[1] & by[2]                 # guaranteed shared fingerprint
    # density: doc 1 has 48 tokens -> 44 grams; ~1/w selected (loose)
    assert len(by[1]) <= 44 // 2


def test_winnowing_rightmost_tie_and_edge_cases(spark):
    from stream2segment_spark.operators.dedup import winnow_fingerprints
    rows = [(1, None), (2, ""), (3, "one two three"),       # < k tokens
            (4, "a b a b a b a b a b")]                     # repeats
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert 1 not in got and 2 not in got             # empty docs: no rows
    assert len(got[3]) == 1 and got[3][0][0] == 0    # whole-doc fallback
    # identical grams everywhere: rightmost-tie keeps advancing the
    # selected position, so multiple positions of the SAME hash appear
    assert len({fp for _, fp in got[4]}) <= 2
    assert len(got[4]) >= 2
    import pytest
    with pytest.raises(ValueError, match="positive"):
        winnow_fingerprints(df, "doc_id", "text", k=0)


def test_winnow_candidate_pairs(spark):
    from stream2segment_spark.operators.dedup import (
        winnow_candidate_pairs, winnow_fingerprints)
    shared = " ".join(f"s{i}" for i in range(20))
    rows = [(1, shared + " " + " ".join(f"u{i}" for i in range(30))),
            (2, " ".join(f"v{i}" for i in range(30)) + " " + shared),
            (3, " ".join(f"w{i}" for i in range(50)))]   # unrelated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnow_candidate_pairs(fps).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(p == (1, 2) for p in pairs)   # doc 3 pairs with nobody
    import pytest
    with pytest.raises(ValueError, match="min_shared"):
        winnow_candidate_pairs(fps, min_shared=0)


def test_winnowing_preserves_id_type(spark):
    """Output id column mirrors the input id type (string ids used to be
    hardcoded to long and miscast at the mapInPandas boundary)."""
    from stream2segment_spark.operators.dedup import winnow_fingerprints
    txt = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame([("docA", txt), ("docB", txt)],
                               "doc_id string, text string")
    out = winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    rows = out.collect()
    assert rows and {r["doc_id"] for r in rows} == {"docA", "docB"}


def test_longest_dup_rolling_probe_agrees_with_md5(spark):
    """probe='rolling' (Karp-Rabin over token xxhash64, the long-doc
    scale path) returns exactly what probe='md5' returns on every
    engineered fixture, including ties and in-doc repeats; string ids
    exercise the id-type mirror in the Arrow probe schema."""
    shared_a = "one two three four"
    shared_b = "red green blue white"
    rows = [Row(doc_id="d0", text=shared_a + " mid " + shared_b),
            Row(doc_id="d1", text=shared_b + " x " + shared_a),
            Row(doc_id="d2", text="p q r p q unrelated")]
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    got = {}
    for probe in ("rolling", "md5"):
        got[probe] = {(r.length, r.text, r.n_docs, r.n_occ) for r in
                      longest_duplicated_substring(
                          df, "doc_id", "toks", probe=probe).collect()}
    assert got["rolling"] == got["md5"]
    assert {t for _, t, _, _ in got["rolling"]} == {shared_a, shared_b}
    with pytest.raises(ValueError, match="probe"):
        longest_duplicated_substring(df, "doc_id", "toks", probe="nope")


def test_longest_dup_oneshot_path_matches_search_path(spark):
    """r9 opt round: the one-shot path (small total window count,
    probe='auto') must return exactly what the binary-search path
    returns — ties, in-doc repeats, max_len caps and all.
    oneshot_max_windows=0 forces the search path on the same input."""
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    shared_a = "one two three four"
    shared_b = "red green blue white"
    rows = [Row(doc_id=0, text=shared_a + " mid " + shared_b),
            Row(doc_id=1, text=shared_b + " x " + shared_a),
            Row(doc_id=2, text="p q r p q unrelated"),
            Row(doc_id=3, text="p q r p q unrelated"),
            Row(doc_id=4, text="p q r p q unrelated")]
    df = spark.createDataFrame(rows).select(
        "doc_id", F.split("text", " ").alias("toks"))
    for kw in ({}, {"max_len": 3}, {"min_len": 3}, {"max_df": 2}):
        oneshot = {(r.length, r.text, r.n_docs, r.n_occ) for r in
                 longest_duplicated_substring(
                     df, "doc_id", "toks", **kw).collect()}
        search = {(r.length, r.text, r.n_docs, r.n_occ) for r in
                  longest_duplicated_substring(
                      df, "doc_id", "toks", oneshot_max_windows=0,
                      **kw).collect()}
        assert oneshot == search, kw
        assert oneshot, kw


def test_longest_dup_window_identity_is_token_sequence(spark):
    """Window identity is the token SEQUENCE, not the joined text: two
    docs whose different token arrays join to the same string ('a b'+
    'c' vs 'a'+'b c') are NOT duplicates — and both probe modes agree
    (the md5 probe's join-collision false positive is absorbed by the
    sequence-grouped report's step-down guard)."""
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    rows = [("d0", ["a b", "c", "x0", "y0"]),
            ("d1", ["a", "b c", "x1", "y1"])]
    df = spark.createDataFrame(rows, "doc_id string, toks array<string>")
    for probe in ("md5", "rolling"):
        out = longest_duplicated_substring(
            df, "doc_id", "toks", min_len=1, probe=probe).collect()
        assert out == [], (probe, out)
    # a REAL shared sequence is still found identically by both modes
    rows = [("d0", ["a b", "c", "k", "k2"]), ("d1", ["z", "a b", "c"])]
    df = spark.createDataFrame(rows, "doc_id string, toks array<string>")
    for probe in ("md5", "rolling"):
        out = longest_duplicated_substring(
            df, "doc_id", "toks", min_len=1, probe=probe).collect()
        assert [(r.length, r.text, r.n_docs) for r in out] \
            == [(2, "a b c", 2)], probe


def test_line_dedup_null_line_elements_dropped_explicitly(spark):
    """NULL line elements are dropped up front with documented
    semantics: n_lines counts non-null lines, cleaned_text never
    contains them, and the remaining lines keep their behavior."""
    from stream2segment_spark.operators.dedup import line_dedup
    rows = [(1, [None, "keep me", "boiler"]),
            (2, ["boiler", "other"]),
            (3, ["boiler", None])]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r for r in
           line_dedup(df, "doc_id", "lines", max_df=1).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["cleaned_text"] == "keep me"
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0


# ---------------------------------------------------------------------------
# Best-fit-decreasing packing
# ---------------------------------------------------------------------------

def test_pack_bestfit_never_overfills_and_matches_replay(spark):
    import hashlib

    from stream2segment_spark.functions.packing import pack_bestfit

    rows = [(i, 1 + (i * 37) % 120) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_bestfit(df, "doc_id", "n_tok", budget=128, n_shards=4)
    pdf = out.toPandas()
    # bins never exceed the budget (no doc here is oversized)
    fills = pdf.groupby(["shard", "bin_id"])["n_tok"].sum()
    assert (fills <= 128).all()
    # every doc assigned exactly once
    assert len(pdf) == 200 and pdf["doc_id"].is_unique

    # python replay of the BFD loop per shard
    def bucket(i):
        h = hashlib.md5(f"pack:{i}".encode()).hexdigest()[:15]
        return (int(h, 16) % 10000) % 4

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, t in rows:
        by_shard.setdefault(bucket(i), []).append((t, i))
    want = {}
    for sh, docs in by_shard.items():
        docs.sort(key=lambda x: (-x[0], x[1]))
        rem: list[int] = []
        for t, i in docs:
            fits = [(r, j) for j, r in enumerate(rem) if r >= t]
            if fits:
                _, j = min(fits)
                rem[j] -= t
            else:
                j = len(rem)
                rem.append(128 - t)
            want[i] = (sh, j)
    got = {r.doc_id: (r.shard, r.bin_id) for r in out.collect()}
    assert got == want


def test_pack_bestfit_oversized_and_null_tokens(spark):
    from stream2segment_spark.functions.packing import pack_bestfit

    df = spark.createDataFrame(
        [(1, 500), (2, 50), (3, None), (4, 60)],
        "doc_id long, n_tok long")
    out = pack_bestfit(df, "doc_id", "n_tok", budget=100, n_shards=1)
    pdf = out.toPandas().set_index("doc_id")
    # the oversized doc owns its bin — nothing shares it
    big_bin = pdf.loc[1, "bin_id"]
    assert (pdf.drop(index=1)["bin_id"] != big_bin).all()
    # NULL packs as 0 tokens and still lands in a bin
    assert pdf.loc[3, "bin_id"] >= 0
    with pytest.raises(ValueError, match="budget"):
        pack_bestfit(df, "doc_id", "n_tok", budget=0)


def test_pack_bestfit_fewer_bins_than_greedy_truncation(spark):
    """BFD's reason to exist: same docs, bins <= naive id-order fills."""
    from stream2segment_spark.functions.packing import pack_bestfit

    rows = [(i, t) for i, t in enumerate([90, 80, 70, 30, 20, 10] * 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_bestfit(df, "doc_id", "n_tok", budget=100, n_shards=1)
    pdf = out.toPandas()
    n_bins = pdf["bin_id"].nunique()
    total = sum(t for _, t in rows)
    assert n_bins >= -(-total // 100)          # lower bound: ceil(sum/B)
    assert n_bins <= 31                        # BFD packs 3000 tokens well
    fills = pdf.groupby("bin_id")["n_tok"].sum()
    assert (fills <= 100).all()
