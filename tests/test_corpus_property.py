"""Property-based tests (hypothesis): the corpus operators vs pure-python
reference implementations on small random corpora — line_dedup's
frequency cut + order preservation, pack_greedy's start-offset rule, and
kmeans assignment's exact-argmin semantics. One Spark job per example, so
examples are few and small; the deterministic md5 machinery means a
failing example replays exactly."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_line = st.sampled_from(["alpha", "beta", "gamma", "delta", "", "alpha "])
_doc = st.lists(_line, min_size=0, max_size=6).map("\n".join)


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 3))
def test_line_dedup_matches_reference(spark, docs, max_df):
    from stream2segment_spark.operators.dedup import line_dedup
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    ).withColumn("__lines", F.split("text", "\n"))
    got = {r.doc_id: (r.n_lines, r.n_kept, r.cleaned_text)
           for r in line_dedup(df, "doc_id", "__lines",
                               max_df=max_df).collect()}
    # pure-python reference: distinct-doc frequency per line, order kept
    freq: dict[str, set] = {}
    for i, t in enumerate(docs):
        for ln in t.split("\n"):
            freq.setdefault(ln, set()).add(i)
    for i, t in enumerate(docs):
        lines = t.split("\n")
        kept = [ln for ln in lines if len(freq[ln]) <= max_df]
        assert got[i] == (len(lines), len(kept), "\n".join(kept)), (
            i, docs, max_df)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 300), min_size=1, max_size=40),
       st.integers(1, 4), st.integers(50, 200))
def test_pack_greedy_matches_reference(spark, toks, n_shards, budget):
    from stream2segment_spark.functions.packing import pack_greedy
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tok=t) for i, t in enumerate(toks)])
    got = {r.doc_id: (r.shard, r.chunk_id)
           for r in pack_greedy(df, "doc_id", "n_tok", budget=budget,
                                n_shards=n_shards, seed="pack").collect()}

    def bucket(i):  # the documented md5 hash-bucket twin
        h = int(hashlib.md5(f"pack:{i}".encode()).hexdigest()[:15], 16)
        return h % 10_000

    shards: dict[int, list] = {}
    for i, t in enumerate(toks):
        shards.setdefault(bucket(i) % n_shards, []).append((i, t))
    for shard, items in shards.items():
        cum = 0
        for i, t in sorted(items):
            assert got[i] == (shard, cum // budget), (i, toks, n_shards)
            cum += t


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=3, max_size=20),
       st.integers(2, 3))
def test_kmeans_assignment_is_exact_argmin(spark, vecs, k):
    """After any number of iterations, every point's cluster must be the
    true integer-grid argmin of its distance to the final centroids
    (first index on ties), and dist2 the exact distance."""
    from stream2segment_spark.operators.clustering import kmeans_quantized
    df = spark.createDataFrame(
        [Row(vec_id=i, vec=[float(x) for x in v])
         for i, v in enumerate(vecs)])
    assigned, cents = kmeans_quantized(df, "vec_id", "vec", k=k, iters=2)
    c = np.asarray(cents, dtype=np.int64)
    for r in assigned.collect():
        v = np.asarray(
            [int(np.floor(abs(x) * 1000 + 0.5) * (1 if x >= 0 else -1))
             for x in vecs[r.vec_id]], dtype=np.int64)
        d = ((v[None, :] - c) ** 2).sum(axis=1)
        assert r.cluster_id == int(d.argmin()), (vecs, cents)
        assert r.dist2 == int(d.min())


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=60)),
                min_size=1, max_size=6))
def test_hash_embedding_udf_equals_twin(spark, texts):
    """Arbitrary (unicode, punctuation, empty, null) text: the memoized
    Arrow path must be bit-identical to the driver-side twin."""
    from stream2segment_spark.functions.embeddings import (
        embed_text, hashed_ngram_embeddings)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r.doc_id: np.array(r.embedding) for r in
           hashed_ngram_embeddings(df.repartition(3), "text",
                                   "doc_id").collect()}
    for i, t in enumerate(texts):
        assert np.array_equal(got[i], embed_text(t)), (i, t)


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from("abcde"), min_size=0,
                         max_size=12).map(lambda x: list(map(str, x))),
                min_size=1, max_size=6),
       st.integers(2, 4))
def test_duplicated_spans_matches_reference(spark, docs, k):
    """Random tiny-alphabet token lists vs a pure-python reference of
    the window-df cut + interval merge."""
    from stream2segment_spark.operators.dedup import duplicated_spans
    df = spark.createDataFrame(
        [Row(doc_id=i, toks=t) for i, t in enumerate(docs)],
        "doc_id long, toks array<string>")
    got = {r.doc_id: (r.n_tokens, r.n_dup_windows, r.n_spans,
                      r.dup_tokens)
           for r in duplicated_spans(df, "doc_id", "toks",
                                     k=k, max_df=1).collect()}
    # reference
    win_docs: dict[tuple, set] = {}
    for i, t in enumerate(docs):
        for s in range(max(len(t) - k + 1, 0)):
            win_docs.setdefault(tuple(t[s:s + k]), set()).add(i)
    for i, t in enumerate(docs):
        pos = [s for s in range(max(len(t) - k + 1, 0))
               if len(win_docs[tuple(t[s:s + k])]) > 1]
        spans = []
        for s in pos:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + k)
            else:
                spans.append([s, s + k])
        want = (len(t), len(pos), len(spans),
                sum(e - s for s, e in spans))
        assert got[i] == want, (i, docs, k, got[i], want)


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from("abcde"), min_size=0,
                         max_size=12).map(lambda x: list(map(str, x))),
                min_size=1, max_size=6),
       st.integers(2, 4))
def test_cut_duplicated_spans_matches_reference(spark, docs, k):
    """The removal operator must cut exactly the reference's merged
    duplicated spans from every document and keep the rest in order."""
    from stream2segment_spark.operators.dedup import cut_duplicated_spans
    df = spark.createDataFrame(
        [Row(doc_id=i, toks=t) for i, t in enumerate(docs)],
        "doc_id long, toks array<string>")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
           for r in cut_duplicated_spans(df, "doc_id", "toks",
                                         k=k, max_df=1).collect()}
    win_docs: dict[tuple, set] = {}
    for i, t in enumerate(docs):
        for s in range(max(len(t) - k + 1, 0)):
            win_docs.setdefault(tuple(t[s:s + k]), set()).add(i)
    for i, t in enumerate(docs):
        pos = [s for s in range(max(len(t) - k + 1, 0))
               if len(win_docs[tuple(t[s:s + k])]) > 1]
        spans = []
        for s in pos:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + k)
            else:
                spans.append([s, s + k])
        covered = set()
        for s, e in spans:
            covered.update(range(s, e))
        kept = [tok for j, tok in enumerate(t) if j not in covered]
        want = (len(t), len(covered), " ".join(kept))
        assert got[i] == want, (i, docs, k, got[i], want)


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from("abc"), min_size=0,
                         max_size=10).map(lambda x: list(map(str, x))),
                min_size=2, max_size=5),
       st.integers(1, 2))
def test_longest_duplicated_substring_matches_reference(spark, docs,
                                                        min_len):
    """Binary search + window hashing must equal brute force: all
    maximal-length token substrings occurring in >1 distinct docs."""
    from stream2segment_spark.operators.dedup import (
        longest_duplicated_substring)
    df = spark.createDataFrame(
        [Row(doc_id=i, toks=t) for i, t in enumerate(docs)],
        "doc_id long, toks array<string>")
    got = {(r.length, r.text, r.n_docs, r.n_occ)
           for r in longest_duplicated_substring(
               df, "doc_id", "toks", max_df=1, min_len=min_len).collect()}
    # brute force over every (doc, start, length)
    occ: dict[tuple, list] = {}
    for i, t in enumerate(docs):
        for L in range(min_len, len(t) + 1):
            for s in range(len(t) - L + 1):
                occ.setdefault(tuple(t[s:s + L]), []).append(i)
    dup = {sub: ids for sub, ids in occ.items() if len(set(ids)) > 1}
    want = set()
    if dup:
        best = max(len(sub) for sub in dup)
        want = {(best, " ".join(sub), len(set(ids)), len(ids))
                for sub, ids in dup.items() if len(sub) == best}
    assert got == want, (docs, min_len, got, want)
