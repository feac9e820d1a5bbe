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
