"""No operator may leave a session-lifetime cache pin behind: every
``persist()`` inside an operator is either unpersisted before return
(collect-once paths) or surfaced through the ``persists`` out-param so
the caller can release it after materializing the result."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row


def _cached_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.fixture()
def docs(spark):
    rows = [Row(doc_id=i,
                text=f"alpha beta gamma delta {i} epsilon zeta eta theta "
                     f"iota kappa common tail of every document here")
            for i in range(30)]
    # two exact dup pairs + one near-dup pair
    rows += [Row(doc_id=100, text=rows[0].text),
             Row(doc_id=101, text=rows[1].text),
             Row(doc_id=102, text=rows[2].text + " extra")]
    return spark.createDataFrame(rows)


def test_curate_corpus_persists_released(spark, docs):
    from stream2segment_spark.examples.corpus_pipeline import curate_corpus
    before = _cached_ids(spark)
    persists: list = []
    curated, funnel = curate_corpus(
        docs, languages=("en", "und"), min_quality=0.0, token_band=(1, 10**6),
        persists=persists)
    curated.count()
    funnel.collect()
    assert persists, "curate_corpus should surface its persisted stages"
    for frame in persists:
        frame.unpersist()
    # the single allowed survivor: the final connected-components round's
    # localCheckpoint, which backs the still-live curated frame (freed by
    # the ContextCleaner when the caller drops the result)
    assert len(_cached_ids(spark) - before) <= 1


def test_connected_components_releases_intermediate_checkpoints(spark):
    """Every CC round localCheckpoints its labels; rounds other than the
    last must be unpersisted as soon as the next round materializes."""
    from stream2segment_spark.operators.graph import connected_components
    # a path graph 0-1-2-...-9 needs several min-propagation rounds
    edges = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(10)])
    before = _cached_ids(spark)
    labels = connected_components(edges)
    got = {(r.id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(11)}
    assert len(_cached_ids(spark) - before) <= 1


def test_ngram_jaccard_pairs_persists_released(spark, docs):
    from stream2segment_spark.operators import dedup as DD
    before = _cached_ids(spark)
    persists: list = []
    pairs = DD.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5,
                                   persists=persists)
    pairs.count()
    assert persists
    for frame in persists:
        frame.unpersist()
    assert _cached_ids(spark) <= before


def test_simhash_and_minhash_persists_released(spark, docs):
    from stream2segment_spark.operators import dedup as DD
    before = _cached_ids(spark)
    persists: list = []
    DD.simhash_neardup_pairs(docs, "text", "doc_id",
                             persists=persists).count()
    DD.minhash_neardup_pairs(docs, "text", "doc_id",
                             persists=persists).count()
    assert len(persists) == 2
    for frame in persists:
        frame.unpersist()
    assert _cached_ids(spark) <= before


def test_ivf_index_query_leaves_no_cache(spark, tmp_path):
    from stream2segment_spark.operators import similarity as SIM
    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in rng.standard_normal(8)])
         for i in range(120)])
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(emb, path, n_cells=4)
    queries = spark.createDataFrame(
        [Row(query_id=i, embedding=[float(x) for x in rng.standard_normal(8)])
         for i in range(3)])
    before = _cached_ids(spark)
    got = SIM.ann_topk_ivf_index(spark, path, queries, k=5, nprobe=2)
    assert got.count() > 0
    assert _cached_ids(spark) <= before
