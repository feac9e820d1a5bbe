

def test_empty_inputs_fail_loudly_or_cleanly(spark):
    """Empty corpora / query sets: named contract errors, never a numpy
    stack trace; an empty QUERY set is a valid no-op (empty result)."""
    import pytest

    from stream2segment_spark.operators.similarity import (
        ann_topk_bruteforce, kmeans_centroids, pq_sample_codebook)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    full = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>")
    out = ann_topk_bruteforce(
        full, empty.selectExpr("vec_id AS query_id", "embedding"), k=2)
    assert out.count() == 0 and len(out.columns) == 3
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_centroids(empty, "embedding", k=2)
    with pytest.raises(ValueError, match="smaller than ksub"):
        pq_sample_codebook(empty, ksub=4)


def test_null_vectors_ignored_not_fatal(spark):
    """Mixed NULL/real embeddings: every operator behaves as if the NULL
    rows were pre-filtered (the dirty-data contract)."""
    from stream2segment_spark.operators.clustering import kmeans_quantized
    from stream2segment_spark.operators.similarity import (
        ann_topk_bruteforce, lsh_bucket_neardup, semantic_dedup)
    rows = [(i, [float(i % 4), 1.0, 0.5, 2.0]) for i in range(12)]
    rows += [(100, None), (101, None)]
    dirty = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    clean = dirty.where("embedding IS NOT NULL")
    q = clean.where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding")
    a = sorted(map(tuple, ann_topk_bruteforce(dirty, q, k=3).collect()))
    b = sorted(map(tuple, ann_topk_bruteforce(clean, q, k=3).collect()))
    assert a == b and len(a) == 6
    a = sorted(map(tuple, lsh_bucket_neardup(
        dirty, dim=4, num_planes=4, threshold=0.99).collect()))
    b = sorted(map(tuple, lsh_bucket_neardup(
        clean, dim=4, num_planes=4, threshold=0.99).collect()))
    assert a == b and len(a) > 0
    a = kmeans_quantized(dirty, "vec_id", "embedding", k=2)[1]
    b = kmeans_quantized(clean, "vec_id", "embedding", k=2)[1]
    assert a == b
    sd = semantic_dedup(dirty, k=2, threshold=0.99)
    assert sd.count() == 12  # the two NULL rows are excluded, not fatal


def test_bruteforce_zero_vector_never_ranks_first(spark):
    """An all-zero vector (failure-fill) must yield cosine 0, not a NaN
    that Spark's desc window ranks above every real neighbor."""
    from pyspark.sql import Row

    from stream2segment_spark.operators.similarity import (
        ann_topk_bruteforce)
    rows = [Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1]),
            Row(vec_id=2, embedding=[0.0, 0.0])]   # zero vector
    df = spark.createDataFrame(rows)
    q = df.filter("vec_id = 0").selectExpr("vec_id AS query_id",
                                           "embedding")
    out = ann_topk_bruteforce(df, q, id_col="vec_id",
                              vec_col="embedding",
                              query_id_col="query_id", k=2).collect()
    ranked = [r["vec_id"] for r in
              sorted(out, key=lambda r: -r["cosine"])]
    assert ranked[0] == 0 and 2 not in ranked[:2]
    assert all(not (r["cosine"] != r["cosine"]) for r in out)  # no NaN


def test_pq_topk_adc_empty_queries(spark):
    """Empty query set returns an empty typed frame, not an np.stack
    crash (same contract as ann_topk_bruteforce)."""
    import numpy as np
    from pyspark.sql import Row

    from stream2segment_spark.operators.similarity import pq_topk_adc
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0, 0.0, 2.0])
         for i in range(8)])
    cb = np.zeros((2, 4, 2))
    out = pq_topk_adc(df, df.limit(0).selectExpr(
        "vec_id AS query_id", "embedding"), cb, k=3)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "vec_id", "adc_dist"}
