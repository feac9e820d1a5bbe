

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
