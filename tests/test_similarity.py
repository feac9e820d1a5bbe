

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
