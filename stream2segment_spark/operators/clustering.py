"""Distributed k-means over embedding columns (beyond-reference,
LLM-pipeline capability): semantic clustering for domain discovery,
cluster-balanced sampling, and semantic-dedup bucketing of a corpus.

Lloyd iterations in the classic Spark shape: centroids are a broadcast
literal (k x dim is driver-bounded by contract), assignment is a pure JVM
expression over the embedding array (no shuffle, no Python), and the
centroid update is ONE map-side-combined shuffle per iteration on
(cluster, dimension) keys. The driver collects only k x dim longs per
iteration.

Every quantity lives on an integer grid so the algorithm is DETERMINISTIC
and bit-replayable across engines (the repo's strong-oracle discipline):

- vectors are quantized to ``round(x * scale)`` longs;
- squared distances are integer sums that stay exact in doubles
  (dim * (2*scale*|x|_max)^2 << 2^53), so argmin never depends on
  summation order;
- updated centroids are re-quantized to the same grid via
  ``round(sum/count)`` — one IEEE division and one half-away round, both
  correctly rounded in every engine;
- init picks the k seeds with the smallest (md5 bucket, id) — the same
  engine-universal hash used for sampling/splits;
- ties (equal distance) break toward the lowest centroid index, and an
  emptied cluster keeps its previous centroid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.functions.sampling import hash_bucket


def quantize_vec(vec_col, scale: int = 1000):
    """``array<float>`` -> ``array<bigint>`` on the round(x*scale) grid
    (half-away rounding, matching SQL ``round``)."""
    return F.transform(vec_col,
                       lambda x: F.round(x.cast("double") * scale, 0)
                                  .cast("long"))


def _assign(df: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Append cluster_id (argmin of exact distances, ties -> lowest
    index via array_position's first-match) and dist2. Pure expressions
    over ONE broadcast centroid literal — scan-stage, no shuffle. A
    single k x dim array-of-arrays literal keeps the expression tree
    small (k separate literal arrays + an unrolled argmin when-chain
    measured ~10x slower in plan compilation alone: 2.4 MiB task
    binaries re-codegen'd every iteration)."""
    cent = F.array(*[F.array(*[F.lit(int(v)) for v in c])
                     for c in centroids])
    dists = F.transform(
        F.sequence(F.lit(1), F.lit(len(centroids))),
        lambda j: F.aggregate(
            F.zip_with(F.col("__qvec"), F.element_at(cent, j),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x))
    return (df.withColumn("__d", dists)
              .withColumn("dist2", F.array_min("__d"))
              .withColumn("cluster_id",
                          (F.array_position("__d", F.col("dist2")) - 1)
                          .cast("int"))
              .drop("__d"))


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    seed: str = "km",
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` Lloyd iterations; return (assignments, centroids).

    Assignments carry ``(id_col, cluster_id, dist2)`` — dist2 is the
    exact integer squared distance on the quantized grid. Centroids are
    the final k x dim quantized grid points (python lists; a broadcast
    dimension by contract — k*dim values cross the driver per iteration,
    never the corpus).
    """
    if k <= 0 or iters <= 0:
        raise ValueError(f"k and iters must be positive, got {k}, {iters}")
    q = df.select(F.col(id_col), quantize_vec(F.col(vec_col), scale)
                  .alias("__qvec")).persist()
    # deterministic seeds: k smallest (md5 bucket, id) rows
    seeds = (q.withColumn("__b", hash_bucket(F.col(id_col), seed))
              .orderBy("__b", id_col).limit(k).collect())
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)} input rows")
    centroids = [list(r["__qvec"]) for r in seeds]
    for _ in range(iters):
        assigned = _assign(q, centroids)
        sums = (assigned
                .select("cluster_id", F.posexplode("__qvec")
                        .alias("pos", "val"))
                .groupBy("cluster_id", "pos")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .collect())
        new = [list(c) for c in centroids]   # emptied cluster keeps its spot
        dims: dict[int, dict[int, int]] = {}
        for r in sums:
            # SQL round is half-AWAY; python round is half-even. sum/count
            # lands on exact .5 readily (integer sums), so match SQL here.
            x = r.s / r.n
            dims.setdefault(r.cluster_id, {})[r.pos] = int(
                math.copysign(math.floor(abs(x) + 0.5), x))
        for cid, vals in dims.items():
            for pos, v in vals.items():
                new[cid][pos] = v
        centroids = new
    return _assign(q, centroids).select(id_col, "cluster_id", "dist2"), \
        centroids
