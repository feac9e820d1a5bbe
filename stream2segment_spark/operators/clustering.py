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

import numpy as np
import pandas as pd
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
    """Append cluster_id (argmin of exact int64 distances, ties -> lowest
    index via numpy argmin's first-match) and dist2. The centroid matrix
    ships in the UDF closure (broadcast with the task), the batch math is
    one vectorized integer einsum — scan-stage, no shuffle, and the plan
    stays tiny and constant-shape across iterations. (Two JVM-expression
    forms were measured first: k separate literal arrays + an unrolled
    argmin when-chain compiled 2.4 MiB task binaries per iteration; one
    k x dim array-of-arrays literal + transform/array_min cut that 4x
    but still paid ~1.8 s of Catalyst analysis per fresh centroid
    literal — per ITERATION, since new centroids mean a new plan. The
    closure UDF pays none of it, and int64 numpy is exact like the
    fold.)"""
    cents = np.asarray(centroids, dtype=np.int64)
    # expansion d2 = |x|^2 + |c|^2 - 2 x.c via int64 matmul: exact (every
    # term bounded far below 2^63 on the quantized grid) and O(B*k) memory
    # instead of the O(B*k*dim) broadcast cube — the form that stays
    # feasible at IVF-realistic k (256+)
    c_sq = (cents.astype(np.int64) ** 2).sum(axis=1)

    @F.pandas_udf("struct<cluster_id: int, dist2: bigint>")
    def _ud(vecs: pd.Series) -> pd.DataFrame:
        if not len(vecs):
            return pd.DataFrame({"cluster_id": pd.array([], dtype="int32"),
                                 "dist2": pd.array([], dtype="int64")})
        x = np.stack([np.asarray(v, dtype=np.int64) for v in vecs])
        d = (x ** 2).sum(axis=1)[:, None] + c_sq[None, :] \
            - 2 * (x @ cents.T)
        cid = d.argmin(axis=1)
        return pd.DataFrame(
            {"cluster_id": cid.astype("int32"),
             "dist2": d[np.arange(len(cid)), cid]})

    staged = df.withColumn("__as", _ud(F.col("__qvec")))
    return staged.select(
        *df.columns,
        F.col("__as.cluster_id").alias("cluster_id"),
        F.col("__as.dist2").alias("dist2"))


def _kmeans_parallel_init(
    q: DataFrame, id_col: str, centroids: list[list[int]], k: int,
    seed: str, rounds: int = 5, oversample: int | None = None,
) -> list[list[int]]:
    """Deterministic k-means|| candidate harvest + driver-side weighted
    reduction to k seeds. ``q`` carries (id, __qvec); ``centroids`` is
    the single hash-min starting seed. Per round: one assignment job for
    the current cost phi, one filtered collect of the sampled vectors —
    2*rounds + 2 jobs total, independent of k."""
    l = oversample or 2 * k
    cands = [list(c) for c in centroids]
    seen = {tuple(c) for c in cands}
    for r in range(rounds):
        assigned = _assign(q, cands)
        phi = assigned.agg(F.sum("dist2")).collect()[0][0] or 0
        if phi == 0:     # every point sits ON a candidate already
            break
        # deterministic coin flip: keep x iff coin/2^40 < l * d2(x)/phi,
        # with coin a 40-bit xxhash64 slice of (id, round) — exact
        # integer comparison via decimals (40 bits keeps coin*phi inside
        # decimal(38,0) even at phi ~ 1e20). NOT the md5 hash_bucket:
        # its 10^4 buckets put a 1e-4 probability FLOOR under every
        # point (bucket 0 always keeps), which at 10^8+ rows would
        # collect ~n/10^4 full vectors to the driver per round instead
        # of ~l; the 2^-40 resolution has no such floor in practice.
        coin = F.shiftrightunsigned(
            F.xxhash64(F.col(id_col), F.lit(f"{seed}:kmpar{r}")), 24)
        picked = (assigned
                  .withColumn("__coin", coin)
                  .filter(F.col("__coin").cast("decimal(38,0)") * phi
                          < F.lit(l) * F.col("dist2").cast("decimal(38,0)")
                          * (1 << 40))
                  .orderBy(id_col).select("__qvec").collect())
        for row in picked:
            t = tuple(row["__qvec"])
            if t not in seen:
                seen.add(t)
                cands.append(list(t))
    if len(cands) < k:
        # degenerate corpora (fewer spread points than k): top up with
        # the hash-order seeds the 'hash' init would have used
        extra = (q.withColumn("__b", hash_bucket(F.col(id_col), seed))
                 .orderBy("__b", id_col).limit(k + len(cands)).collect())
        for row in extra:
            t = tuple(row["__qvec"])
            if t not in seen:
                seen.add(t)
                cands.append(list(t))
            if len(cands) >= k:
                break
        if len(cands) < k:
            raise ValueError(
                f"k={k} exceeds the {len(cands)} distinct input points")
    # candidate weights: how many corpus points each candidate owns
    wrows = (_assign(q, cands).groupBy("cluster_id").count().collect())
    w = np.zeros(len(cands), dtype=np.int64)
    for r in wrows:
        w[r["cluster_id"]] = r["count"]
    cmat = np.asarray(cands, dtype=np.int64)
    # weighted greedy farthest-point: start at the heaviest candidate
    # (ties -> lowest index), then repeatedly take argmax weight*min-d2
    # (exact integers, ties -> lowest index) — a deterministic stand-in
    # for the weighted k-means++ reduction of the paper
    first = int(w.argmax())
    chosen = [first]
    mind2 = ((cmat - cmat[first]) ** 2).sum(axis=1)
    while len(chosen) < k:
        score = w * mind2
        nxt = int(score.argmax())
        if score[nxt] == 0:
            # all remaining candidates coincide with chosen ones or own
            # no points; fall back to unweighted spread
            score = mind2
            nxt = int(score.argmax())
            if score[nxt] == 0:
                raise ValueError(
                    f"k={k} exceeds the distinct candidate points")
        chosen.append(nxt)
        d2new = ((cmat - cmat[nxt]) ** 2).sum(axis=1)
        mind2 = np.minimum(mind2, d2new)
    return [list(map(int, cmat[i])) for i in chosen]


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    seed: str = "km",
    init: str = "hash",
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` Lloyd iterations; return (assignments, centroids).

    Assignments carry ``(id_col, cluster_id, dist2)`` — dist2 is the
    exact integer squared distance on the quantized grid. Centroids are
    the final k x dim quantized grid points (python lists; a broadcast
    dimension by contract — k*dim values cross the driver per iteration,
    never the corpus).

    ``init``: ``'hash'`` (default) seeds from the k smallest (md5
    bucket, id) rows — one job, and the choice the gate oracle replays;
    ``'farthest'`` is the deterministic farthest-point heuristic (the
    greedy 2-approximation of k-center): after the same hash-min first
    seed, each next seed is the point maximizing its exact distance to
    the chosen set (ties -> lowest id). k-1 extra max-aggregation jobs,
    but separated blobs are found before a single Lloyd step —
    kmeans++-quality starts without kmeans++'s randomness.
    ``'parallel'`` is deterministic k-means|| (Bahmani et al., VLDB
    2012) — the large-k init: O(rounds) jobs INDEPENDENT of k (vs
    farthest's k sequential jobs, documented unusable at IVF-realistic
    k). Each round samples every point with probability
    ``min(1, l * d2(x, C) / phi)`` where phi is the current total cost
    and l = 2k oversampling, with the md5 hash-bucket standing in for
    the coin flip (bit-replayable, like every sampling decision in this
    repo); the ~l*rounds weighted candidates are reduced to k on the
    driver by weighted greedy farthest-point (weight x distance
    objective, ties to candidate order).
    """
    if k <= 0 or iters <= 0:
        raise ValueError(f"k and iters must be positive, got {k}, {iters}")
    if init not in ("hash", "farthest", "parallel"):
        raise ValueError(f"unknown init {init!r}")
    # NULL vectors carry no geometry: drop them up front (the same
    # dirty-data contract as similarity._drop_null_vecs)
    q = (df.where(F.col(vec_col).isNotNull())
         .select(F.col(id_col), quantize_vec(F.col(vec_col), scale)
                 .alias("__qvec")).persist())
    # deterministic seeds: k smallest (md5 bucket, id) rows
    n_first = 1 if init in ("farthest", "parallel") else k
    seeds = (q.withColumn("__b", hash_bucket(F.col(id_col), seed))
              .orderBy("__b", id_col).limit(n_first).collect())
    if init == "hash" and len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)} input rows")
    if not seeds:
        raise ValueError("kmeans needs a non-empty input")
    centroids = [list(r["__qvec"]) for r in seeds]
    if init == "parallel" and k > 1:
        centroids = _kmeans_parallel_init(q, id_col, centroids, k, seed)
    while init == "farthest" and len(centroids) < k:
        far = (_assign(q, centroids)
               .orderBy(F.col("dist2").desc(), F.col(id_col))
               .select("__qvec").limit(1).collect())
        nxt = list(far[0]["__qvec"])
        if nxt in centroids:
            raise ValueError(
                f"k={k} exceeds the {len(centroids)} distinct input points")
        centroids.append(nxt)
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
    out = _assign(q, centroids).select(id_col, "cluster_id", "dist2")
    # the cache served the seed scan + per-iteration updates; release it
    # rather than pin the quantized corpus for the session lifetime — the
    # caller's action on `out` re-quantizes once (a map-only scan)
    q.unpersist()
    return out, centroids
