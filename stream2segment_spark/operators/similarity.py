"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:

- ``ann_topk_bruteforce``: exact top-k neighbors. Queries are a small
  broadcast side; the corpus streams through ``mapInPandas`` computing a
  numpy matmul per Arrow batch and emitting only each batch's local top-k,
  so the shuffle is k*|Q| rows per partition, never the corpus. A final
  window takes the global top-k.
- ``lsh_bucket_neardup`` / ``add_hyperplane_buckets``: random-hyperplane
  LSH — sign-bit bucket per vector (pure expressions over a broadcast
  plane matrix), then equi-join within buckets. Sub-quadratic candidate
  generation for corpus-vs-corpus near-dup.

Cosine math on doubles; vectors are L2-normalized once up front.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b):
    """Dot product of two array columns — built-in zip_with + aggregate
    (JVM-side; fine for single pairs, use the matmul path for top-k)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _drop_null_vecs(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL vectors carry no geometry: every public operator here drops
    them up front (the dirty-data contract — the alternatives are a
    numpy crash in an Arrow batch or a silent all-nulls LSH bucket)."""
    return df.where(F.col(vec_col).isNotNull())


def ann_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Returns (query_id, vec_id, cosine) — k rows per query.

    Plan: driver collects ONLY the queries (small by contract), ships them
    in the UDF closure; each corpus partition computes a vectorized
    (batch x dim) @ (dim x |Q|) matmul and keeps its local top-k, then one
    narrow shuffle + window yields the global top-k. No corpus collect, no
    cross join materialization.
    """
    corpus = _drop_null_vecs(corpus, vec_col)
    qpdf = _drop_null_vecs(queries, vec_col) \
        .select(query_id_col, vec_col).toPandas()
    out_schema = f"{query_id_col} long, {id_col} long, cosine double"
    if not len(qpdf):   # empty query set: empty result, not np.stack
        return corpus.sparkSession.createDataFrame([], out_schema)
    q_ids = qpdf[query_id_col].to_numpy()
    qm = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    # zero-norm guard: an all-zero vector must yield cosine 0, not a
    # NaN that Spark's desc window would rank ABOVE every real neighbor
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-12)
            sims = m @ qm.T  # (batch, |Q|)
            kk = min(k, len(ids))
            rows = {query_id_col: [], id_col: [], "cosine": []}
            for qi in range(sims.shape[1]):
                # lexsort (desc cosine, asc id): duplicate vectors tie
                # exactly, and an argpartition cut at the boundary would
                # keep an arbitrary tied subset per partitioning
                sel = np.lexsort((ids, -sims[:, qi]))[:kk]
                rows[query_id_col].extend([q_ids[qi]] * len(sel))
                rows[id_col].extend(ids[sel])
                rows["cosine"].extend(sims[sel, qi])
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (partial.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def add_hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int,
    num_planes: int = 16, seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign bits of dot products with
    ``num_planes`` fixed random planes) as a long column ``bucket``.

    The plane matrix is generated deterministically on the driver and
    inlined as literal arrays — pure expressions, broadcast with the plan.
    """
    df = _drop_null_vecs(df, vec_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    bucket = None
    for j in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(dot_expr(F.col(vec_col), plane) > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return df.withColumn("bucket", bucket)


def hamming1_probe_buckets(bucket, num_planes: int):
    """A bucket code plus every code at Hamming distance 1 (the classic
    multi-probe set: a near-dup pair split by ONE hyperplane lands in
    adjacent codes). array<long> of 1 + num_planes probes."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << j))
                             for j in range(num_planes)])


def lsh_bucket_neardup(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, num_planes: int = 12, threshold: float = 0.9,
    seed: int = 7, multiprobe: bool = False,
) -> DataFrame:
    """Corpus near-dup pairs with cosine >= threshold, candidates limited
    to same-LSH-bucket pairs (one shuffle on bucket, no cross join).
    Recall < 1 by construction (LSH); raise it with fewer planes or with
    ``multiprobe`` — one side of the join explodes to its Hamming-1
    probe set, so pairs whose codes differ by a single plane are also
    candidates (1 + num_planes bucket rows per doc on that side; the
    pair match is still unique because exactly one probe of A equals
    B's true code when distance <= 1, and probing is symmetric at
    distance 1 so one exploded side suffices). Returns
    (id_a, id_b, cosine)."""
    # The bucket self-join ships ONLY (bucket, id): carrying the vectors
    # through it would shuffle 2*dim doubles per candidate row (and,
    # under multiprobe, replicate each vector 1+num_planes times in the
    # explode). Vectors are re-attached by id afterwards, so each side's
    # vector is shuffled once per matched pair, keyed by id.
    b = add_hyperplane_buckets(df.select(id_col, vec_col), vec_col, dim,
                               num_planes, seed).drop(vec_col)
    if multiprobe:
        probe = b.withColumn(
            "bucket",
            F.explode(hamming1_probe_buckets(F.col("bucket"), num_planes)))
    else:
        probe = b
    l, r = probe.alias("l"), b.alias("r")
    ids = (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                  & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
           .select(F.col(f"l.{id_col}").alias("id_a"),
                   F.col(f"r.{id_col}").alias("id_b")))
    vecs = df.select(id_col, vec_col)
    pairs = (ids
             .join(vecs.select(F.col(id_col).alias("id_a"),
                               F.col(vec_col).alias("va")), "id_a")
             .join(vecs.select(F.col(id_col).alias("id_b"),
                               F.col(vec_col).alias("vb")), "id_b"))
    # vectorized pairwise cosine: the zip_with/aggregate fold is an
    # interpreted higher-order function and dominated the candidate
    # verify (~2.7s for ~10^5 pairs at sf0.1); one Arrow batch matmul
    # row-wise is ~4x faster at identical rounded values
    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    # asNondeterministic (guide §4.4, r10): the threshold filter on the
    # UDF column is otherwise pushed below the projection WITH a second
    # copy of the UDF — the r9 plan shows two ArrowEvalPython nodes with
    # identical arguments, i.e. every candidate pair paid the cosine
    # twice. The function is pure; the marker only stops the optimizer
    # from duplicating it. Values unchanged.
    cos_nd = _cos.asNondeterministic()
    return (pairs.withColumn("cosine", cos_nd(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the scale path: partition the corpus into
# centroid cells once, probe only nprobe cells per query
# --------------------------------------------------------------------------

def kmeans_centroids(
    df: DataFrame, vec_col: str, k: int,
    max_iter: int = 10, sample_size: int = 20000, seed: int = 7,
) -> np.ndarray:
    """Spherical k-means (cosine) centroids trained driver-side on a
    bounded sample — the standard IVF training shape: the coarse quantizer
    is tiny (k x dim floats) and training needs one pass over a sample,
    not the corpus. At 100 TB pass a pre-sampled frame (``df.sample``).
    For FULL-corpus distributed training (exact, deterministic), see
    ``operators.clustering.kmeans_quantized`` — its centroids slot in
    here after an L2 normalize."""
    rows = (_drop_null_vecs(df, vec_col)
            .select(vec_col).limit(sample_size).collect())
    if not rows:
        raise ValueError("kmeans_centroids needs a non-empty corpus")
    x = np.array([r[0] for r in rows], dtype=float)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(max_iter):
        sim = x @ cents.T
        assign = np.argmax(sim, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def kmeans_centroids_full(
    df: DataFrame, vec_col: str, k: int, id_col: str = "vec_id",
    iters: int = 3, scale: int = 1000, seed: str = "km",
    init: str = "hash",
) -> np.ndarray:
    """Full-corpus IVF training: the distributed, deterministic
    ``clustering.kmeans_quantized`` run over EVERY vector (one
    map-side-combined shuffle per iteration — no driver-side sample),
    centroids L2-normalized for the spherical assign/probe UDFs below.
    Use when the corpus is too skewed for sample-based training or the
    quantizer must be exactly reproducible across runs.

    ``init='farthest'`` gives better-spread seeds for SMALL k, but costs
    k-1 sequential full-corpus scans and requires >= k distinct
    quantized points — unusable at IVF-realistic k (hundreds of cells).
    For large k use ``init='parallel'`` (deterministic k-means||):
    O(rounds) full-corpus jobs independent of k, kmeans++-quality
    spread (clustering._kmeans_parallel_init)."""
    from stream2segment_spark.operators.clustering import kmeans_quantized

    _, cents = kmeans_quantized(_drop_null_vecs(df, vec_col), id_col,
                                vec_col, k=k, iters=iters,
                                scale=scale, seed=seed, init=init)
    c = np.asarray(cents, dtype=float) / scale
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def ivf_assign_udf(centroids: np.ndarray):
    """vector -> nearest-centroid cell id (vectorized matmul per Arrow
    batch; the centroid matrix ships inside the UDF closure)."""
    cents = np.asarray(centroids, dtype=float)

    @F.pandas_udf("int")
    def _udf(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=float) for v in vecs])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(x @ cents.T, axis=1).astype("int32"))
    # asNondeterministic (guide §4.4, r10): the cell column becomes a
    # join key, and the optimizer's inferred isnotnull(cell) filter was
    # pushed below the projection WITH a second copy of the UDF (two
    # identical ArrowEvalPython nodes in the r9 sim_topk_ivf plan). The
    # function is pure; the marker only stops the duplication.
    return _udf.asNondeterministic()


def ivf_probe_cells_udf(centroids: np.ndarray, nprobe: int):
    """query vector -> the nprobe nearest cell ids (array<int>)."""
    cents = np.asarray(centroids, dtype=float)
    np_ = min(nprobe, len(cents))

    @F.pandas_udf("array<int>")
    def _udf(vecs: pd.Series) -> pd.Series:
        x = np.array([np.asarray(v, dtype=float) for v in vecs])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(x @ cents.T), axis=1)[:, :np_]
        return pd.Series(list(order.astype("int32")))
    return _udf


def ann_topk_ivf(
    corpus: DataFrame, queries: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", k: int = 10, nprobe: int = 4,
) -> DataFrame:
    """IVF top-k: corpus rows carry their cell id (write-once enrichment at
    scale: partition the stored table by cell); each query explodes to its
    nprobe probe cells; the candidate join is a plain equi-join on cell —
    the scan touches ~nprobe/k_cells of the corpus instead of all of it.
    Exact cosine + per-query top-k on the candidates.

    nprobe = n_cells degenerates to exact brute force (recall 1)."""
    from pyspark.sql import Window
    corpus = _drop_null_vecs(corpus, vec_col)
    queries = _drop_null_vecs(queries, vec_col)
    cell_corpus = corpus.withColumn("__cell",
                                    ivf_assign_udf(centroids)(F.col(vec_col)))
    probes = queries.withColumn(
        "__cell",
        F.explode(ivf_probe_cells_udf(centroids, nprobe)(F.col(vec_col))))
    q = probes.select(query_id_col, "__cell",
                      F.col(vec_col).alias("__qv"))
    cand = cell_corpus.join(q, "__cell")
    cos = cosine_expr(
        F.transform(vec_col, lambda v: v.cast("double")),
        F.transform("__qv", lambda v: v.cast("double")))
    scored = cand.withColumn("cosine", cos)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "cosine"))


def build_ivf_index(
    corpus: DataFrame, path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16, sample_size: int = 20000,
) -> np.ndarray:
    """Persist an IVF index: train spherical-kmeans centroids on a
    bounded sample, assign every corpus vector to its cell, and write the
    corpus PARTITIONED BY CELL plus the tiny centroid table. The index
    is plain parquet — any Spark/DuckDB reader can open it, and probing
    n cells of a cell-partitioned table is static partition PRUNING (the
    scan never touches unprobed cells; see ``ann_topk_ivf_index``).
    Returns the centroid matrix."""
    corpus = _drop_null_vecs(corpus, vec_col)
    cents = kmeans_centroids(corpus, vec_col, n_cells,
                             sample_size=sample_size)
    assigned = corpus.withColumn("cell",
                                 ivf_assign_udf(cents)(F.col(vec_col)))
    assigned.write.mode("overwrite").partitionBy("cell") \
        .parquet(f"{path}/cells")
    spark = corpus.sparkSession
    cent_rows = [(int(i), [float(v) for v in c])
                 for i, c in enumerate(cents)]
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return cents


def append_to_ivf_index(
    spark, path: str, new_vectors: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dedup_ids: bool = True,
) -> int:
    """Incrementally grow a persisted IVF index (``build_ivf_index``
    layout) WITHOUT retraining: assign each new vector to its nearest
    existing centroid (map-only UDF, the centroids come from the tiny
    centroid table) and APPEND into the cell-partitioned parquet — only
    the touched cell partitions gain files; queries pick the rows up
    with zero other changes. This is the ANN twin of the incremental
    corpus ingestion (streaming/corpus.py): the expensive global step
    (training) happens once, growth is map-only + partitioned append.

    ``dedup_ids``: anti-join ids already in the index first, making
    re-drops idempotent (content re-sent twice is stored once). Returns
    the number of vectors appended.

    Honest scale caveat (documented, not hidden): appended vectors do
    not move centroids, so a drifting distribution slowly degrades cell
    balance — monitor per-cell counts and re-run ``build_ivf_index``
    when the max/median cell ratio grows; the rebuild reads the same
    parquet back."""
    cents = load_ivf_centroids(spark, path)
    stored = spark.read.parquet(f"{path}/cells")
    # match the STORED schema exactly: build_ivf_index persists every
    # corpus column, and appending narrower files would make the extra
    # columns nondeterministically vanish or null out depending on
    # which footer a later read samples
    keep_cols = [c for c in stored.columns if c != "cell"]
    missing = set(keep_cols) - set(new_vectors.columns)
    if missing:
        raise ValueError(
            f"new_vectors lacks stored index column(s) {sorted(missing)}; "
            f"the cells table carries {keep_cols}")
    add = new_vectors.select(*keep_cols)
    if dedup_ids:
        add = add.join(stored.select(id_col), id_col, "left_anti")
    assigned = add.withColumn("cell",
                              ivf_assign_udf(cents)(F.col(vec_col)))
    # localCheckpoint: the append writes into the same directory the
    # dedup anti-join just scanned — cut the lineage so the write cannot
    # invalidate its own input (same guard as streaming/corpus.py)
    assigned = assigned.localCheckpoint(eager=True)
    n = assigned.count()
    if n:
        assigned.write.mode("append").partitionBy("cell") \
            .parquet(f"{path}/cells")
    return n


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    rows = (spark.read.parquet(f"{path}/centroids")
            .orderBy("cell").collect())
    return np.array([r["centroid"] for r in rows], dtype=float)


def ann_topk_ivf_index(
    spark, path: str, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", k: int = 10, nprobe: int = 4,
) -> DataFrame:
    """Query a persisted IVF index (``build_ivf_index`` layout): the
    queries' probe cells are collected driver-side (bounded: at most
    n_cells ints — queries are a bounded frame by the same contract as
    ann_topk_bruteforce) and pushed into the scan as a PARTITION filter,
    so only ~nprobe/n_cells of the stored corpus is read at all; then the
    usual exact-cosine + per-query top-k on the candidates."""
    from pyspark.sql import Window
    cents = load_ivf_centroids(spark, path)
    probes = queries.withColumn(
        "cell",
        F.explode(ivf_probe_cells_udf(cents, nprobe)(F.col(vec_col))))
    # Queries are bounded by contract: collect the probe rows ONCE and
    # rebuild them as a local (broadcastable) relation — both the
    # partition filter and the probe join read the same collected rows,
    # so nothing needs a session-lifetime persist().
    sel = probes.select(query_id_col, "cell", F.col(vec_col).alias("__qv"))
    probe_rows = sel.collect()
    probed_cells = sorted({r["cell"] for r in probe_rows})
    corpus = (spark.read.parquet(f"{path}/cells")
              .filter(F.col("cell").isin(probed_cells)))
    q = spark.createDataFrame(probe_rows, sel.schema)
    cos = cosine_expr(
        F.transform(vec_col, lambda v: v.cast("double")),
        F.transform("__qv", lambda v: v.cast("double")))
    scored = corpus.join(q, "cell").withColumn("cosine", cos)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "cosine"))


def _lsh_table_groups(
    df: DataFrame, id_col: str, vec_col: str,
    num_planes: int, tables: int, seed: int,
) -> DataFrame:
    """Replicate each vector into ``tables`` hyperplane-LSH groups
    (``grp = table:sign-bit-bucket``): an above-threshold pair lands in
    the same group of SOME table with prob 1-(1-p^planes)^tables. Bucket
    bits are computed per Arrow batch in numpy (one matmul per table),
    planes drawn deterministically from (seed, table)."""
    vec_t = df.schema[vec_col].dataType.simpleString()
    out_schema = (f"grp string, {id_col} "
                  f"{df.schema[id_col].dataType.simpleString()}, "
                  f"{vec_col} {vec_t}")

    def buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes_by_t = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, np.float64)
                          for v in pdf[vec_col]])
            if planes_by_t is None:
                planes_by_t = [
                    np.random.default_rng((seed, t))
                    .standard_normal((m.shape[1], num_planes))
                    for t in range(tables)]
            frames = []
            weights = 1 << np.arange(num_planes, dtype=np.int64)
            for t, planes in enumerate(planes_by_t):
                bits = (m @ planes) > 0
                grp = bits @ weights
                frames.append(pd.DataFrame({
                    "grp": [f"{t}:{g}" for g in grp],
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col]}))
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(buckets, out_schema)


def cosine_pairs_blocked(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.9, block_size: int = 1024,
    n_rows: int | None = None,
    lsh_planes: int | None = None, lsh_tables: int = 4, lsh_seed: int = 7,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked matrix multiply.

    The expression form (cosine_expr on a pair join) evaluates an
    interpreted 64-element fold per pair — O(n^2) slow-path ops. Here the
    corpus is packed into ~block_size-row blocks (one row per block:
    ids + matrix); block pairs (upper triangle) join into single rows and
    each task runs ONE numpy/BLAS (b x d) @ (d x b) matmul, emitting only
    the above-threshold pairs. Same O(n^2) math, ~2 orders of magnitude
    faster per pair, and block pairs spread evenly across executors.

    Returns (id_a, id_b, cosine) with id_a < id_b. Block membership is
    hash-assigned, so id order is uncorrelated with block index: for
    off-diagonal block pairs every above-threshold hit is emitted as
    (min(id), max(id)); the ``id_a < id_b`` filter applies only WITHIN the
    diagonal block (it is an id comparison there, deduping the symmetric
    hit and the self-pair). Each unordered pair lives in exactly one block
    pair, so no cross-task dedup is needed.

    ``n_rows`` (row count) sizes the block grid; pass it when known to
    avoid the extra ``df.count()`` job.

    ``lsh_planes`` turns on hyperplane-LSH pruning of the block-pair
    grid (the scale path this docstring used to only *recommend*): each
    vector is replicated into ``lsh_tables`` sign-bit bucket groups and
    the BLAS pass runs only within same-group sub-blocks, so the pair
    grid shrinks from all O((n/b)^2) block pairs to the near-duplicate
    neighborhoods. Every emitted pair is still exactly verified (same
    matmul + threshold); the trade is RECALL < 1 — a qualifying pair is
    found with prob ``1-(1-p^planes)^tables`` where
    ``p = 1 - arccos(cos)/pi`` — tune planes down / tables up for
    near-exact recall at high thresholds. Cross-table duplicate hits are
    dropped by a final distinct on (id_a, id_b).
    """
    df = _drop_null_vecs(df, vec_col)
    if lsh_planes:
        grouped = _lsh_table_groups(df, id_col, vec_col,
                                    lsh_planes, lsh_tables, lsh_seed)
        # sub-block big buckets so one hot bucket can't blow a task:
        # same blocked-BLAS shape as below, keyed by (grp, sub-block)
        w = Window.partitionBy("grp")
        grouped = (grouped
                   .withColumn("__cnt", F.count("*").over(w))
                   .withColumn("__sub",
                               (F.crc32(F.col(id_col).cast("string"))
                                % F.greatest(
                                    F.ceil(F.col("__cnt") / block_size),
                                    F.lit(1))).cast("int")))
        packed = (grouped.groupBy("grp", "__sub")
                  .agg(F.collect_list(id_col).alias("ids"),
                       F.collect_list(vec_col).alias("vecs")))
        a = packed.select("grp", F.col("__sub").alias("blk_a"),
                          F.col("ids").alias("ids_a"),
                          F.col("vecs").alias("vecs_a"))
        b = packed.select("grp", F.col("__sub").alias("blk_b"),
                          F.col("ids").alias("ids_b"),
                          F.col("vecs").alias("vecs_b"))
        pairs = a.join(b, ["grp"]).filter(F.col("blk_a") <= F.col("blk_b"))
    else:
        blocked = (df.select(
            (F.crc32(F.col(id_col).cast("string")) % 1_000_003).alias("__h"),
            id_col, vec_col))
        # contiguous-ish blocks by hash bucket: deterministic, key-skew-free
        n = n_rows if n_rows is not None else df.count()
        n_blocks = max(1, -(-n // block_size))
        packed = (blocked
                  .withColumn("__blk", (F.col("__h") % n_blocks).cast("int"))
                  .groupBy("__blk")
                  .agg(F.collect_list(id_col).alias("ids"),
                       F.collect_list(vec_col).alias("vecs")))
        a = packed.select(F.col("__blk").alias("blk_a"),
                          F.col("ids").alias("ids_a"),
                          F.col("vecs").alias("vecs_a"))
        b = packed.select(F.col("__blk").alias("blk_b"),
                          F.col("ids").alias("ids_b"),
                          F.col("vecs").alias("vecs_b"))
        pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    out_schema = "id_a long, id_b long, cosine double"

    def matmul(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                diag = row["blk_a"] == row["blk_b"]
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                ma = np.array([np.asarray(v, float) for v in row["vecs_a"]])
                mb = np.array([np.asarray(v, float) for v in row["vecs_b"]])
                ma /= np.maximum(np.linalg.norm(ma, axis=1, keepdims=True), 1e-12)
                mb /= np.maximum(np.linalg.norm(mb, axis=1, keepdims=True), 1e-12)
                sims = ma @ mb.T
                ii, jj = np.nonzero(sims >= threshold)
                id_a, id_b = ia[ii], ib[jj]
                if diag:
                    keep = id_a < id_b
                    id_a, id_b, cos = id_a[keep], id_b[keep], sims[ii, jj][keep]
                else:
                    # ids are hash-scattered across blocks: orient, don't drop
                    cos = sims[ii, jj]
                    id_a, id_b = (np.minimum(id_a, id_b),
                                  np.maximum(id_a, id_b))
                yield pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})

    out = pairs.mapInPandas(matmul, out_schema)
    if lsh_planes:
        # a pair can collide in several tables: one row per unordered pair
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


# --------------------------------------------------------------------------
# Product quantization (ADC scan) — the memory-compressed ANN scale path
# --------------------------------------------------------------------------

def build_ivfpq_index(
    corpus: DataFrame, path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16, m: int = 8, ksub: int = 16,
    sample_size: int = 20000,
) -> tuple[np.ndarray, np.ndarray]:
    """Persist an IVF+PQ index (the FAISS IVFADC shape): coarse
    centroids route queries to cells, PQ codes stand in for vectors —
    the stored table is (id, codes[m], cell) PARTITIONED BY CELL, so a
    query with nprobe probes reads ~nprobe/n_cells of the corpus AND
    each row read is m bytes of codes instead of dim*4 of floats (the
    two scale levers composed: partition pruning x 32x row shrink).
    Returns (centroids, codebook); both are also persisted as tiny
    parquet tables so any session can reopen the index."""
    cents = kmeans_centroids(corpus, vec_col, n_cells,
                             sample_size=sample_size)
    codebook = pq_sample_codebook(corpus, id_col, vec_col, m, ksub)
    mm, kk, dsub = codebook.shape

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            cell = (vn @ cents.T).argmax(axis=1)
            vs = v.reshape(len(ids), mm, dsub)
            d2 = ((vs[:, :, None, :] - codebook[None]) ** 2).sum(-1)
            codes = d2.argmin(axis=2)
            yield pd.DataFrame({id_col: ids,
                                "codes": list(codes.astype("int32")),
                                "cell": cell.astype("int32")})

    (corpus.select(id_col, vec_col)
     .mapInPandas(enc, f"{id_col} long, codes array<int>, cell int")
     .write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/codes"))
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(int(i), int(j), [float(v) for v in codebook[i, j]])
         for i in range(mm) for j in range(kk)],
        "m int, code int, center array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    return cents, codebook


def load_pq_codebook(spark, path: str) -> np.ndarray:
    rows = (spark.read.parquet(f"{path}/codebook")
            .orderBy("m", "code").collect())
    if not rows:
        raise ValueError(f"empty PQ codebook table at {path}/codebook")
    mm = max(r["m"] for r in rows) + 1
    kk = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["center"])
    cb = np.zeros((mm, kk, dsub))
    for r in rows:
        cb[r["m"], r["code"]] = r["center"]
    return cb


def ann_topk_ivfpq_index(
    spark, path: str, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", k: int = 10, nprobe: int = 4,
) -> DataFrame:
    """Query a persisted IVF+PQ index: probe cells become a PARTITION
    filter on the codes table (static pruning — unprobed cells are
    never read), each query precomputes its (m, ksub) ADC lookup table,
    and the scan sums m table lookups per CODE row — no stored vectors
    anywhere on the read path. Same bounded-queries contract and local
    top-k + narrow k*|Q| shuffle shape as the other top-k operators."""
    cents = load_ivf_centroids(spark, path)
    codebook = load_pq_codebook(spark, path)
    mm, kk, dsub = codebook.shape
    out_ddl = f"{query_id_col} long, {id_col} long, adc_dist double"
    qpdf = _drop_null_vecs(queries, vec_col) \
        .select(query_id_col, vec_col).toPandas()
    if not len(qpdf):       # empty query set: empty result, not np.stack
        return spark.createDataFrame([], out_ddl)
    q_ids = qpdf[query_id_col].to_numpy()
    qm = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    scores = qn @ cents.T
    nn = min(nprobe, scores.shape[1])
    probe_cells = np.argsort(-scores, axis=1)[:, :nn]      # (Q, nprobe)
    probed = sorted({int(c) for row in probe_cells for c in row})
    qs = qm.reshape(len(q_ids), mm, dsub)
    lut = ((qs[:, :, None, :] - codebook[None]) ** 2).sum(-1)
    lut_t = lut.transpose(1, 2, 0)                         # (m, ksub, Q)
    q_cells = [set(map(int, row)) for row in probe_cells]
    out_schema = f"{query_id_col} long, {id_col} long, adc_dist double"

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            gathered = lut_t[np.arange(mm)[:, None], codes.T]
            dist = gathered.sum(axis=0)                    # (batch, Q)
            rows = {query_id_col: [], id_col: [], "adc_dist": []}
            for qi in range(dist.shape[1]):
                mask = np.isin(cells, list(q_cells[qi]))
                if not mask.any():
                    continue
                mi = np.nonzero(mask)[0]
                sel = mi[np.lexsort((ids[mi], dist[mi, qi]))[:k]]
                rows[query_id_col].extend([q_ids[qi]] * len(sel))
                rows[id_col].extend(ids[sel])
                rows["adc_dist"].extend(dist[sel, qi])
            yield pd.DataFrame(rows)

    codes_df = (spark.read.parquet(f"{path}/codes")
                .filter(F.col("cell").isin(probed)))
    partial = codes_df.mapInPandas(scan, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col))
    return (partial.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def pq_sample_codebook(corpus: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", m: int = 8,
                       ksub: int = 16) -> np.ndarray:
    """Sample-based product-quantization codebook: the per-subspace
    centroids are the sub-vectors of the ``ksub`` lowest-id corpus
    vectors (Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — codebooks there are Lloyd-refined; the
    sample-only variant trades quantization error for a deterministic,
    engine-replayable codebook, and the encode/ADC machinery is
    identical). Returns (m, ksub, dsub) float64."""
    pdf = (_drop_null_vecs(corpus, vec_col).orderBy(id_col).limit(ksub)
           .select(vec_col).toPandas())
    if len(pdf) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub} "
                         f"(got {len(pdf)} vectors)")
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return mat.reshape(ksub, m, d // m).transpose(1, 0, 2).copy()


def pq_encode(corpus: DataFrame, codebook: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Map-only PQ encode: each vector becomes ``m`` uint8 codes
    (argmin squared-L2 sub-distance; ties take the lowest code). This is
    the persisted-index shape at 100 TB: d*4 bytes/vector compress to
    m bytes, so a 64-dim float corpus shrinks 32x and the ADC scan
    reads codes, not vectors."""
    corpus = _drop_null_vecs(corpus, vec_col)
    mm, ksub, dsub = codebook.shape

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            v = np.stack(pdf[vec_col].to_numpy()).astype(
                np.float64).reshape(len(ids), mm, dsub)
            d2 = ((v[:, :, None, :] - codebook[None]) ** 2).sum(-1)
            codes = d2.argmin(axis=2)
            yield pd.DataFrame({id_col: ids,
                                "codes": list(codes.astype("int32"))})

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} long, codes array<int>")


def pq_topk_adc(corpus: DataFrame, queries: DataFrame,
                codebook: np.ndarray, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k: corpus vectors are encoded to PQ
    codes, each query precomputes an (m, ksub) lookup table of squared
    sub-distances, and the scan sums m table lookups per corpus row —
    no full-dimension arithmetic in the hot loop. Returns
    (query_id, vec_id, adc_dist), k rows per query, ties on distance
    broken by vec_id.

    Plan shape mirrors ann_topk_bruteforce: queries (small by contract)
    ship in the closure, every partition keeps a local top-k, one
    narrow k*|Q| shuffle finishes globally. Encode happens inline here;
    at scale persist ``pq_encode`` output once and scan codes instead
    (32x less IO), exactly like the persisted IVF index above."""
    mm, ksub, dsub = codebook.shape
    qpdf = _drop_null_vecs(queries, vec_col) \
        .select(query_id_col, vec_col).toPandas()
    out_schema = f"{query_id_col} long, {id_col} long, adc_dist double"
    if not len(qpdf):   # empty query set: empty result, not np.stack
        return corpus.sparkSession.createDataFrame([], out_schema)
    q_ids = qpdf[query_id_col].to_numpy()
    qm = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    qs = qm.reshape(len(q_ids), mm, dsub)
    lut = ((qs[:, :, None, :] - codebook[None]) ** 2).sum(-1)  # (Q,m,ksub)
    lut_t = lut.transpose(1, 2, 0)                             # (m,ksub,Q)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            v = np.stack(pdf[vec_col].to_numpy()).astype(
                np.float64).reshape(len(ids), mm, dsub)
            d2 = ((v[:, :, None, :] - codebook[None]) ** 2).sum(-1)
            codes = d2.argmin(axis=2)                  # (batch, m)
            gathered = lut_t[np.arange(mm)[:, None], codes.T]  # (m,batch,Q)
            dist = gathered.sum(axis=0)                # (batch, Q)
            kk = min(k, len(ids))
            rows = {query_id_col: [], id_col: [], "adc_dist": []}
            for qi in range(dist.shape[1]):
                # lexsort, not argpartition: ADC distances tie whenever
                # two vectors share a code tuple (structural at scale),
                # and an arbitrary local cut could drop a tied low-id row
                # the global window can never recover
                sel = np.lexsort((ids, dist[:, qi]))[:kk]
                rows[query_id_col].extend([q_ids[qi]] * len(sel))
                rows[id_col].extend(ids[sel])
                rows["adc_dist"].extend(dist[sel, qi])
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(scan, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col))
    return (partial.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def semantic_dedup(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    *, k: int = 8, iters: int = 2, scale: int = 1000, seed: str = "km",
    threshold: float = 0.95, init: str = "hash",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, public): k-means-cluster the embeddings, then
    within each cluster mark every document whose max cosine similarity
    to a LOWER-id cluster member reaches ``threshold`` as a semantic
    duplicate (keep-first). Returns one row per input id:
    ``(id_col, cluster_id, max_sim_prev, is_dup)`` — ``max_sim_prev``
    is NULL for the first (lowest-id) usable vector of each cluster and
    for zero vectors, which are never duplicates and never neighbors.

    Determinism/exactness: clustering is ``kmeans_quantized`` (integer
    grid, bit-replayable); pair cosines are computed on the SAME
    quantized grid — integer dot products are exact in float64 (every
    intermediate sum is an integer far below 2^53), norms are one IEEE
    sqrt each and the quotient one IEEE divide, so the whole output
    replays bit-for-bit in SQL.

    Plan/scale: assignment is the scan-stage closure UDF; the only
    extra shuffle is ONE groupBy on cluster_id, and the pair work is
    O(sum_c n_c^2) — the SemDeDup contract is that k grows with the
    corpus (k ~ n / target_cluster_size) so each cluster's block fits
    one task (sub-block giant clusters like cosine_pairs_blocked if
    they ever exceed memory). Nothing but k x dim centroids reaches the
    driver."""
    from stream2segment_spark.operators.clustering import (
        kmeans_quantized, quantize_vec)

    df = _drop_null_vecs(df, vec_col)
    assigned, _ = kmeans_quantized(df, id_col, vec_col, k=k, iters=iters,
                                   scale=scale, seed=seed, init=init)
    wc = (df.select(F.col(id_col),
                    quantize_vec(F.col(vec_col), scale).alias("__qvec"))
          .join(assigned.select(id_col, "cluster_id"), id_col))
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, cluster_id int, "
                  "max_sim_prev double, is_dup boolean")

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = np.stack([np.asarray(v, dtype=np.int64)
                        for v in pdf["__qvec"]]).astype(np.float64)
        gram = mat @ mat.T                     # exact integer dots
        norms = np.sqrt(np.diag(gram))         # one IEEE sqrt each
        usable = norms > 0.0
        n = len(pdf)
        max_sim = np.full(n, np.nan)
        idx = np.flatnonzero(usable)
        for pos, i in enumerate(idx):
            if pos == 0:
                continue
            prev = idx[:pos]
            # dot / (n_i * n_j): one multiply, one divide — the exact
            # order the SQL oracle replays
            sims = gram[i, prev] / (norms[i] * norms[prev])
            max_sim[i] = sims.max()
        return pd.DataFrame({
            id_col: pdf[id_col],
            "cluster_id": pdf["cluster_id"].astype("int32"),
            "max_sim_prev": max_sim,
            "is_dup": np.where(np.isnan(max_sim), False,
                               max_sim >= threshold).astype(bool),
        })

    return wc.groupBy("cluster_id").applyInPandas(_cluster, out_schema)


def pq_topk_adc_refined(corpus: DataFrame, queries: DataFrame,
                        codebook: np.ndarray, k: int = 5,
                        refine: int = 4,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        query_id_col: str = "query_id") -> DataFrame:
    """ADC top-k with exact re-ranking (the IVFADC+R refinement of
    Jegou et al. 2011 §V): a ``refine * k`` ADC shortlist per query,
    then the TRUE squared distance on just those candidates, re-ranked
    to k. Returns ``(query_id, vec_id, adc_dist, exact_d2)``; ties on
    exact distance break by id.

    Scale shape: the refinement reads full vectors for only
    ``refine * k * |Q|`` ids — the candidate id set broadcasts into a
    semi-join, so the corpus streams map-side (never shuffled) and the
    exact math is a JVM ``zip_with``/``aggregate`` fold (left-to-right,
    engine-replayable) on the shortlisted rows only. ADC keeps the scan
    at m byte-lookups per row; the refine pass restores exact ranking
    where quantization error would flip neighbors."""
    if refine < 1:
        raise ValueError(f"refine must be >= 1, got {refine}")
    cand = pq_topk_adc(corpus, queries, codebook, k=refine * k,
                       id_col=id_col, vec_col=vec_col,
                       query_id_col=query_id_col)
    ids = cand.select(id_col).distinct()
    vecs = (corpus.join(F.broadcast(ids), id_col, "left_semi")
            .select(id_col, F.col(vec_col).alias("__v")))
    qdf = queries.select(query_id_col, F.col(vec_col).alias("__q"))
    j = (cand.join(vecs, id_col)
         .join(F.broadcast(qdf), query_id_col))
    d2 = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__q"),
                   lambda a, b: (a.cast("double") - b.cast("double"))
                   * (a.cast("double") - b.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("exact_d2").asc(), F.col(id_col))
    return (j.withColumn("exact_d2", d2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "adc_dist", "exact_d2"))
