"""Connected components over near-duplicate pair lists (beyond-reference,
LLM-pipeline): pair emission (MinHash/SimHash/Jaccard/cosine) only says
"A resembles B" — deduplicating a corpus needs the transitive CLUSTERS
(keep one canonical doc per component). This is the standard min-label
propagation formulation:

    label(v) <- min(label(v), min over neighbors of label(n))

iterated to fixpoint. Each round is one join + one groupBy-min — all
shuffles keyed by node id, no driver-side graph. Round count is bounded
by the component diameter, which for near-dup clusters is tiny (docs in
one cluster all resemble each other); ``max_iterations`` guards
pathological chains and raising it is O(1) per extra round.

Convergence is checked with a count of changed labels per round — one
extra cheap job per round, the standard Spark CC loop shape (driver-side
iteration with distributed rounds; the loop itself touches no data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iterations: int = 25,
    small_graph_edges: int = 1 << 20,
) -> DataFrame:
    """Cluster label per node: ``(id, cluster_id)`` with ``cluster_id`` =
    the minimum node id in the component (deterministic canonical winner,
    matching exact_dedup's keep-first-by-id semantics).

    ``nodes`` (optional): frame of all node ids; ids with no edge come
    back as singletons (cluster_id = own id). Without it, only ids
    appearing in ``edges`` are labeled.

    ``small_graph_edges``: when the symmetrized-distinct edge count
    (known for free from the eager cache fill) is at or below this
    bound, components are computed with a DRIVER-side union-find over
    the collected edge list instead of the distributed label-
    propagation loop (r9 opt round). Near-dup pair graphs are tiny
    relative to their corpora — the loop's per-round jobs (join +
    aggregate + eager checkpoint + convergence count) plus per-job
    driver planning dominated the funnel entries' wall time at
    sf0.1 (~10 jobs for a 378-edge graph). The bound keeps the
    collect driver-safe by construction (2^20 edges = a few tens of
    MB — the same bounded-driver-state class as k-means centroids or
    the BPE argmax); identical labels by definition (min node id per
    component), so the distributed path remains the behavior above
    the bound. Pass ``small_graph_edges=0`` to force the distributed
    loop.
    """
    # sym is re-joined EVERY round: without persist each round recomputes
    # the full upstream pair-generation pipeline (shingling + candidate
    # join + verify for near-dup edges — measured 25 s/round at sf0.1,
    # turning a 3-round CC over a 500-node graph into minutes). Persisting
    # the edge list is the canonical iterative-graph shape (same reason
    # GraphX/Pregel cache the edge RDD once).
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .distinct()
           .persist())
    # Materialize the edge cache EAGERLY before the loop: the first
    # round's checkpoint job otherwise reads sym through THREE plan
    # branches (labels, neigh_min's join side, and the join's probe) in
    # ONE job, racing the lazy cache fill — each branch recomputes the
    # full upstream pair pipeline (shingle verify for near-dup edges) in
    # parallel. Measured 10-20 s -> ~4 s on the incremental-funnel CC at
    # sf0.1 (r9 opt round; the sequenced-fill lesson of
    # ngram_jaccard_pairs applied to the edge frame). The count also
    # prices the small-graph fallback for free.
    n_edges = sym.count()
    if 0 < n_edges <= small_graph_edges:
        rows = sym.select("a", "b").collect()
        sym.unpersist()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:       # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN so the root is always the component's
                # smallest id — the documented cluster_id contract
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        ids = {a for a, _ in rows} | {b for _, b in rows}
        out = [(x, find(x)) for x in sorted(ids)]
        spark = edges.sparkSession
        a_type = edges.schema[src].dataType.simpleString()
        labels = spark.createDataFrame(
            out, f"{id_col} {a_type}, cluster_id {a_type}")
        if nodes is not None:
            labels = (nodes.select(F.col(id_col))
                      .join(labels, id_col, "left")
                      .select(id_col,
                              F.coalesce("cluster_id", F.col(id_col))
                              .alias("cluster_id")))
        return labels
    labels = (sym.select(F.col("a").alias(id_col)).distinct()
              .withColumn("cluster_id", F.col(id_col)))

    sc = edges.sparkSession.sparkContext

    def _ckpt_rdd_id(df: DataFrame) -> int | None:
        """The id of the RDD backing a localCheckpoint()ed frame (its
        analyzed plan is a LogicalRDD). Identifying OUR OWN checkpoint
        directly — never by diffing the global persistent-RDD map, which
        would claim (and later destroy) checkpoints another thread of
        the shared SparkContext materialized concurrently."""
        try:
            return int(df._jdf.queryExecution().analyzed().rdd().id())
        except Exception:
            return None

    def _unpersist_id(rid: int | None) -> None:
        # localCheckpoint pins its blocks outside the DataFrame cache
        # manager; the only handle back is the context's persistent-RDD
        # map. Best-effort: failure just leaves the block to the
        # ContextCleaner's GC-based cleanup.
        if rid is None:
            return
        try:
            jscala = sc._jsc.sc().getPersistentRDDs()
            if jscala.contains(rid):
                jscala.apply(rid).unpersist(False)
        except Exception:
            pass

    prev_ckpt_id: int | None = None
    for _ in range(max_iterations):
        neigh_min = (sym.join(labels.withColumnRenamed(id_col, "b"), "b")
                     .groupBy("a")
                     .agg(F.min("cluster_id").alias("nmin"))
                     .withColumnRenamed("a", id_col))
        # localCheckpoint truncates the lineage each round — without it the
        # logical plan nests exponentially and planning itself OOMs after
        # ~15 rounds. (On a cluster with fault-tolerance needs, swap for
        # checkpoint() with a checkpoint dir; semantics are identical.)
        updated = (labels.join(neigh_min, id_col, "left")
                   .select(id_col,
                           F.least("cluster_id", "nmin").alias("cluster_id"),
                           (F.col("nmin") < F.col("cluster_id"))
                           .alias("__changed"))
                   .localCheckpoint(eager=True))
        new_ckpt_id = _ckpt_rdd_id(updated)
        changed = updated.filter("__changed").count()
        # the previous round's checkpoint blocks are dead once this
        # round's checkpoint is materialized (labels now derives from it
        # alone) — release them instead of pinning R rounds of label
        # frames in the block manager; only the FINAL round's checkpoint
        # backs the returned frame and must stay.
        _unpersist_id(prev_ckpt_id)
        prev_ckpt_id = new_ckpt_id
        labels = updated.drop("__changed")
        if changed == 0:
            break
    else:
        # release the caches on the failure path too: the persisted
        # symmetric edge list and the last round's checkpoint blocks
        # would otherwise stay pinned for the session lifetime
        sym.unpersist()
        _unpersist_id(prev_ckpt_id)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations; component diameter exceeds the cap")

    sym.unpersist()
    if nodes is not None:
        labels = (nodes.select(F.col(id_col))
                  .join(labels, id_col, "left")
                  .select(id_col,
                          F.coalesce("cluster_id", F.col(id_col))
                          .alias("cluster_id")))
    return labels


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    iterations: int = 3,
    scale: int = 10**9,
    damping_num: int = 85,
    damping_den: int = 100,
    nodes: DataFrame | None = None,
    id_col: str = "id",
    persist: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic: ``(id,
    rank_q)`` with ranks quantized to ``scale`` (rank ~= rank_q/scale).

    Floating-point PageRank is not engine-replayable — the incoming-
    contribution sum is order-dependent in IEEE arithmetic, so two
    engines (or two partitionings) can differ in the last ulp and a
    hash-comparison oracle breaks. Quantizing to integers makes every
    sum exact and order-free (the ``kmeans_quantized`` trick applied to
    link analysis); the residual vs float PageRank is O(edges/scale),
    irrelevant for the ranking/filter use the signal feeds.

    Update rule, all BIGINT (``d = damping_num/damping_den``)::

        out_j      = sum of outgoing edge weights of j
        contrib_ji = (r_j * w_ji) div out_j          -- per edge
        r'_i       = (scale*(den-num)) div (den*N)
                     + (num * sum_j contrib_ji) div den

    Dangling-node mass is DROPPED, not redistributed (the common
    simplification; total rank decays slightly — fine for ranking).
    Deterministic by construction: replayable in SQL as unrolled CTE
    rounds with the same integer divisions.

    Scale shape (100 TB corpus -> ~1e7-host graph): the graph is
    host-sized, never corpus-sized — build ``edges`` with a corpus-side
    groupBy first. Each round is one keyed join (ranks x edges on src;
    both host-graph-sized, AQE broadcasts the rank side when it fits)
    plus one map-side-combined groupBy(dst). Only the scalar N crosses
    the driver. ``persist=False`` trades O(iterations^2) recomputation
    for leaving no cache behind (lazy gate consumers);
    ``localCheckpoint`` every ``checkpoint_every`` rounds bounds plan
    growth like every iterative operator here.
    """
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"need 0 < damping_num < damping_den, got "
            f"{damping_num}/{damping_den}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    w_col = (F.col(weight) if weight is not None else F.lit(1))
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"),
                     w_col.cast("long").alias("__w"))
    if weight is not None:
        # NULL / non-positive weights would silently corrupt the ranks
        # (a zero/negative __outw makes Spark's integer `div` yield
        # NULL -> the contribution is dropped, while the documented
        # DuckDB CTE replay ERRORS on division by zero — a cross-engine
        # divergence in the determinism contract; NULLs vanish inside
        # sum()). One edge-table scan, host-graph-sized (ADVICE r7).
        bad = e.where(F.col("__w").isNull() | (F.col("__w") <= 0)).limit(1)
        if bad.count() > 0:
            raise ValueError(
                f"pagerank_quantized: edge weight column {weight!r} "
                f"contains NULL or non-positive values — filter or "
                f"re-weight edges first (weights must be positive "
                f"integers)")
    n = (e.select(F.col("__src").alias(id_col))
         .union(e.select(F.col("__dst").alias(id_col))))
    if nodes is not None:
        n = n.union(nodes.select(F.col(id_col)))
    n = n.distinct()
    outd = e.groupBy("__src").agg(F.sum("__w").alias("__outw"))
    ej = e.join(outd, "__src")
    if persist:
        n = n.persist()
        ej = ej.persist()
    # N and the two bases are bounded driver scalars (node count ->
    # plan literals), like k-means' k x dim centroids
    big_n = n.count()
    if big_n == 0:
        if persist:
            n.unpersist()
            ej.unpersist()
        return n.select(F.col(id_col), F.lit(0).cast("long").alias("rank_q"))
    base = (scale * (damping_den - damping_num)) // (damping_den * big_n)
    r = n.select(F.col(id_col),
                 F.lit(scale // big_n).cast("long").alias("rank_q"))
    for i in range(iterations):
        contrib = (ej.join(r, ej["__src"] == r[id_col])
                   .select(F.col("__dst").alias(id_col),
                           F.expr("(rank_q * __w) div __outw")
                            .alias("__c"))
                   .groupBy(id_col)
                   .agg(F.sum("__c").alias("__inr")))
        r = (n.join(contrib, id_col, "left")
             .select(F.col(id_col),
                     (F.lit(base)
                      + F.expr(f"({damping_num} * coalesce(__inr, 0L)) "
                               f"div {damping_den}"))
                     .cast("long").alias("rank_q")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint(eager=True)
    if persist:
        # materialize, then release the iteration caches — the returned
        # frame is node-sized and self-contained after the checkpoint
        # (same close-out shape as connected_components)
        r = r.localCheckpoint(eager=True)
        n.unpersist()
        ej.unpersist()
    return r
