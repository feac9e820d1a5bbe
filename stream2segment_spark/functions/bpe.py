"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al. 2016 — public algorithm) over a document corpus.

Training is the classic loop: start from characters, repeatedly count
adjacent symbol pairs across the corpus (weighted by word frequency),
merge the most frequent pair everywhere, repeat. The Spark shape
mirrors ``operators.clustering.kmeans_quantized``'s driver-round
pattern:

- ONE corpus pass builds the distinct-word frequency table (the classic
  BPE trick: all further work is over distinct WORDS x their corpus
  counts, never the corpus again — vocabulary-sized, cached).
- Each merge round is: pair explode + one map-side-combined (a, b)
  count shuffle + a driver argmax of a vocabulary-bounded aggregate
  (only the single best pair crosses the driver, like k x dim
  centroids), then a pure-JVM fold rewrites the symbol arrays.
- Greedy left-to-right application is an ``F.aggregate`` fold with a
  (output, pending) struct accumulator — exact BPE semantics including
  runs of identical symbols ("aaa" + merge (a,a) -> ["aa", "a"]), no
  Python in the loop.

Determinism: ties on pair count break lexicographically on (left,
right) — bit-replayable in SQL, where each round is an unrolled CTE
chain (pair counts -> scalar argmax pick -> windowed gaps-and-islands
greedy rewrite; see queries_corpus._BPE_ROUND_SQL).

Three trainers, one merge semantics:

- :func:`bpe_train` — canonical order, distributed pair recount per
  round; the fully-distributed exact baseline.
- :func:`bpe_train_batched` — top-B non-interacting merges per
  recount, O(n/B) rounds (order may deviate from canonical; stated
  trade-off). The distributed scale path for large vocabularies.
- :func:`bpe_train_collected` — EXACT canonical order at real-vocab
  speed: the corpus pass stays distributed, then the vocabulary-
  bounded word-frequency table is collected (bounded dim BY CONTRACT,
  ``max_words``-guarded like k-means centroids) and the merge loop
  runs in memory with incremental pair-count maintenance. This is the
  shape every production BPE trainer uses (count distributed, merge
  local) — a 32k-merge vocabulary is thousands of driver rounds, and
  per-round Spark job+shuffle latency can never amortize at any data
  size because all post-count work is vocab-bounded, not
  corpus-bounded. (An incremental-delta DISTRIBUTED trainer was built
  and measured 1.3-1.6x SLOWER than full recount at sf0.01/sf0.1:
  maintaining the running pair-count table re-shuffles all distinct
  pairs every round — the delta saves only map-side explode work.
  Rejected; measurement in PLANS.md.)

The distributed trainers ``localCheckpoint`` their running frame every
``checkpoint_every`` rounds: plan truncation is load-bearing —
persist-only round loops grow the logical plan until PLANNING kills
the driver (measured: 48 rounds OOMed the heap building the plan tree
string), the same lesson as ``operators.graph.connected_components``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.operators.dedup import word_tokens


def word_freq_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with corpus frequencies and initial character
    symbols: ``(word, freq, syms)``. The single corpus-sized pass of
    BPE training."""
    return (docs
            .select(F.explode(word_tokens(
                F.coalesce(F.col(text_col), F.lit("")))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq"))
            .withColumn("syms", F.regexp_extract_all(
                "word", F.lit("(.)"), 1)))


def adjacent_pairs(syms_col) -> "F.Column":
    """``array<struct<left,right>>`` of adjacent symbol pairs in a symbol
    array (empty for 0/1-symbol words)."""
    return F.when(
        F.size(syms_col) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(syms_col) - 2),
                    lambda i: F.struct(
                        F.get(syms_col, i).alias("left"),
                        F.get(syms_col, i + 1).alias("right")))
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    ``(left, right, cnt)``."""
    return (words.select("freq",
                         F.explode(adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("cnt")))


def apply_merge(sym_col, left: str, right: str):
    """Greedy left-to-right merge of every adjacent (left, right) pair in
    a symbol array — the exact BPE rewrite, as ONE JVM fold. Runs of an
    identical symbol merge alternately from the left (pending resets
    after a merge), matching reference BPE."""
    merged = left + right
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"))

    def step(acc, x):
        return (
            F.when(acc["pend"].isNull(),
                   F.struct(acc["out"].alias("out"), x.alias("pend")))
            .when((acc["pend"] == left) & (x == right),
                  F.struct(F.concat(acc["out"], F.array(F.lit(merged)))
                            .alias("out"),
                           F.lit(None).cast("string").alias("pend")))
            .otherwise(
                F.struct(F.concat(acc["out"], F.array(acc["pend"]))
                          .alias("out"),
                         x.alias("pend"))))

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]) \
                .otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(sym_col, acc0, step, finish)


def bpe_train(docs: DataFrame, text_col: str, n_merges: int,
              persist: bool = True, checkpoint_every: int = 8,
              ) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges; returns (merges, words) where
    merges is ``[(left, right, pair_count), ...]`` in training order and
    ``words`` is the final ``(word, freq, syms)`` segmentation table.

    Each round's argmax is deterministic: highest corpus-weighted count,
    ties to the lexicographically smallest (left, right). Stops early
    (fewer than ``n_merges`` rows) when no pair remains.

    With ``persist=True`` (default — the right choice for real merge
    counts: round R otherwise recomputes R-deep lineage from the
    corpus) the returned ``words`` frame is cached and callers
    ``unpersist()`` it when done, as the CLI and tests do; it is
    vocabulary-sized, never corpus-sized. Every ``checkpoint_every``
    rounds the frame is ``localCheckpoint``ed instead — plan
    truncation, without which PLANNING dies long before data does (48
    persist-only rounds OOMed the driver heap on the plan tree string;
    see :class:`_RoundFrame`). ``persist=False`` trades O(n_merges^2)
    recomputation for leaving NO cache behind — for lazy consumers
    that cannot release a cache after their collect (the gate entry),
    at small fixed n_merges only."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if checkpoint_every <= 0:
        raise ValueError(
            f"checkpoint_every must be positive, got {checkpoint_every}")
    words = word_freq_table(docs, text_col)
    frame = _RoundFrame(words, checkpoint_every) if persist else None
    if frame is not None:
        words = frame.df
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (pair_counts(words)
                   .orderBy(F.col("cnt").desc(), "left", "right")
                   .limit(1).collect())
            if not top:
                break
            left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
            merges.append((left, right, int(cnt)))
            nxt = words.withColumn(
                "syms", apply_merge(F.col("syms"), left, right))
            words = frame.advance(nxt) if frame is not None else nxt
        return merges, words
    except Exception:
        if frame is not None:
            frame.release()
        raise


def bpe_segment(text_col, merges: list[tuple[str, str, int]]):
    """Segment raw text with a trained merge table: word-tokenize, split
    each word to characters, apply every merge in training order.
    Returns an ``array<array<string>>`` column (per-word subword
    sequences) — flatten for a flat subword stream. Pure expressions;
    merge application unrolls to ``len(merges)`` nested folds (fine for
    the usual few-thousand-merge vocab when segmenting with a saved
    table; tokenization at scale would bake merges into a broadcast
    pandas UDF instead)."""
    def seg_word(w):
        syms = F.regexp_extract_all(w, F.lit("(.)"), 1)
        for left, right, _ in merges:
            syms = apply_merge(syms, left, right)
        return syms

    return F.transform(word_tokens(F.coalesce(text_col, F.lit(""))),
                       seg_word)


def bpe_segment_udf(merges: list[tuple[str, str, int]]):
    """Scale-path segmenter: the merge table ships in the closure as a
    rank dict and each word is encoded with the standard priority-queue
    -free reference loop (scan for the best-ranked adjacent pair,
    rewrite, repeat). Use this for real vocabularies — the expression
    form in :func:`bpe_segment` unrolls one fold PER MERGE into the
    plan, fine for a handful, catastrophic for a 32k-merge vocab.
    Returns a pandas UDF: ``string -> array<array<string>>`` (per-word
    subword sequences for the whitespace-ish tokenized text), matching
    :func:`bpe_segment` exactly for CANONICAL (batch=1) merge tables —
    rank-priority encoding equals in-order application because a later
    merge can never recreate an earlier merge's pair. A BATCHED table
    can contain two merges producing the same surface symbol (e.g.
    (ab, c) and (a, bc) both yield 'abc'); occurrences created by the
    later one are seen by the earlier merge's rank here but not by
    in-order application, so the two encoders may diverge on such
    tables — this rank-priority form is the standard BPE encoder and
    the one to prefer."""
    ranks = {(left, right): i for i, (left, right, _) in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            left, right = merges[best_rank][0], merges[best_rank][1]
            out, i = [], 0
            # greedy left-to-right application of the chosen merge —
            # identical semantics to apply_merge's fold
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    tok_re = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf("array<array<string>>")
    def _seg(texts: pd.Series) -> pd.Series:
        from stream2segment_spark.operators.dedup import py_fold
        return texts.map(
            lambda t: [encode_word(w)
                       for w in tok_re.split(py_fold(t or "")) if w])

    return _seg


def bpe_train_batched(docs: DataFrame, text_col: str, n_merges: int,
                      batch: int = 16, checkpoint_every: int = 8,
                      ) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Batched BPE training: each driver round picks the top ``batch``
    pairwise NON-INTERACTING merges (no symbol shared with any
    higher-ranked chosen pair, on either side) and applies them all
    before recounting — O(n_merges / batch) sequential rounds instead
    of O(n_merges).

    Non-interacting merges commute: applying one cannot create, destroy
    or shift an occurrence of the other (a merge only touches runs of
    its own two symbols), so WITHIN a round the result is
    application-order independent. ACROSS rounds the variant can differ
    from canonical BPE (a lower-ranked chosen pair's true count may
    have dropped after the round's earlier merges — canonical BPE would
    recount first); this is the standard large-vocab training
    trade-off, stated rather than hidden. ``batch=1`` degenerates to
    the canonical sequence of :func:`bpe_train`.

    Returns (merges, words) like :func:`bpe_train`; the words frame is
    persisted — caller unpersists. Every ``checkpoint_every`` ROUNDS
    (not merges) the frame is ``localCheckpoint``ed for plan truncation
    (see :class:`_RoundFrame`)."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if batch <= 0:
        raise ValueError(f"batch must be positive, got {batch}")
    if checkpoint_every <= 0:
        raise ValueError(
            f"checkpoint_every must be positive, got {checkpoint_every}")
    frame = _RoundFrame(word_freq_table(docs, text_col), checkpoint_every)
    words = frame.df
    merges: list[tuple[str, str, int]] = []
    try:
        while len(merges) < n_merges:
            want = min(batch, n_merges - len(merges))
            # pull a headroom of candidates (ranked), then greedily keep
            # pairs whose symbols are disjoint from every kept pair
            cand = (pair_counts(words)
                    .orderBy(F.col("cnt").desc(), "left", "right")
                    .limit(want * 4 + 16).collect())
            if not cand:
                break
            used: set[str] = set()
            chosen: list[tuple[str, str, int]] = []
            for row in cand:
                left, right = row["left"], row["right"]
                if left in used or right in used:
                    continue
                chosen.append((left, right, int(row["cnt"])))
                used.update((left, right, left + right))
                if len(chosen) >= want:
                    break
            if not chosen:   # every candidate interacted — fall back to 1
                row = cand[0]
                chosen = [(row["left"], row["right"], int(row["cnt"]))]
            merges.extend(chosen)
            col = F.col("syms")
            for left, right, _ in chosen:
                col = apply_merge(col, left, right)
            words = frame.advance(words.withColumn("syms", col))
        return merges, words
    except Exception:
        frame.release()
        raise


def _ckpt_rdd_id(df: DataFrame) -> int | None:
    """Id of the RDD backing a localCheckpoint()ed frame (LogicalRDD
    plan) — same own-checkpoint identification as
    ``operators.graph.connected_components`` (never diff the global
    persistent-RDD map; it can claim another thread's checkpoint)."""
    try:
        return int(df._jdf.queryExecution().analyzed().rdd().id())
    except Exception:
        return None


def _unpersist_rdd_id(sc, rid: int | None) -> None:
    """Best-effort release of a checkpoint's blocks; failures leave the
    block to ContextCleaner GC."""
    if rid is None:
        return
    try:
        jscala = sc._jsc.sc().getPersistentRDDs()
        if jscala.contains(rid):
            jscala.apply(rid).unpersist(False)
    except Exception:
        pass


class _RoundFrame:
    """Running frame of a driver-round loop: persist each round,
    ``localCheckpoint`` every ``every``-th advance (plan truncation),
    releasing the superseded round's cache — and the superseded
    CHECKPOINT only once a newer checkpoint has truncated lineage past
    it (localCheckpoint is not fault-tolerant: a released checkpoint
    that lineage still needs is unrecoverable, not recomputable).

    Plan truncation is load-bearing, not an optimization: without it
    the nested round plans grow until PLANNING itself kills the driver
    — measured with ``bpe_train``'s original persist-only loop, which
    at 48 merges died with a java.lang.OutOfMemoryError inside
    ``QueryExecution.explainString`` (the plan TREE STRING no longer
    fit the heap). On a cluster needing fault tolerance swap
    localCheckpoint for checkpoint() with a checkpoint dir."""

    def __init__(self, df: DataFrame, every: int):
        self.sc = df.sparkSession.sparkContext
        self.every = every
        self.rounds = 0
        self.ckpt_id: int | None = None
        self.df = df.persist()
        self.df.count()

    def advance(self, new: DataFrame) -> DataFrame:
        self.rounds += 1
        if self.every and self.rounds % self.every == 0:
            new = new.localCheckpoint(eager=True)
            _unpersist_rdd_id(self.sc, self.ckpt_id)
            self.ckpt_id = _ckpt_rdd_id(new)
        else:
            new = new.persist()
            try:
                new.count()
            except Exception:
                new.unpersist()
                raise
        self.df.unpersist()
        self.df = new
        return new

    def release(self) -> None:
        """Full teardown: drop the cache and the last checkpoint. For a
        frame handed to the caller (the returned words) call NOTHING —
        the caller unpersists the cache and the final checkpoint backs
        the frame (released by ContextCleaner GC, as in
        ``connected_components``)."""
        self.df.unpersist()
        _unpersist_rdd_id(self.sc, self.ckpt_id)


def bpe_merge_loop(words: "list[str]", freqs: "list[int]", n_merges: int,
                   ) -> tuple[list[tuple[str, str, int]], list[list[str]]]:
    """The in-memory BPE merge loop over a (word, freq) vocabulary:
    returns (merges, per-word symbol lists) with EXACTLY the
    distributed trainers' semantics — greedy left-to-right application,
    argmax by (count desc, left asc, right asc).

    Standard incremental algorithm: pair -> count dict, pair -> {word
    ids} inverted index, and a lazy-deletion heap ordered by (-count,
    left, right). Decrements don't push heap entries; a popped stale
    entry re-pushes the pair's CURRENT count (it may hold the pair's
    only path back into the heap). Each merge touches only the words
    containing the pair. Pure Python — property-tested against a naive
    full-recount reference."""
    import heapq

    syms_list: list[list[str]] = [list(w) for w in words]

    def word_pairs(syms: list[str]) -> list[tuple[str, str]]:
        return list(zip(syms, syms[1:]))

    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(syms_list):
        for p in word_pairs(syms):
            counts[p] = counts.get(p, 0) + freqs[i]
            index.setdefault(p, set()).add(i)
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, left, right = heapq.heappop(heap)
        cur = counts.get((left, right))
        if cur is None:
            continue                     # pair died; stale entry
        if -negc != cur:
            heapq.heappush(heap, (-cur, left, right))
            continue
        merges.append((left, right, cur))
        for i in sorted(index.get((left, right), ())):
            syms = syms_list[i]
            out, k = [], 0
            # greedy left-to-right, identical to apply_merge's fold
            while k < len(syms):
                if (k + 1 < len(syms) and syms[k] == left
                        and syms[k + 1] == right):
                    out.append(left + right)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            old_pairs, new_pairs = word_pairs(syms), word_pairs(out)
            syms_list[i] = out
            f = freqs[i]
            for p in old_pairs:
                c = counts.get(p, 0) - f
                if c <= 0:
                    counts.pop(p, None)
                else:
                    counts[p] = c
            for p in new_pairs:
                c = counts.get(p, 0) + f
                counts[p] = c
                heapq.heappush(heap, (-c, p[0], p[1]))
                index.setdefault(p, set()).add(i)
            for p in set(old_pairs) - set(new_pairs):
                s = index.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        index.pop(p, None)
        index.pop((left, right), None)
        counts.pop((left, right), None)
    return merges, syms_list


def bpe_train_collected(docs: DataFrame, text_col: str, n_merges: int,
                        max_words: int = 5_000_000,
                        ) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """EXACT canonical :func:`bpe_train` merge sequence at real-vocab
    speed: the corpus pass (tokenize + word frequencies) stays
    distributed, then :func:`bpe_merge_loop` runs on the collected
    vocabulary — the shape every production BPE trainer uses, because
    all post-count work is VOCAB-bounded, not corpus-bounded, and a
    32k-merge vocabulary means thousands of sequential rounds whose
    per-round Spark job+shuffle latency can never amortize.

    The collect is a bounded dim by the same contract as k-means
    centroids / ANN query sets: ``max_words`` caps it (a 5M-word
    vocabulary is a few hundred MB) and the function REFUSES rather
    than silently truncates when the vocabulary exceeds the cap —
    raise the cap or use the distributed trainers.

    Returns (merges, words) with ``words`` a regular (word, freq,
    syms) DataFrame built from the final in-memory table (not cached;
    vocabulary-sized)."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if max_words <= 0:
        raise ValueError(f"max_words must be positive, got {max_words}")
    spark = docs.sparkSession
    vocab = word_freq_table(docs, text_col).select("word", "freq")
    rows = vocab.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"vocabulary exceeds max_words={max_words}; raise the cap or "
            f"use bpe_train / bpe_train_batched")
    freqs = [int(r["freq"]) for r in rows]
    merges, syms_list = bpe_merge_loop(
        [r["word"] for r in rows], freqs, n_merges)
    out_df = spark.createDataFrame(
        [(r["word"], f, s) for r, f, s in zip(rows, freqs, syms_list)],
        "word string, freq long, syms array<string>")
    return merges, out_df
