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


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    ``(left, right, cnt)``."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.get("syms", i).alias("left"),
                        F.get("syms", i + 1).alias("right")))
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (words.select("freq", F.explode(pairs).alias("p"))
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
              persist: bool = True,
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
    vocabulary-sized, never corpus-sized. ``persist=False`` trades
    O(n_merges^2) recomputation for leaving NO cache behind — for
    lazy consumers that cannot release a cache after their collect
    (the gate entry), at small fixed n_merges."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    words = word_freq_table(docs, text_col)
    if persist:
        words = words.persist()
        words.count()
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
            if persist:
                nxt = nxt.persist()
                try:
                    nxt.count()
                except Exception:
                    nxt.unpersist()   # don't leak the half-cached round
                    raise
                words.unpersist()
            words = nxt
        return merges, words
    except Exception:
        if persist:
            words.unpersist()
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
        return texts.map(
            lambda t: [encode_word(w)
                       for w in tok_re.split((t or "").lower()) if w])

    return _seg


def bpe_train_batched(docs: DataFrame, text_col: str, n_merges: int,
                      batch: int = 16,
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
    persisted — caller unpersists."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if batch <= 0:
        raise ValueError(f"batch must be positive, got {batch}")
    words = word_freq_table(docs, text_col).persist()
    words.count()
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
            nxt = words.withColumn("syms", col).persist()
            try:
                nxt.count()
            except Exception:
                nxt.unpersist()
                raise
            words.unpersist()
            words = nxt
        return merges, words
    except Exception:
        words.unpersist()
        raise
