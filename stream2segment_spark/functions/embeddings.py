"""Deterministic text embeddings via the feature-hashing trick
(beyond-reference, LLM-pipeline): character-n-gram hashing into a fixed
number of signed buckets, L2-normalized — the classic hashed
bag-of-n-grams representation. Not a stub: this is a real, widely-used
featurization (hashing vectorizers), and it makes the engine's whole
similarity stack (brute-force/LSH/IVF/PQ ANN, cosine near-dup, k-means)
applicable to RAW TEXT with no external model:

    docs -> hashed_ngram_embeddings -> lsh_bucket_neardup / kmeans ...

Determinism is the point: buckets and signs derive from md5 of the
n-gram (engine-universal, like the sampling/simhash machinery), the
accumulators are exact integers, and the only float ops are one IEEE
division and one IEEE sqrt per component — so the embedding is
bit-identical across runs, engines and partitionings, and the DuckDB
oracle replays it exactly.

Scale: a map-only Arrow stage (numpy bincount per doc) — no shuffle, no
state; composes with scan pruning. dim and n-gram order trade recall
for collision noise exactly as in the published hashing-trick analyses.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.operators.dedup import get_tokenizer

def embed_text(text: str | None, dim: int = 64, n: int = 3,
               seed: str = "emb", tokenizer: str = "ascii") -> np.ndarray:
    """One document -> L2-normalized float64 vector (driver-side twin of
    the UDF; the unit tests and the DuckDB oracle replay this exactly).
    Normalization: lowercase, collapse non-alphanumerics to single
    spaces, strip; n-grams over the padded string ``' text '`` so word
    boundaries contribute. Empty/null text -> the zero vector."""
    _, py_toks = get_tokenizer(tokenizer)
    # " ".join(tokens) == the documented collapse-to-single-spaces form
    # (tokens are the non-separator runs); with tokenizer='unicode' the
    # n-grams keep CJK/Cyrillic/accented characters instead of erasing
    # them, so non-English text embeds to a non-zero vector
    s = " ".join(py_toks("" if text is None else text))
    acc = np.zeros(dim, dtype=np.int64)
    if s:
        s = f" {s} "
        for i in range(len(s) - n + 1):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{s[i:i + n]}".encode()).digest()[:8],
                "big")
            acc[(h >> 1) % dim] += 1 if (h & 1) else -1
    norm = float(np.sqrt(float((acc * acc).sum())))
    return acc / norm if norm > 0 else acc.astype(np.float64)


def hashed_ngram_embeddings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    n: int = 3,
    seed: str = "emb",
    out_col: str = "embedding",
    tokenizer: str = "ascii",
) -> DataFrame:
    """Append ``out_col`` (array<double>, L2-normalized) — map-only
    Arrow stage, bit-identical to :func:`embed_text` per row (asserted in
    tests). The gram -> (bucket, sign) map is memoized per task: the
    3-gram space over [a-z0-9 ] is at most 37^n entries (~50k at n=3),
    and corpus gram frequencies are Zipfian, so the md5 per OCCURRENCE
    of embed_text becomes an md5 per DISTINCT gram (~3x wall on the
    synthetic corpus, more on natural text). With tokenizer='unicode'
    the gram space is open-ended (CJK), but the cache is still
    bounded by the DISTINCT grams seen per task, the same bound any
    hash-vectorizer batch job has."""
    _, py_toks = get_tokenizer(tokenizer)

    def part(batches):
        cache: dict[str, tuple[int, int]] = {}

        def bucket_sign(gram: str) -> tuple[int, int]:
            v = cache.get(gram)
            if v is None:
                h = int.from_bytes(
                    hashlib.md5(f"{seed}:{gram}".encode()).digest()[:8],
                    "big")
                v = ((h >> 1) % dim, 1 if (h & 1) else -1)
                cache[gram] = v
            return v

        for pdf in batches:
            vecs = []
            for txt in pdf[text_col]:
                s = " ".join(py_toks("" if txt is None else txt))
                acc = np.zeros(dim, dtype=np.int64)
                if s:
                    s = f" {s} "
                    for i in range(len(s) - n + 1):
                        b, sg = bucket_sign(s[i:i + n])
                        acc[b] += sg
                norm = float(np.sqrt(float((acc * acc).sum())))
                vecs.append(acc / norm if norm > 0
                            else acc.astype(np.float64))
            out = pdf.copy()
            out[out_col] = pd.Series(list(np.asarray(v) for v in vecs))
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(part, f"{fields}, {out_col} array<double>")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss signed random projection
# ---------------------------------------------------------------------------

def rp_signs(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[int]]:
    """The deterministic {-1, +1} projection matrix as out_dim rows of
    in_dim signs: sign(i, j) = +1 iff the md5 bucket of ``seed:i:j`` is
    even (i = input index, j = output index) — the Achlioptas (2003)
    database-friendly JL variant with the repo's md5 convention, so any
    engine derives the identical matrix (the gate oracle recomputes it
    in SQL)."""
    out: list[list[int]] = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15]
            row.append(1 if int(h, 16) % 2 == 0 else -1)
        out.append(row)
    return out


def random_projection(df: DataFrame, vec_col: str, id_col: str,
                      in_dim: int, out_dim: int, seed: str = "rp",
                      exact: bool = False) -> DataFrame:
    """Project ``vec_col`` (array<float/double>, length ``in_dim``) to
    ``out_dim`` dimensions: y_j = (sum_i x_i * sign(i, j)) / sqrt(out_dim)
    — the Johnson-Lindenstrauss sketch that preserves pairwise distances
    within (1 +- eps) for out_dim ~ O(log n / eps^2). The ANN
    scale-path preprocessor: brute-force/IVF top-k over 16-64 projected
    dims instead of thousands, exact re-rank on the shortlist
    (operators/similarity.py composes).

    ``exact=True`` evaluates each component as a position-ordered JVM
    fold (zip_with + aggregate) — bit-replayable cross-engine (every op
    is IEEE +,*,/ and one correctly-rounded sqrt), the verification
    contract. ``exact=False`` (default) runs one Arrow-batched numpy
    matmul per partition — the production path (matmul summation order
    is implementation-defined; values agree to float rounding, not
    bits). Returns ``(id_col, rp)`` with ``rp`` array<double>.

    Scale shape: map-only either way (the sign matrix ships as a
    literal/closure, never a join); no shuffle, composes with column
    pruning — the corpus is touched once."""
    signs = rp_signs(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    if exact:
        # one transform() over a single nested-array literal instead of
        # out_dim unrolled aggregate expressions (out_dim x in_dim
        # literal nodes): the per-component fold is the identical
        # left-to-right zip_with+aggregate (same IEEE +,*,*/ sequence —
        # exceptAll-verified bit-equal both directions), but the
        # expression tree shrinks from ~2k nodes to one literal + two
        # HOFs, which removes the Catalyst analyze/canonicalize cost
        # that dominated sim_topk_rp / sim_random_projection (r9 opt
        # round). The input vector is BOUND ONCE per row (the
        # functions/text._bind_once shape): referencing vec_col directly
        # inside the matrix-row lambda would let CollapseProject inline
        # whatever expression produced it — its textual "referenced
        # once" test is blind to HOF re-execution, so a derived input
        # (e.g. sim_topk_rp's normalize fold) would re-run out_dim times
        # per row (measured 20 s vs 0.9 s at sf0.1); the old unrolled
        # form was only protected by tripping the collapse guard's
        # multi-reference test with its 32 textual references.
        matlit = F.lit([[float(s) for s in row] for row in signs])
        bound = F.array(F.struct(
            F.col(vec_col).cast("array<double>").alias("v")))
        rp = F.get(F.transform(bound, lambda b: F.transform(
            matlit,
            lambda srow: F.aggregate(
                F.zip_with(b["v"], srow, lambda a, s: a * s),
                F.lit(0.0), lambda a, e: a + e)
            / F.sqrt(F.lit(float(out_dim))))), 0)
        return df.select(F.col(id_col), rp.alias("rp"))

    mat = np.asarray(signs, dtype=np.float64).T  # (in_dim, out_dim)

    def _proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if m.shape[1] != in_dim:
                raise ValueError(
                    f"vector length {m.shape[1]} != in_dim {in_dim}")
            y = (m @ mat) / scale
            yield pd.DataFrame({id_col: pdf[id_col],
                                "rp": list(y)})

    out_schema = f"{id_col} long, rp array<double>"
    return df.select(id_col, vec_col).mapInPandas(_proj, out_schema)
