"""Distributed linear quality classifier (beyond-reference,
LLM-pipeline capability): the modern corpus-curation step that
heuristic filters feed into — train a cheap linear model on labeled
examples (curated-vs-raw pseudo-labels, heuristic distillation,
LLM-judged seeds) and score the whole corpus with it.

Full-batch gradient descent in the classic Spark shape (the same
playbook as :mod:`.clustering`): weights are a small vector that ships
in a UDF closure (dim values, driver-bounded), the per-row
gradient contribution is a scan-stage Arrow batch computation, and the
update is ONE map-side-combined shuffle per iteration on dimension
keys. The driver collects only ``dim`` longs per iteration; the corpus
never moves.

Every quantity lives on an integer grid or is a single correctly-
rounded IEEE op, so training is DETERMINISTIC and bit-replayable
across engines (the repo's strong-oracle discipline):

- features are quantized to ``round(x * scale)`` longs, weights to a
  ``wscale`` grid (integer dot products stay exact in int64);
- the squashing function is the RATIONAL fast sigmoid
  ``s(z) = 0.5 + z / (2 * (1 + |z|))`` — the logistic exp() is only
  ulp-accurate across libms and could flip a rounding tie, while
  +,*,/,abs are IEEE-exact everywhere; s() shares the logistic's
  shape, range (0,1) and midpoint s(0)=0.5;
- each row's per-dimension gradient contribution is rounded HALF-AWAY
  to an integer, so the cross-row aggregation is an integer sum —
  immune to float summation order (a plain double sum would make
  training depend on partition boundaries);
- the weight update rounds ``lr * sum / n`` half-away onto the weight
  grid: one exact int-to-double cast (sums stay under 2^53 for corpora
  up to ~1e12 rows at scale=1000), one IEEE division, one multiply by
  an exactly-representable lr, one half-away round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.operators.clustering import quantize_vec


def _half_away(v: np.ndarray) -> np.ndarray:
    """SQL round semantics (half-AWAY from zero); np.round is
    half-even and would disagree on every .5 tie."""
    return np.copysign(np.floor(np.abs(v) + 0.5), v)


def _fast_sigmoid(z: np.ndarray) -> np.ndarray:
    """Rational squash s(z) = 0.5 + z/(2(1+|z|)) — every op IEEE-exact,
    so any engine computes the identical double."""
    return 0.5 + z / (2.0 * (1.0 + np.abs(z)))


def _grad_udf(weights: list[int], scale: int, wscale: int):
    """Per-row integer gradient contribution round((s(z) - y) * qx_d)
    as a closure pandas UDF (weights ship with the task — no
    per-iteration Catalyst literal, the clustering.py lesson)."""
    w = np.asarray(weights, dtype=np.int64)
    denom = float(scale) * float(wscale)

    @F.pandas_udf("array<bigint>")
    def _ud(qx: pd.Series, y: pd.Series) -> pd.Series:
        if not len(qx):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.int64) for v in qx])
        z = (x @ w).astype(np.float64) / denom   # exact: int dot, one div
        r = _fast_sigmoid(z) - y.to_numpy(dtype=np.float64)
        g = _half_away(r[:, None] * x).astype(np.int64)
        return pd.Series(list(g))

    return _ud


def train_linear_classifier(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    iters: int = 2,
    lr: float = 0.5,
    scale: int = 1000,
    wscale: int = 1000,
) -> tuple[DataFrame, list[int]]:
    """Train ``iters`` full-batch GD steps from zero weights; return
    ``(scored, weights)`` where ``scored`` carries ``(id_col,
    label_col, score, pred)`` for every input row under the FINAL
    weights (score = fast-sigmoid of the normalized dot product, pred =
    score >= 0.5) and ``weights`` is the final ``dim`` quantized
    integers (real weight = w / wscale).

    ``lr`` must be exactly representable in binary (0.5, 0.25, 0.75...)
    so the update multiply is exact cross-engine.

    Shuffle budget per iteration: one map-side-combined (pos -> sum)
    aggregate of integer contributions; ``dim`` longs to the driver.
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    if not float(lr * 4).is_integer():
        raise ValueError(f"lr must be a multiple of 0.25, got {lr}")
    # rows with a NULL feature vector or NULL label carry no gradient:
    # drop them up front (the same dirty-data contract as the ANN stack)
    q = (df.where(F.col(vec_col).isNotNull()
                  & F.col(label_col).isNotNull())
         .select(F.col(id_col),
                 quantize_vec(F.col(vec_col), scale).alias("__qx"),
                 F.col(label_col).cast("double").alias("__y")).persist())
    n = q.count()
    if n == 0:
        q.unpersist()
        raise ValueError("classifier needs a non-empty input "
                         "(after dropping NULL-feature/label rows)")
    dim = len(q.select("__qx").first()["__qx"])
    weights = [0] * dim
    for _ in range(iters):
        g = q.select(_grad_udf(weights, scale, wscale)(
            F.col("__qx"), F.col("__y")).alias("__g"))
        sums = (g.select(F.posexplode("__g").alias("pos", "v"))
                 .groupBy("pos").agg(F.sum("v").alias("s")).collect())
        by_pos = {r["pos"]: r["s"] for r in sums}
        # update: w -= round(lr * mean_contribution) on the weight grid
        # (sum is an exact int64; /n and *lr are single IEEE ops)
        weights = [
            int(w - _half_away(np.array([lr * (by_pos.get(p, 0) / n)]))[0])
            for p, w in enumerate(weights)]
    scored = q.select(
        id_col,
        F.col("__y").cast("int").alias(label_col),
        _score_udf(weights, scale, wscale)(F.col("__qx")).alias("score"),
    ).withColumn("pred", (F.col("score") >= 0.5).cast("int"))
    # release the training cache (persist-hygiene contract): the
    # caller's action on `scored` re-quantizes once, a map-only scan
    q.unpersist()
    return scored, weights


def _score_udf(weights: "list[int]", scale: int, wscale: int):
    """Arrow-batched scoring under FIXED quantized weights: fast-sigmoid
    of the normalized integer dot product (shared by the final training
    scores and standalone inference — one scoring rule, no drift)."""
    w = np.asarray(weights, dtype=np.int64)
    denom = float(scale) * float(wscale)

    @F.pandas_udf("double")
    def _score(qx: pd.Series) -> pd.Series:
        if not len(qx):
            return pd.Series([], dtype="float64")
        x = np.stack([np.asarray(v, dtype=np.int64) for v in qx])
        if x.shape[1] != w.shape[0]:
            raise ValueError(
                f"feature vectors have dim {x.shape[1]} but the model "
                f"has {w.shape[0]} weights — embed with the model's "
                f"recorded dim (see save_classifier meta)")
        return pd.Series(_fast_sigmoid((x @ w).astype(np.float64) / denom))

    return _score


def score_with_weights(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    weights: "list[int]",
    scale: int = 1000,
    wscale: int = 1000,
) -> DataFrame:
    """Pure INFERENCE under trained quantized weights: ``(id_col,
    score, pred)`` for every row with a non-NULL feature vector —
    train once (:func:`train_linear_classifier`), filter any number of
    later corpora (the DCLM/FineWeb-style model-based quality gate).
    ``scale``/``wscale`` must be the training values (persisted by
    :func:`save_classifier`); scores on the training rows are
    bit-identical to the ``scored`` frame training returned (same
    quantization, same scoring UDF). Map-only Arrow stage: no shuffle,
    no driver traffic beyond the dim-sized weight closure."""
    if not weights:
        raise ValueError("weights must be non-empty")
    q = (df.where(F.col(vec_col).isNotNull())
         .select(F.col(id_col),
                 quantize_vec(F.col(vec_col), scale).alias("__qx")))
    return (q.select(
        id_col,
        _score_udf(list(weights), scale, wscale)(F.col("__qx"))
        .alias("score"))
        .withColumn("pred", (F.col("score") >= 0.5).cast("int")))


def save_classifier(weights: "list[int]", path: str, *,
                    scale: int = 1000, wscale: int = 1000,
                    meta: "dict | None" = None) -> None:
    """Persist trained weights + quantization grid (+ caller metadata,
    e.g. the feature recipe: embedding dim/n-gram order/seed/tokenizer)
    as one JSON file — like the LM model dirs, a plain format any
    consumer can read."""
    import json
    payload = {"model": "linear-quantized", "weights": list(weights),
               "scale": int(scale), "wscale": int(wscale),
               "meta": dict(meta or {})}
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)


def load_classifier(path: str) -> dict:
    """Inverse of :func:`save_classifier`; raises ValueError on a
    non-classifier file."""
    import json
    with open(path, encoding="utf-8") as fh:
        d = json.load(fh)
    if not isinstance(d, dict):
        raise ValueError(f"{path!r} is not a classifier file "
                         f"(JSON {type(d).__name__}, expected object)")
    if d.get("model") != "linear-quantized" or "weights" not in d:
        raise ValueError(f"{path!r} is not a linear-quantized "
                         f"classifier file (got: {list(d)})")
    w = d["weights"]
    if (not isinstance(w, list) or not w
            or not all(isinstance(v, (int, float)) and not isinstance(v, bool)
                       for v in w)):
        raise ValueError(
            f"{path!r}: 'weights' must be a non-empty list of numbers "
            f"(got {type(w).__name__}"
            f"{f' of {len(w)}' if isinstance(w, list) else ''})")
    for key in ("scale", "wscale"):
        if key in d and (not isinstance(d[key], int) or d[key] <= 0):
            raise ValueError(f"{path!r}: {key!r} must be a positive "
                             f"integer, got {d[key]!r}")
    return d


def classifier_gate_kwargs(model: dict, *,
                           min_score: float = 0.5,
                           fallback_tokenizer: "str | None" = None) -> dict:
    """Translate a :func:`load_classifier` payload into the
    ``curate_corpus`` classifier-gate kwargs, validating that the
    funnel can REPRODUCE the model's feature recipe (the gate
    hash-embeds text, so a model trained on other features — or an
    unrecorded hashing recipe — must be rejected, not silently
    mis-scored). Library-level so every caller gets the guard, not
    just the CLI (ADVICE r7)."""
    meta = model.get("meta", {}) or {}
    feats = meta.get("features", "hashed_ngram")
    if feats != "hashed_ngram":
        raise ValueError(
            f"trained on features the curate gate cannot reproduce "
            f"(features={feats!r}; the gate hash-embeds text) — train "
            f"with 's2s classify --text-col'")
    dim = meta.get("dim", len(model["weights"]))
    if dim != len(model["weights"]):
        raise ValueError(
            f"classifier meta records dim={dim} but the weight vector "
            f"has {len(model['weights'])} entries — corrupt model file")
    return {
        "classifier_weights": model["weights"],
        "min_classifier_score": min_score,
        "classifier_tokenizer": meta.get("tokenizer", fallback_tokenizer),
        "classifier_ngram": meta.get("n", 3),
        "classifier_seed": meta.get("seed", "emb"),
        "classifier_scale": model.get("scale", 1000),
        "classifier_wscale": model.get("wscale", 1000),
    }
