#!/usr/bin/env python3
"""Composed-funnel scale measurement (VERDICT r7 ask #3): run the full
corpus_funnel configuration (C4 -> Gopher -> annotate/filter -> exact
dedup -> jaccard near-dedup -> mix) on the sf0.1 DERIVED prose and on
10x/100x replications of it, with audit counts on, and time each stage
family standalone to name the dominant stage per decade.

Why not tools/scale_bench.py: its per-token copy suffix (which keeps the
dup RATE constant for dedup operators) destroys the linguistic
properties the funnel's English-specific stages key on — suffixed
stopwords fail the Gopher rule and the langid markers, so every copy
beyond the first dies at the filter and the composed run measures
nothing (observed: 10x -> 1 surviving row). Here the sentence/marker
DERIVATION runs first, then each copy suffixes only tokens of >= 5
chars — content words become copy-specific (cross-copy shingles still
never match at the 0.5 threshold) while stopwords, langid markers,
line structure and punctuation survive, so every copy flows through
every stage like the original.

Usage: python tools/funnel_scale.py [--factors 10,100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_BASE = "/root/testdata/sf0.1"


def derived_prose(spark, sf_dir: str):
    """The corpus_funnel entry's exact derivation (clone pages + C4/
    Gopher markers) over the documents table."""
    from pyspark.sql import functions as F

    from stream2segment_spark.queries_corpus import _FUNNEL_CLONE
    from stream2segment_spark.queries_text import (
        _C4_MARKERS, _GOPHER_MARKERS)
    from stream2segment_spark.schema import load_table
    docs = load_table(spark, sf_dir, "documents")
    prose = F.concat(
        F.replace(F.coalesce(F.col("text"), F.lit("")),
                  F.lit(" table "), F.lit(".\n")),
        F.lit("."),
        *[F.when(F.col("doc_id") % m == 0, F.lit("\n" + s)).otherwise("")
          for m, s in list(_C4_MARKERS) + list(_GOPHER_MARKERS)])
    t = F.when(F.col("doc_id") % 11 == 5, F.lit(_FUNNEL_CLONE)) \
         .otherwise(prose)
    return docs.select("doc_id", "source", t.alias("text"))


def replicate(spark, base, factor: int):
    """factor copies with disjoint ids; copies > 0 suffix every >= 5
    char token with the copy number (content words diverge, function
    words / punctuation / line structure survive)."""
    from pyspark.sql import functions as F
    n = base.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [base]
    for k in range(1, factor):
        parts.append(base.select(
            (F.col("doc_id") + k * n).alias("doc_id"),
            "source",
            F.regexp_replace("text", r"([a-z]{5,})", f"$1zz{k}")
             .alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_composed(spark, docs, mode: str = "jaccard") -> dict:
    from stream2segment_spark.examples.corpus_pipeline import curate_corpus
    persists: list = []
    t0 = time.time()
    curated, funnel = curate_corpus(
        docs, c4_rules=True, gopher_rules=True,
        languages=("en",), min_quality=0.6, token_band=(5, 100_000),
        neardup_mode=mode, neardup_threshold=0.5,
        mix_strata_col="source", mix_alpha=0.5,
        persists=persists, audit=True)
    n = curated.count()
    audit = funnel.collect()[0].asDict()
    sec = round(time.time() - t0, 2)
    for fr in persists:
        fr.unpersist()
    return {"sec": sec, "rows": n, "audit": audit}


def run_stages(spark, docs) -> dict:
    """Stage-family attribution: persist + count at each boundary with
    the same library operators the funnel composes."""
    from pyspark.sql import functions as F

    import stream2segment_spark.functions.text as TX
    from stream2segment_spark.operators import dedup as DD
    from stream2segment_spark.operators.graph import connected_components

    out, times = {}, {}

    def step(name, frame):
        t0 = time.time()
        frame = frame.persist()
        out[name] = frame.count()
        times[name] = round(time.time() - t0, 2)
        return frame

    sig = TX.c4_signals(docs, "doc_id", "text")
    cleaned = step("c4", docs.select("doc_id", "source").join(
        sig.filter(F.col("c4_keep"))
           .select("doc_id", F.col("cleaned_text").alias("text")),
        "doc_id"))
    gsig = TX.gopher_quality_signals(cleaned, "doc_id", "text")
    gdocs = step("gopher", cleaned.join(
        gsig.filter(F.col("gopher_keep")).select("doc_id"),
        "doc_id", "left_semi"))
    toks = DD.word_tokens(F.col("text"))
    staged = gdocs.select("doc_id", "source", "text",
                          toks.alias("__toks"))
    tk = F.col("__toks")
    ann = staged.select(
        "doc_id", "source", "text",
        TX.token_count(F.col("text"), toks=tk).alias("n_tokens"),
        TX.max_token_run(F.col("text"), toks=tk).alias("max_tok_run"),
        F.round(TX.quality_score(F.col("text"), toks=tk), 4)
         .alias("quality"),
        TX.langid_heuristic(F.col("text"), toks=tk).alias("lang"),
        TX.doc_fingerprint(F.col("text")).alias("fingerprint"))
    filtered = step("annotate_filter", ann.filter(
        F.col("lang").isin("en") & (F.col("quality") >= 0.6)
        & F.col("n_tokens").between(5, 100_000)
        & (F.col("max_tok_run") <= 0.2 * F.col("n_tokens"))))
    exact = step("exact_dedup", DD.exact_dedup(
        filtered, ["fingerprint"], keep="first", order=["doc_id"]))
    t0 = time.time()
    pairs = DD.ngram_jaccard_pairs(exact, "text", "doc_id", shingle_k=3,
                                   threshold=0.5)
    cc = connected_components(pairs, "id_a", "id_b")
    losers = (cc.filter(F.col("id") != F.col("cluster_id"))
              .select(F.col("id").alias("doc_id")))
    deduped = exact.join(losers, "doc_id", "left_anti").persist()
    out["near_dedup"] = deduped.count()
    times["near_dedup"] = round(time.time() - t0, 2)
    for fr in (cleaned, gdocs, filtered, exact, deduped):
        fr.unpersist()
    return {"counts": out, "times": times}


def run_incremental(spark, base, factors: list[int]) -> dict:
    """Incremental-batch scale rows (VERDICT r8 ask #1 'done'
    criterion): curate an existing corpus at 1x and each factor ONCE
    (prep, untimed), persist curated+signatures to parquet, then time
    curating a FIXED 1x new batch against each. If the batch cost
    tracks |new| — the point of the new-side band predicate, the
    candidate-restricted verify and the persisted signature table —
    the timed column stays near-flat across old-corpus decades, while
    the full-rerun column grows with |old|. Three timings per factor:

    - incr_sigs_sec:   against= + against_signatures= (the scale path)
    - incr_resign_sec: against= only (old re-signed map-only per batch)
    - full_rerun_sec:  curate_corpus(old ∪ new) from scratch

    The new batch exercises all three drop paths: exact dups of the
    old clone pages (fingerprint anti-join), near-dups (original text
    + a short tail -> J >> 0.5, verify + old-wins), and content-
    divergent survivors."""
    from pyspark.sql import functions as F

    from stream2segment_spark.examples.corpus_pipeline import curate_corpus
    cfg = dict(languages=("en",), min_quality=0.6,
               token_band=(5, 100_000), max_top_token_frac=0.2,
               neardup_mode="minhash", neardup_threshold=0.5)
    top = base.agg(F.max("doc_id")).collect()[0][0] + 1
    max_f = max([1, *factors])
    # fixed 1x new batch, ids beyond every old corpus
    shift = top * (max_f + 1)
    new_batch = base.select(
        (F.col("doc_id") + shift).alias("doc_id"),
        F.when(F.col("doc_id") % 11 == 5, F.col("text"))       # exact dup
         .when(F.col("doc_id") % 7 == 3,                       # near dup
               F.concat(F.col("text"),
                        F.lit(" with a short appended tail sentence")))
         .otherwise(F.regexp_replace("text", r"([a-z]{5,})", "$1zznew"))
         .alias("text")).persist()
    new_batch.count()
    report: dict = {}
    for f in [1, *factors]:
        old_path = f"/tmp/s2s_incr_old{f}"
        if f == 1:
            old_docs = base
        else:
            replicate(spark, base, f).select("doc_id", "text") \
                .write.mode("overwrite").parquet(old_path + "_docs")
            old_docs = spark.read.parquet(old_path + "_docs")
        sigs: list = []
        curated, _ = curate_corpus(old_docs.select("doc_id", "text"),
                                   signatures=sigs, **cfg)
        curated.select("doc_id", "text", "fingerprint") \
            .write.mode("overwrite").parquet(f"{old_path}_curated")
        old_curated = spark.read.parquet(f"{old_path}_curated")
        sigs[0].join(old_curated.select("doc_id"), "doc_id",
                     "left_semi") \
            .write.mode("overwrite").parquet(f"{old_path}_sigs")
        old_sigs = spark.read.parquet(f"{old_path}_sigs")
        row = {"old_rows": old_curated.count()}

        def timed(key, **kw):
            persists: list = []
            t0 = time.time()
            inc, _ = curate_corpus(new_batch, persists=persists, **kw)
            row[key.replace("_sec", "_rows")] = inc.count()
            row[key] = round(time.time() - t0, 2)
            for fr in persists:
                fr.unpersist()

        timed("incr_sigs_sec", against=old_curated,
              against_signatures=old_sigs, **cfg)
        timed("incr_resign_sec", against=old_curated, **cfg)
        persists: list = []
        t0 = time.time()
        full, _ = curate_corpus(
            old_docs.select("doc_id", "text").unionByName(new_batch),
            persists=persists, **cfg)
        row["full_rerun_rows"] = full.filter(
            F.col("doc_id") >= shift).count()
        row["full_rerun_sec"] = round(time.time() - t0, 2)
        for fr in persists:
            fr.unpersist()
        report[str(f)] = row
        print(f"# old={f}x {row}", flush=True)
    new_batch.unpersist()
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--incremental", action="store_true",
                    help="measure the incremental batch (against=) "
                         "scale rows instead of the composed decades")
    ap.add_argument("--modes", default="jaccard,minhash,stages",
                    help="comma subset of jaccard,minhash,stages — "
                         "refresh only the columns whose code changed")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",") if x]
    modes = set(args.modes.split(","))

    from stream2segment_spark.session import get_spark
    spark = get_spark(app_name="funnel-scale")
    base = derived_prose(spark, SF_BASE).persist()
    base.count()

    if args.incremental:
        report = run_incremental(spark, base, factors)
        print(json.dumps(report, indent=1))
        spark.stop()
        return 0

    def _decade(docs, label):
        out = {}
        if "jaccard" in modes:
            out["composed"] = run_composed(spark, docs)
            print(f"# {label} composed: {out['composed']}", flush=True)
        if "minhash" in modes:
            out["composed_minhash"] = run_composed(spark, docs,
                                                   "minhash")
            print(f"# {label} minhash: "
                  f"{out['composed_minhash']['sec']}s", flush=True)
        if "stages" in modes:
            out["stages"] = run_stages(spark, docs)
            print(f"# {label} stages: {out['stages']['times']}",
                  flush=True)
        return out

    report = {"1": _decade(base, "1x")}
    for f in factors:
        # materialize the replication through parquet: the f-way union
        # of regexp_replace branches is a fine EXECUTION plan but its
        # lineage STRING grows ~f x per downstream checkpoint — at 100x
        # connected_components' localCheckpoint dies building a > 1 GiB
        # UTF16 tree string. A parquet round-trip truncates lineage to
        # a plain scan (and is how a real 100 TB corpus would arrive
        # anyway).
        path = f"/tmp/s2s_funnel_scale{f}"
        replicate(spark, base, f).write.mode("overwrite").parquet(path)
        scaled = spark.read.parquet(path)
        report[str(f)] = _decade(scaled, f"{f}x")
    import math
    for key in ("composed", "composed_minhash"):
        if key not in report["1"]:
            continue
        t1 = report["1"][key]["sec"]
        for f in factors:
            tf = report[str(f)][key]["sec"]
            report[str(f)][f"alpha_{key}"] = round(
                math.log(max(tf, 1e-3) / max(t1, 1e-3)) / math.log(f), 2)
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
