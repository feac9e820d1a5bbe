"""End-to-end training-corpus curation pipeline composed from the
engine's gate-checked operators — the documents-table analogue of the
reference's download->select->process chain, shaped like the published
large-corpus pipelines (C4/Gopher-style filtering, fuzzy dedup, frozen
splits):

1. annotate  — language-ID, quality score, token counts, repetition
   signals, content fingerprint (one tokenizer pass, staged columns);
2. filter    — language allowlist, quality floor, token-count band,
   repetition caps (all plain predicates in the scan stage);
3. exact dedup — keep the lowest doc_id per content fingerprint;
4. near-dedup — MinHash/LSH candidates verified by exact shingle
   Jaccard, clustered with connected components, keep one canonical doc
   (min id) per cluster (``neardup_mode``: 'minhash' / exact 'jaccard'
   / 'cosine' / 'semantic' / asymmetric 'containment' — the last drops
   excerpts contained in a larger peer, no cluster pass);
5. split     — deterministic md5-bucket train/val/test assignment.

Optional stages (off by default, enabled by their parameters):

0a. C4 cleaning — ``c4_rules``: Raffel et al. 2020 §2.2 heuristics
   FIRST (line-level terminal-punctuation / min-words / javascript
   rules; page-level lorem-ipsum / brace / blocklist drop) so every
   cross-document stage below sees prose only;
0a2. Gopher rules — ``gopher_rules``: Rae et al. 2021 table-A1
   document-quality drop (word-count band, mean word length, symbol/
   bullet/ellipsis shape, alpha-word fraction, stopword presence);
0a3. Gopher repetition — ``gopher_repetition``: the paper's eleven
   repetition caps (top-n-gram char fraction, dup-n-gram coverage,
   dup-line fractions) over functions/text.repetition_signals;
0. line dedup   — ``line_max_df``: CCNet-style cross-document
   boilerplate-line removal BEFORE annotation (so quality scoring sees
   the cleaned text);
0b. substring removal — ``cut_dup_substrings``: CUT every cross-
   document duplicated run of >= K tokens from every document
   (ExactSubstr removal, operators/dedup.cut_duplicated_spans);
2b. substring cut — ``max_dup_frac``: drop documents whose duplicated-
   substring fraction (8-token windows shared with other docs, merged
   spans — operators/dedup.duplicated_spans) exceeds the threshold;
2d. decontamination — ``benchmark``: drop survivors whose 5-shingle
   contamination fraction vs the eval set exceeds ``max_contam_frac``;
2f. classifier gate — ``classifier_weights``: hash-embed survivors and
   score under TRAINED quantized weights (operators/classifier), drop
   below ``min_classifier_score`` (the DCLM/FineWeb model-based gate);
0a0. HTML extraction — ``html_extract``: functions/text.html_to_text
   before everything else (raw-web ingest);
4c. DSIR selection — ``dsir_target`` + ``dsir_k``: keep the top-k
   survivors by hashed-n-gram importance toward the target corpus's
   profile (functions/dsir — model-free in-domain selection);
5b. temperature mix — ``mix_strata_col``: rebalance kept counts to
   n^alpha per stratum (deterministic md5 thresholds);
6. packing      — ``pack_budget``: greedy md5-sharded start-offset
   packing into fixed-token-budget training chunks (adds shard/chunk_id
   columns); ``pack_mode='bestfit'`` swaps in best-fit-decreasing bins
   that never exceed the budget (bin_id column).

Every stage is a DataFrame -> DataFrame transform: at 100 TB stages 1-2
fuse into the parquet scan, stage 3 is one hash-partitioned groupBy,
stage 4 shuffles only band buckets + candidate pairs (never all pairs),
stage 5 is map-only. Returns the curated frame plus a one-row funnel
audit (docs surviving each stage) computed in a single aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    c4_rules: bool = False,
    gopher_rules: "bool | str" = False,
    gopher_repetition: bool = False,
    min_quality: float = 0.7,
    token_band: tuple[int, int] = (20, 100_000),
    max_top_token_frac: float = 0.2,
    neardup_threshold: float | None = None,
    neardup_mode: str = "minhash",
    neardup_keep: str = "first",
    semantic_k: int | None = None,
    domain_cap: int | None = None,
    domain_col: str = "source",
    split_fractions: dict[str, float] | None = None,
    line_max_df: int | None = None,
    max_dup_frac: float | None = None,
    min_lm_score: float | None = None,
    benchmark: DataFrame | None = None,
    max_contam_frac: float = 0.0,
    cut_dup_substrings: int | None = None,
    mix_strata_col: str | None = None,
    mix_alpha: float = 0.5,
    pack_budget: int | None = None,
    pack_shards: int = 64,
    pack_mode: str = "greedy",
    persists: list | None = None,
    tokenizer: str = "ascii",
    langid_mode: str = "heuristic",
    stopword_tables: "dict[str, tuple[str, ...]] | None" = None,
    html_extract: bool = False,
    nfc_normalize: bool = False,
    classifier_weights: "list[int] | None" = None,
    min_classifier_score: float = 0.5,
    classifier_tokenizer: "str | None" = None,
    classifier_ngram: int = 3,
    classifier_seed: str = "emb",
    classifier_scale: int = 1000,
    classifier_wscale: int = 1000,
    against: DataFrame | None = None,
    against_signatures: DataFrame | None = None,
    signatures: list | None = None,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 4096,
    audit: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Run the 5-stage curation funnel; returns (curated, funnel) where
    ``curated`` has the annotation columns + ``split`` and ``funnel`` is
    one row of per-stage survivor counts. Optional stages (module
    docstring) switch on via ``line_max_df`` / ``mix_strata_col`` /
    ``pack_budget``. ``audit=True`` appends one ``after_<stage>`` count
    column per ENABLED optional stage to the funnel row (which filter
    dropped what — the first question when a funnel comes back empty);
    opt-in because each audit count re-runs that stage's lineage.

    Intermediate frames shared by several downstream consumers are
    ``persist()``-ed; pass a list as ``persists`` to receive them so the
    caller can ``unpersist()`` once ``curated``/``funnel`` have been
    materialized (cmd_curate does; without it the caches live until the
    session ends).

    Incremental mode (``against=``): ``against_signatures`` optionally
    supplies the existing corpus's persisted MinHash signature table
    (``id_col``, ``minhash array<bigint>``; written by a previous
    ``cmd_curate --write-signatures`` run) so the existing corpus is
    NEVER re-tokenized — only its band keys are recomputed from the
    stored signatures (map-only over id+64 longs/doc, no text scan).
    Pass a list as ``signatures`` to receive the (id, minhash) frame
    computed for the NEW docs this run (minhash mode only) — semi-join
    it to the curated survivors and union with the old table to chain
    the next batch."""
    import stream2segment_spark.functions.text as TX
    from stream2segment_spark.functions.plan import opt_barrier
    from stream2segment_spark.functions.sampling import (
        split_column, temperature_sample)
    from stream2segment_spark.operators import dedup as DD
    from stream2segment_spark.operators.graph import connected_components

    if neardup_keep not in ("first", "best"):
        raise ValueError(f"neardup_keep must be 'first' or 'best', "
                         f"got {neardup_keep!r}")
    if langid_mode not in ("heuristic", "script"):
        raise ValueError(f"langid_mode must be 'heuristic' or 'script', "
                         f"got {langid_mode!r}")
    # every token-derived stage below tokenizes with this mode;
    # tokenizer='unicode' + langid_mode='script' makes the funnel
    # multilingual: languages=('en', 'ja', ...) can then actually match,
    # token counts/budgets count CJK tokens, fingerprints and near-dup
    # shingles distinguish non-ASCII documents. The C4/Gopher rule
    # stages stay English-specific BY DESIGN (their stopword lists and
    # prose heuristics are English — Raffel/Rae rules); run them only
    # on the corpus's English slice.
    tok_expr, _ = DD.get_tokenizer(tokenizer)
    # columns that must survive every text-rewriting stage: the mix
    # stratum and (when capping) the domain column
    carry = [c for c in dict.fromkeys(
        (mix_strata_col, domain_col if domain_cap is not None else None))
        if c]

    input_docs = docs  # funnel's 'input' counts pre-cleaning rows
    # audit=True: record each OPTIONAL stage's survivor frame so the
    # funnel row gains one count column per enabled stage (which filter
    # is doing the dropping — the first question when a funnel comes
    # back empty). Counting re-runs that stage's lineage: an opt-in
    # diagnostic cost, not the production default.
    audit_counts: "list[tuple[str, DataFrame]]" = []

    def _audit(name: str, frame: DataFrame) -> None:
        if audit:
            audit_counts.append((name, frame))

    # -- 0a-1. optional Unicode NFC normalization (multilingual input) --
    # THE first text transformation when enabled: composed and
    # decomposed twins must converge before ANY comparison surface
    # (fingerprints, shingles, BM25/LM tokens) sees the text — the
    # standard first step of the multilingual pipelines this funnel
    # models (CCNet/mC4). Arrow map-only stage (functions/unicode_norm);
    # off by default: the ascii tokenizer strips non-ASCII anyway, so
    # it only matters with tokenizer='unicode'/'cjk'.
    if nfc_normalize:
        from stream2segment_spark.functions.unicode_norm import (
            normalize_nfc)
        docs = docs.withColumn(text_col, normalize_nfc(F.col(text_col)))

    # -- 0a0. optional HTML -> text extraction (raw-web ingest) ---------
    # FIRST of all: every downstream signal (tokens, prose rules,
    # shingles, LM) must see extracted text, never markup. Map-only
    # codegen'd regex passes (functions/text.html_to_text).
    if html_extract:
        docs = docs.withColumn(text_col,
                               TX.html_to_text(F.col(text_col)))

    # -- 0a. optional C4 heuristic cleaning (Raffel et al. 2020 §2.2) ---
    # raw-page cleaning FIRST: drop non-prose lines (terminal punct, >=5
    # words, no javascript) and whole lorem-ipsum/brace/blocklist pages,
    # so the cross-document stages below see prose only. Map-only.
    if c4_rules:
        # filter the signals frame INLINE (keep_cols carries the strata
        # through) instead of joining it back to docs on id: the join
        # form re-evaluated the whole upstream lineage once per branch
        # (Catalyst shares no subplans across join inputs), compounding
        # exponentially as optional stages chain — measured as the
        # dominant cost of the composed funnel at sf0.1 (r9 opt round).
        # Identical rows/columns: the signals frame is 1:1 with docs and
        # the old join was an inner equi-join on the unique id.
        sig = TX.c4_signals(docs, id_col, text_col,
                            keep_cols=tuple(carry))
        # opt_barrier on the stage output (r10 opt round): without it,
        # predicate pushdown substitutes cleaned_text's DEFINING
        # expression into every downstream reference (Gopher stages
        # reference the stage text 6+ times) and the composed chain
        # re-derives the C4 line filter up to 40x in one plan —
        # functions/plan.py has the measured plan diff.
        docs = (sig.filter(F.col("c4_keep"))
                .select(id_col, *carry,
                        opt_barrier(F.col("cleaned_text"))
                        .alias(text_col)))
        _audit("c4", docs)

    # -- 0a2. optional Gopher doc-quality rules (Rae et al. 2021 A1.1) --
    # document-level drop only (no text rewriting): word-count band,
    # mean word length, symbol/bullet/ellipsis shape, alpha-word
    # fraction, stopword presence. Map-only semi-join predicate.
    # gopher_rules="multilang" (VERDICT r8 ask #5) swaps in the
    # language-split rule profiles (functions/text.GOPHER_PROFILES):
    # word-token scripts keep the paper's word bounds, space-free
    # scripts are judged on codepoint-bigram units with per-language
    # stopword tables — still map-only (langid is a staged per-row
    # expression; it runs again in the annotate stage below, an
    # accepted duplicate map pass to keep each stage self-contained).
    if gopher_rules:
        # same linear-lineage shape as the C4 stage: the old left-semi
        # join against a frame DERIVED from docs recomputed the whole
        # upstream (including the C4 stage) once per branch; filtering
        # the signals frame inline with text/strata carried through is
        # one pass. Downstream only ever reads (id, strata, text), so
        # dropping other input columns here changes nothing.
        gkeep = (text_col, *carry)
        if gopher_rules == "multilang":
            gsig = TX.gopher_quality_signals_by_lang(
                docs, id_col, text_col, tables=stopword_tables,
                keep_cols=gkeep)
        else:
            gsig = TX.gopher_quality_signals(docs, id_col, text_col,
                                             keep_cols=gkeep)
        docs = (gsig.filter(F.col("gopher_keep"))
                .select(id_col, *carry, text_col))
        _audit("gopher", docs)

    # -- 0a3. optional Gopher repetition caps (Rae et al. table A1) -----
    # the paper's thresholds: top-{2,3,4}-gram char fraction <=
    # .20/.18/.16, dup-{5..10}-gram coverage <= .15/.14/.13/.12/.11/.10,
    # dup-line fraction <= .30, dup-line char fraction <= .20. One
    # map-only Arrow stage + a semi join back (no text rewriting).
    if gopher_repetition:
        caps = dict(zip(
            ("top_2gram_frac", "top_3gram_frac", "top_4gram_frac",
             "dup_5gram_frac", "dup_6gram_frac", "dup_7gram_frac",
             "dup_8gram_frac", "dup_9gram_frac", "dup_10gram_frac",
             "dup_line_frac", "dup_line_char_frac"),
            (0.20, 0.18, 0.16, 0.15, 0.14, 0.13, 0.12, 0.11, 0.10,
             0.30, 0.20)))
        rep = TX.repetition_signals(docs, text_col, id_col)
        cond = None
        for col, cap in caps.items():
            c = F.col(col) <= cap
            cond = c if cond is None else (cond & c)
        docs = docs.join(rep.filter(cond).select(id_col),
                         id_col, "left_semi")
        _audit("gopher_rep", docs)

    # -- 0. optional line-level boilerplate removal ---------------------
    if line_max_df is not None:
        strata_keep = carry
        cleaned = DD.line_dedup(
            docs.withColumn("__lines", F.split(
                F.coalesce(text_col, F.lit("")), "\n")),
            id_col, "__lines", max_df=line_max_df)
        docs = (docs.select(id_col, *strata_keep)
                .join(cleaned.select(id_col, F.col("cleaned_text")
                                     .alias(text_col)), id_col))
        _audit("line_dedup", docs)

    # -- 0b. optional exact substring REMOVAL (Lee et al. ExactSubstr):
    # cut every cross-document duplicated run of >= cut_dup_substrings
    # tokens from every document BEFORE annotation, so token counts and
    # quality reflect the cleaned text. NB: the cleaned text is the
    # normalized token sequence rejoined by spaces (casing/punctuation
    # normalized away, like every token-level stage here).
    if cut_dup_substrings is not None:
        strata_keep = carry
        cut = DD.cut_duplicated_spans(
            docs.select(id_col,
                        tok_expr(F.col(text_col)).alias("__ct")),
            id_col, "__ct", k=cut_dup_substrings)
        docs = (docs.select(id_col, *strata_keep)
                .join(cut.select(id_col, F.col("cleaned_text")
                                 .alias(text_col)), id_col))

    # -- 1. annotate (single tokenizer pass; see functions/text.py) -----
    extra = carry
    # opt_barrier (r10): the stage-2 filter below references quality /
    # n_tokens / max_tok_run / lang, all folds over __toks — pushdown
    # would substitute the tokenizer expression into the pushed
    # condition (4 copies) and keep walking it down through the C4 /
    # Gopher stage projections (see functions/plan.py).
    staged = docs.select(
        id_col, text_col, *extra,
        opt_barrier(tok_expr(F.col(text_col))).alias("__toks"))
    toks = F.col("__toks")
    lang_expr = (TX.langid_script(F.col(text_col), toks=toks)
                 if langid_mode == "script"
                 else TX.langid_heuristic(F.col(text_col), toks=toks))
    # stopword_tables: langid-keyed quality floor (VERDICT r7 ask #4) —
    # the stopword term of quality_score selects the ROW's language
    # table instead of the English default, so non-English survivors
    # are no longer penalized for lacking English function words. The
    # lang column is STAGED first: the keyed ratio's per-language CASE
    # references it once per branch, so inlining the (already large)
    # langid expression into each branch would square the expression
    # tree — Catalyst's canonicalizer stack-overflows on it (found by
    # the integration test).
    sw_expr = None
    if stopword_tables is not None:
        staged = staged.select(id_col, text_col, *extra, "__toks",
                               lang_expr.alias("__lang"))
        lang_expr = F.col("__lang")
        sw_expr = TX.stopword_ratio_by_lang(
            F.col(text_col), lang_expr, stopword_tables, toks=toks)
    ann = staged.select(
        id_col, text_col, *extra,
        TX.token_count(F.col(text_col), toks=toks).alias("n_tokens"),
        TX.max_token_run(F.col(text_col), toks=toks).alias("max_tok_run"),
        F.round(TX.quality_score(F.col(text_col), toks=toks, sw=sw_expr),
                4).alias("quality"),
        lang_expr.alias("lang"),
        TX.doc_fingerprint(F.col(text_col), tokenizer=tokenizer)
        .alias("fingerprint"))

    # -- 2. filter ------------------------------------------------------
    # opt_barrier on the CONDITION (r10): a deterministic condition
    # referencing the annotate columns is pushed below ann's projection
    # with the quality/lang/run-fold expressions substituted in — every
    # row then pays the folds once for the pushed condition and
    # survivors once more in the projection. Non-pushable, the filter
    # reads ann's outputs as attributes: one evaluation per row total.
    lo, hi = token_band
    filtered = ann.filter(opt_barrier(
        F.col("lang").isin(*languages)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(lo, hi)
        & (F.col("max_tok_run") <= max_top_token_frac * F.col("n_tokens"))))

    # -- 2b. optional substring-duplication cut -------------------------
    if max_dup_frac is not None:
        spans = DD.duplicated_spans(
            filtered.select(id_col,
                            tok_expr(F.col(text_col)).alias("__t")),
            id_col, "__t", k=8, max_df=1)
        keep = spans.filter(F.col("dup_frac") <= max_dup_frac) \
                    .select(id_col)
        filtered = filtered.join(keep, id_col, "left_semi")
        _audit("dup_frac", filtered)

    # -- 2c. optional LM fluency floor (functions/lm.py) ----------------
    # the bigram model trains on the ALREADY language/quality-filtered
    # survivors so junk the earlier stages remove cannot poison the
    # counts; survivors below the mean-transition-probability floor drop
    if min_lm_score is not None:
        from stream2segment_spark.functions.lm import lm_transition_scores
        scores = lm_transition_scores(
            filtered.select(id_col, text_col), id_col, text_col,
            tokenizer=tokenizer)
        fluent = scores.filter(F.col("lm_score") >= min_lm_score) \
                       .select(id_col)
        filtered = filtered.join(fluent, id_col, "left_semi")
        _audit("lm", filtered)

    # -- 2f. optional model-based quality floor --------------------------
    # the DCLM/FineWeb-style gate: hash-embed the survivors with the
    # funnel's token mode, score under TRAINED quantized weights
    # (operators/classifier.score_with_weights — train elsewhere, e.g.
    # curated-vs-raw pseudo-labels via s2s classify --weights-out), drop
    # below the floor. dim comes from the weight vector, so features
    # always match the model. Map-only Arrow stage + one semi join.
    if classifier_weights is not None:
        from stream2segment_spark.functions.embeddings import (
            hashed_ngram_embeddings)
        from stream2segment_spark.operators.classifier import (
            score_with_weights)
        # features must be embedded with the MODEL's full recipe —
        # token mode AND n-gram order AND hash seed, not necessarily
        # the funnel's / the embedding defaults (any recipe mismatch
        # makes grams hash to different buckets than training saw —
        # the silent-mis-score class the LM fixed in r7; n/seed
        # threading per ADVICE r7 — use operators/classifier.
        # classifier_gate_kwargs to derive all of these from a saved
        # model file with the recipe guard applied); None = funnel mode
        emb = hashed_ngram_embeddings(
            filtered.select(id_col, text_col), text_col, id_col,
            dim=len(classifier_weights),
            n=classifier_ngram, seed=classifier_seed,
            tokenizer=classifier_tokenizer or tokenizer)
        good = (score_with_weights(emb, id_col, "embedding",
                                   classifier_weights,
                                   scale=classifier_scale,
                                   wscale=classifier_wscale)
                .filter(F.col("score") >= min_classifier_score)
                .select(id_col))
        filtered = filtered.join(good, id_col, "left_semi")
        _audit("classifier", filtered)

    # -- 2d. optional benchmark decontamination -------------------------
    # drop survivors whose distinct 5-shingle contamination fraction vs
    # the eval ``benchmark`` exceeds ``max_contam_frac`` (default 0: any
    # overlap disqualifies). Broadcast probe + one keyed count shuffle.
    if benchmark is not None:
        contam = DD.contamination_fractions(
            filtered.select(id_col, text_col), benchmark,
            id_col=id_col, text_col=text_col, tokenizer=tokenizer)
        clean = contam.filter(F.col("contam_frac") <= max_contam_frac) \
                      .select(id_col)
        filtered = filtered.join(clean, id_col, "left_semi")
        _audit("decontam", filtered)

    # -- 2e. optional per-domain cap (anti-spam: no single domain may
    # dominate) — deterministic md5-order keep, folded into the funnel's
    # 'filtered' count. One domain-keyed shuffle.
    if domain_cap is not None:
        from stream2segment_spark.functions.sampling import cap_per_group
        filtered = cap_per_group(filtered, domain_col, domain_cap,
                                 id_col=id_col)
        _audit("domain_cap", filtered)

    # -- 3. exact dedup (keep lowest id per fingerprint) ----------------
    exact = DD.exact_dedup(filtered, ["fingerprint"], keep="first",
                           order=[id_col])

    # -- 3b. incremental mode: dedup NEW docs against an existing
    # curated corpus (VERDICT r7 ask #6 — the batch analogue of the
    # streaming LSH-vs-history near-dedup in streaming/corpus.py, and
    # the corpus-scale shape of the reference's append/diff semantics:
    # K3 append anti-join in sinks/writers.py, J5 prepare_for_download
    # in operators/joins.py). ``against`` is the PREVIOUSLY CURATED
    # corpus (its survivors are pairwise non-near-dup by construction);
    # new docs drop when (a) their fingerprint already exists
    # (exact anti-join — one keyed shuffle against the existing
    # fingerprint set) or (b) they near-dup an existing doc (candidate
    # pairs over existing + new, existing docs ALWAYS win their
    # clusters; new-only clusters keep the min new id). When the
    # existing corpus carries a 'fingerprint' column it is reused;
    # otherwise it is recomputed map-only with the funnel's tokenizer.
    # Likewise ``against_signatures`` reuses the persisted MinHash
    # table so the old corpus's text is only ever read for the handful
    # of candidate-touched docs in the verify stage.
    # Equals a full-corpus rerun restricted to the new ids whenever
    # existing ids precede new ids and no new doc links to a DROPPED
    # old doc without also linking to its surviving canonical (gated:
    # corpus_funnel_incremental). Ids must be disjoint across the two
    # frames.
    if against is not None:
        if neardup_mode not in ("minhash", "jaccard"):
            raise ValueError(
                f"against= supports neardup_mode 'minhash'/'jaccard', "
                f"got {neardup_mode!r}")
        if neardup_keep != "first":
            raise ValueError("against= supports neardup_keep='first' "
                             "(existing docs always win their clusters)")
        old = against.select(
            F.col(id_col), F.col(text_col),
            (F.col("fingerprint") if "fingerprint" in against.columns
             else TX.doc_fingerprint(F.col(text_col), tokenizer=tokenizer)
             ).alias("fingerprint"))
        # ids MUST be disjoint across the two frames: the old-wins keep
        # rule below is keyed on id, so a new doc reusing an existing id
        # would be classified as old and could never drop. Fail loudly
        # (one keyed semi-join + LocalLimit, same shape as the
        # fingerprint anti-join that follows) instead of silently
        # corrupting the dedup guarantee.
        # Persist BEFORE the eager check (r9 opt round): the check
        # materializes the new batch's full annotate->filter->window
        # lineage anyway — un-cached, that work was thrown away and
        # recomputed by every later consumer (anti-join, signatures,
        # verify). The cache is new-batch-sized.
        exact = exact.persist()
        if persists is not None:
            persists.append(exact)
        if (exact.select(id_col)
                .join(old.select(id_col), id_col, "left_semi")
                .limit(1).count()):
            raise ValueError(
                f"against= requires {id_col!r} values disjoint from the "
                "existing corpus: at least one new document reuses an "
                "existing id (the old-wins keep rule is id-keyed and "
                "would silently treat it as already curated)")
        exact = exact.join(old.select("fingerprint").distinct(),
                           "fingerprint", "left_anti")

    # -- 4. near-dedup: candidates -> verify -> CC ----------------------
    # 'minhash': MinHash/LSH candidates verified by exact shingle Jaccard
    # (lexical). 'cosine': hashing-trick embeddings -> hyperplane-LSH
    # (Hamming-1 multi-probe) verified by exact cosine (the brief's
    # embedding-cosine near-dup; catches reorderings Jaccard-on-shingles
    # scores lower). Both: cluster with CC, keep min-id per cluster.
    # 'semantic': SemDeDup — k-means clusters + within-cluster keep-first
    # (no pair graph; bounded pair work O(Σ n_c²) instead of LSH recall).
    # The default threshold is MODE-SPECIFIC: the two scores live on
    # different scales — unrelated documents sit near Jaccard ~0 but
    # hashed-3-gram cosine ~0.7-0.8 (same-language base rate), so a
    # Jaccard-tuned 0.7 under cosine would mass-delete non-duplicates.
    # 'semantic' shares the cosine scale (hashed-3-gram base rate ~0.7-0.8
    # for unrelated same-language docs)
    if neardup_threshold is None:
        neardup_threshold = (0.95 if neardup_mode in ("cosine", "semantic")
                             else 0.8 if neardup_mode == "containment"
                             else 0.7)
    exact = exact.persist()  # feeds signature build, verify AND anti-join
    if persists is not None:
        persists.append(exact)
    if against is not None:
        # candidates over existing + new; only NEW docs can lose.
        # Scale shape (minhash mode): batch cost tracks |new|, not
        # |old| —
        #   * the existing corpus is never re-tokenized when
        #     ``against_signatures`` supplies its persisted signature
        #     table (band keys recompute from id + 64 longs/doc);
        #   * the band join REQUIRES >= 1 new side structurally
        #     (streaming/corpus.py's __new-flag predicate), so old-old
        #     bucket pairs — which boilerplate guarantees at scale —
        #     never materialize as candidates, let alone reach verify;
        #   * the exact-Jaccard verify tokenizes only candidate-touched
        #     docs (semi-join on candidate ids), i.e. O(candidates)
        #     text, not O(corpus).
        # Old survivors are pairwise non-near-dup by construction, so
        # skipping old-old pairs cannot change the verified pair set —
        # the full-rerun equivalence gate (corpus_funnel_incremental,
        # corpus_funnel_incr_sigs) still holds.
        combined = (exact.select(F.col(id_col), F.col(text_col))
                    .unionByName(old.select(F.col(id_col),
                                            F.col(text_col))))
        if neardup_mode == "minhash":
            sigs_new = DD.add_minhash_maponly(
                exact, text_col, id_col, num_hashes=64, shingle_k=3,
                tokenizer=tokenizer)
            if signatures is not None:
                signatures.append(sigs_new)
            if against_signatures is not None:
                sigs_old = against_signatures.select(
                    F.col(id_col), F.col("minhash"))
            else:
                sigs_old = DD.add_minhash_maponly(
                    old, text_col, id_col, num_hashes=64, shingle_k=3,
                    tokenizer=tokenizer)
            keys = (DD.lsh_band_keys(sigs_new, id_col, num_hashes=64,
                                     bands=32)
                    .withColumn("__new", F.lit(True))
                    .unionByName(
                        DD.lsh_band_keys(sigs_old, id_col, num_hashes=64,
                                         bands=32)
                        .withColumn("__new", F.lit(False))))
            a, b = keys.alias("a"), keys.alias("b")
            # candidate = same band bucket, RIGHT side new; order the
            # pair so the kept doc is the older / lower one (old docs
            # win their clusters, then lower id within the batch) —
            # old-old pairs are excluded by the predicate, not filtered
            # after the fact
            cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                            & (F.col("a.key") == F.col("b.key"))
                            & F.col("b.__new")
                            & (~F.col("a.__new")
                               | (F.col(f"a.{id_col}")
                                  < F.col(f"b.{id_col}"))))
                     .select(F.col(f"a.{id_col}").alias("id_a"),
                             F.col(f"b.{id_col}").alias("id_b"))
                     .distinct())
            # ngram_jaccard_pairs restricts the verify-side tokenize to
            # candidate-touched ids itself (and persists cands)
            pairs = DD.ngram_jaccard_pairs(
                combined, text_col, id_col, shingle_k=3,
                threshold=neardup_threshold, candidates=cands,
                persists=persists, tokenizer=tokenizer)
        else:
            # exact mode: no signatures exist, so finding old<->new
            # overlaps inherently shingles the old corpus too —
            # fixture-exact path, O(|old|+|new|) per batch; 'minhash'
            # is the scale path. Candidate pairs are pruned to >= 1
            # new side BEFORE the exact verify (new_ids= — r9 opt
            # round): old-old pairs can only merge clusters that each
            # already hold an old member, so they never change which
            # new docs drop, and skipping them keeps the VERIFY work
            # off the existing corpus's internal collision structure.
            pairs = DD.ngram_jaccard_pairs(combined, text_col, id_col,
                                           shingle_k=3,
                                           threshold=neardup_threshold,
                                           persists=persists,
                                           tokenizer=tokenizer,
                                           new_ids=exact.select(id_col))
        cc = connected_components(pairs, "id_a", "id_b")
        old_ids = old.select(F.col(id_col).alias("id"))
        # clusters with an existing member: every new member drops;
        # new-only clusters: keep the min new id (== cluster_id)
        has_old = cc.join(old_ids, "id", "left_semi") \
                    .select("cluster_id").distinct()
        new_members = cc.join(old_ids, "id", "left_anti")
        losers = (new_members.join(has_old, "cluster_id", "left_semi")
                  .select("id")
                  .union(new_members
                         .join(has_old, "cluster_id", "left_anti")
                         .filter(F.col("id") != F.col("cluster_id"))
                         .select("id"))
                  ).select(F.col("id").alias(id_col))
        pairs = None   # losers already decided (old-wins keep rule)
    elif neardup_mode == "minhash":
        sigs = DD.add_minhash_maponly(exact, text_col, id_col,
                                      num_hashes=64, shingle_k=3,
                                      tokenizer=tokenizer)
        if signatures is not None:
            signatures.append(sigs)
        cands = DD.lsh_candidate_pairs(sigs, id_col, num_hashes=64,
                                       bands=32)
        pairs = DD.ngram_jaccard_pairs(exact, text_col, id_col,
                                       shingle_k=3,
                                       threshold=neardup_threshold,
                                       candidates=cands,
                                       persists=persists,
                                       tokenizer=tokenizer)
    elif neardup_mode == "jaccard":
        # EXACT near-dedup: inverted-index candidate pairs (no LSH), so
        # the survivor set is deterministic-by-construction — the mode a
        # full-funnel oracle can replay (LSH recall, while ~1.0, is
        # probabilistic). Prefer 'minhash' beyond mid-size corpora: the
        # exact prefix-filtered pair join is the scale bound here.
        pairs = DD.ngram_jaccard_pairs(exact, text_col, id_col,
                                       shingle_k=3,
                                       threshold=neardup_threshold,
                                       persists=persists,
                                       tokenizer=tokenizer)
    elif neardup_mode == "cosine":
        from stream2segment_spark.functions.embeddings import (
            hashed_ngram_embeddings)
        from stream2segment_spark.operators.similarity import (
            lsh_bucket_neardup)
        emb = hashed_ngram_embeddings(
            exact.select(id_col, text_col), text_col, id_col,
            tokenizer=tokenizer)
        pairs = lsh_bucket_neardup(
            emb, id_col=id_col, vec_col="embedding", dim=64,
            num_planes=10, threshold=neardup_threshold, multiprobe=True)
    elif neardup_mode == "semantic":
        # SemDeDup: cluster the hashed embeddings, keep-first within
        # clusters — no pair graph / CC needed (the operator's keep-first
        # already picks one canonical doc per semantic neighborhood)
        from stream2segment_spark.functions.embeddings import (
            hashed_ngram_embeddings)
        from stream2segment_spark.operators.similarity import semantic_dedup
        # persisted: the embedding UDF is the expensive pass and feeds
        # the count below plus kmeans' seed scan, both Lloyd iterations'
        # assignments and the final pair stage — uncached it would be
        # re-evaluated for each
        emb = hashed_ngram_embeddings(
            exact.select(id_col, text_col), text_col, id_col,
            tokenizer=tokenizer).persist()
        if persists is not None:
            persists.append(emb)
        # one cached count serves the empty-corpus short-circuit AND the
        # auto k scale rule
        n_emb = emb.count()
        if n_emb == 0:
            losers = exact.select(id_col).limit(0)
        else:
            # auto k targets ~4096 docs/cluster so the gram matrix one
            # task builds stays ~128 MB (the operator's 'k grows with
            # the corpus' contract); an explicit semantic_k overrides,
            # clamped to the corpus size
            k_eff = (min(semantic_k, n_emb) if semantic_k is not None
                     else max(1, -(-n_emb // 4096)))
            flags = semantic_dedup(emb, id_col, "embedding",
                                   k=k_eff, threshold=neardup_threshold)
            losers = flags.filter(F.col("is_dup")).select(id_col)
        pairs = None
    elif neardup_mode == "containment":
        # asymmetric excerpt/quote dedup: drop docs whose shingle set is
        # contained (>= threshold) in a larger (or equal, lower-id)
        # peer's — the direction-aware keep rule lives in the pair
        # shape itself, so no CC/cluster pass is needed (or correct:
        # containment is not symmetric, so a pair graph would merge a
        # quote with its source AND everything the source contains)
        cpairs = DD.containment_pairs(
            exact, text_col, id_col, shingle_k=3,
            threshold=neardup_threshold, tokenizer=tokenizer,
            persists=persists)
        losers = (cpairs.filter(
            (F.col("n_b") > F.col("n_a"))
            | ((F.col("n_b") == F.col("n_a"))
               & (F.col("id_b") < F.col("id_a"))))
            .select(F.col("id_a").alias(id_col)).distinct())
        pairs = None
    else:
        raise ValueError(f"unknown neardup_mode {neardup_mode!r}")
    if pairs is not None:
        cc = connected_components(pairs, "id_a", "id_b")
        if neardup_keep == "best":
            # canonical = the LONGEST cluster member (C4 policy), not
            # the arbitrary min id — operators/dedup.keep_canonical
            sel = DD.keep_canonical(
                exact.select(id_col, "n_tokens"), cc, id_col,
                order=[F.col("n_tokens").desc(), F.col(id_col)])
            losers = sel.filter(~F.col("is_canonical")).select(id_col)
        else:
            # drop every near-dup that is not its cluster's min id
            losers = (cc.filter(F.col("id") != F.col("cluster_id"))
                      .select(F.col("id").alias(id_col)))
    # Persisted: both the funnel's near_dedup count and the caller's
    # write of ``curated`` read it — without the cache each consumer
    # re-runs the whole candidate->verify->CC near-dup stage.
    deduped = exact.join(losers, id_col, "left_anti").persist()
    if persists is not None:
        persists.append(deduped)

    # -- 4c. optional DSIR in-domain selection --------------------------
    if dsir_target is not None:
        if dsir_k is None:
            raise ValueError("dsir_target requires dsir_k (how many "
                             "documents to keep)")
        # model-free importance selection toward the target profile
        # (functions/dsir.py): two feature-count shuffles + a
        # buckets-row broadcast score table; the survivors semi-join so
        # annotation columns ride through untouched
        from stream2segment_spark.functions.dsir import (
            bucket_ratio_scores, dsir_scores, dsir_select,
            hashed_ngram_features)
        tf_feats = hashed_ngram_features(
            dsir_target, id_col, text_col, buckets=dsir_buckets,
            tokenizer=tokenizer)
        # persisted + eagerly filled: rf_feats feeds the score table AND
        # the per-doc sum — uncached each consumer re-tokenizes the
        # dedup survivors (r9 opt round; narrow (id, bucket, cnt) ints)
        rf_feats = hashed_ngram_features(
            deduped, id_col, text_col, buckets=dsir_buckets,
            tokenizer=tokenizer).persist()
        if persists is not None:
            persists.append(rf_feats)
        rf_feats.count()
        bsc = bucket_ratio_scores(tf_feats, rf_feats,
                                  buckets=dsir_buckets,
                                  persists=persists)
        picked = dsir_select(
            dsir_scores(deduped, rf_feats, bsc, id_col),
            id_col, dsir_k).select(id_col)
        deduped = deduped.join(picked, id_col, "left_semi").persist()
        if persists is not None:
            persists.append(deduped)
        _audit("dsir_selected", deduped)

    # -- 5. deterministic split -----------------------------------------
    curated = deduped.withColumn(
        "split", split_column(F.col(id_col), fractions=split_fractions))

    # -- 5b. optional temperature rebalance -----------------------------
    if mix_strata_col is not None:
        curated = temperature_sample(curated, id_col, mix_strata_col,
                                     alpha=mix_alpha)
        _audit("mixed", curated)

    # -- 6. optional training-chunk packing -----------------------------
    if pack_budget is not None:
        from stream2segment_spark.functions.packing import (
            pack_bestfit, pack_greedy)
        if pack_mode == "greedy":
            curated = pack_greedy(curated, id_col, "n_tokens",
                                  budget=pack_budget, n_shards=pack_shards)
        elif pack_mode == "bestfit":
            # truncation-free bins (never exceed the budget) at the cost
            # of a per-shard sequential pass — functions/packing.
            # pack_bestfit's bin_id replaces chunk_id in the output
            curated = pack_bestfit(curated, id_col, "n_tokens",
                                   budget=pack_budget,
                                   n_shards=pack_shards)
        else:
            raise ValueError(f"pack_mode must be 'greedy' or 'bestfit', "
                             f"got {pack_mode!r}")

    funnel = (input_docs.select(F.count("*").alias("input"))
              .crossJoin(filtered.select(F.count("*").alias("filtered")))
              .crossJoin(exact.select(F.count("*").alias("exact_dedup")))
              .crossJoin(deduped.select(F.count("*").alias("near_dedup"))))
    # audit columns LAST (the four core counts keep their positions for
    # existing consumers); names prefixed to never collide with core
    for name, frame in audit_counts:
        funnel = funnel.crossJoin(
            frame.select(F.count("*").alias(f"after_{name}")))
    return curated, funnel


def reference_lm_scores(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_contam_frac: float = 0.0,
    order: int = 2,
    curate_kwargs: dict | None = None,
) -> DataFrame:
    """Decontaminated reference-model scoring (the CCNet recipe shape:
    perplexity-filter raw text against an LM trained on a CLEAN
    reference corpus — Wenzek et al. 2019 — self-contained here by
    bootstrapping the reference from the corpus's own curated
    survivors):

    1. curate ``docs`` (the full funnel: C4/quality/dedup as configured
       by ``curate_kwargs``) — the reference corpus candidates;
    2. DECONTAMINATE the reference against ``benchmark`` (drop any
       curated doc whose k-shingle contamination fraction exceeds
       ``max_contam_frac``) so eval-set text can never tune the scorer
       that decides what the model trains on;
    3. train the n-gram model (``order`` 2 = add-one bigram, 3 = stupid
       backoff trigram) on the decontaminated reference;
    4. score EVERY raw doc against it. Returns one row per input doc:
       ``(id, n_trans, lm_score)`` (order 2) or the stupid-backoff
       columns (order 3).

    Scale shape: curation is the funnel's own story; step 2 is a
    broadcast probe (benchmarks are MBs); training shuffles count
    tables only; scoring joins the (vocabulary-sized, not corpus-sized)
    count tables onto the transition stream.
    """
    from stream2segment_spark.functions.lm import (
        bigram_model, lm_transition_scores, stupid_backoff_scores,
        trigram_model)
    from stream2segment_spark.operators.dedup import contamination_fractions

    curated, _ = curate_corpus(docs, id_col=id_col, text_col=text_col,
                               **(curate_kwargs or {}))
    ref = curated.select(id_col, text_col)
    if benchmark is not None:
        contam = contamination_fractions(ref, benchmark, id_col=id_col,
                                         text_col=text_col)
        clean = contam.filter(F.col("contam_frac") <= max_contam_frac) \
                      .select(id_col)
        ref = ref.join(clean, id_col, "left_semi")
    if order == 2:
        model = bigram_model(ref, text_col)
        return lm_transition_scores(docs, id_col, text_col, model=model)
    if order == 3:
        model = trigram_model(ref, text_col)
        return stupid_backoff_scores(docs, id_col, text_col, model=model)
    raise ValueError(f"order must be 2 or 3, got {order}")


def ccnet_partition(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    max_contam_frac: float = 0.0,
    order: int = 2,
    curate_kwargs: dict | None = None,
    quantize: int = 6,
) -> DataFrame:
    """The complete CCNet shape (Wenzek et al. 2019) over the engine's
    gate-checked pieces: language-ID -> decontaminated reference-LM
    scoring (:func:`reference_lm_scores`: curate -> drop
    benchmark-contaminated reference docs -> train -> score ALL raw
    docs) -> per-language head/middle/tail cut of the fluency
    distribution weighted by character volume
    (functions/buckets.ccnet_buckets). Returns every input doc with
    ``lang``, the LM score, ``bucket`` and ``cum_frac`` — downstream
    training typically keeps head+middle and samples tail.

    ``lang_col`` reuses an existing language column (e.g. the funnel's
    annotate stage); ``None`` stages ``langid_script`` here. Scale
    shape: scoring joins vocabulary-sized count tables onto the
    transition stream; the bucket cutoffs are a window over DISTINCT
    quantized scores per language, broadcast back — the corpus is
    never sorted or re-shuffled per language.
    """
    from stream2segment_spark.functions.buckets import ccnet_buckets
    from stream2segment_spark.functions.text import langid_script

    scores = reference_lm_scores(
        docs, benchmark, id_col=id_col, text_col=text_col,
        max_contam_frac=max_contam_frac, order=order,
        curate_kwargs=curate_kwargs)
    score_col = "lm_score" if order == 2 else "sb_score"
    t = F.coalesce(F.col(text_col), F.lit(""))
    lang = F.col(lang_col) if lang_col else langid_script(t)
    staged = docs.select(
        id_col, text_col, lang.alias("lang"),
        F.length(t).cast("long").alias("__chars"))
    d = staged.join(scores.select(id_col, score_col), id_col)
    out = ccnet_buckets(d, score_col, lang_col="lang",
                        weight_col="__chars", quantize=quantize)
    return out.drop("__chars")
