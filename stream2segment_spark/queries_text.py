"""Catalog entries: text analysis + deduplication over ``documents``.

Strong (DuckDB-oracled) checks for everything deterministic cross-engine;
MinHash/SimHash use xxhash64 (no DuckDB equivalent) so they are registered
as weak (rows-only) checks here and exactly verified in
tests/test_dedup.py against exact-Jaccard / exact-Hamming ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark.functions import text as TX
from stream2segment_spark.operators import dedup as DD
from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table

# DuckDB fragment equivalent to operators.dedup.word_tokens(text)
_WORDS_SQL = ("list_filter(string_split_regex(trim(regexp_replace(lower(text), "
              "'[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0)")
# DuckDB fragment equivalent to operators.dedup.word_shingles(text, 3)
_SHINGLES_SQL = (
    "(SELECT doc_id, CASE WHEN len(w) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(w) - 1), "
    "i -> array_to_string(w[i:i+2], ' '))) "
    "ELSE [array_to_string(w, ' ')] END AS s "
    f"FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents))")


@register(
    "text_tokens",
    f"""SELECT doc_id,
               len({_WORDS_SQL}) AS n_tokens,
               len(regexp_extract_all(lower(text),
                                      '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1)) AS n_pieces
        FROM documents""",
)
def text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pieces
    (training-data pipeline extension; pure expressions in the scan stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_pieces"))


@register(
    "text_quality",
    f"""WITH t AS (
          SELECT doc_id, text, {_WORDS_SQL} AS w,
                 length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE
                   / length(text) AS pr
          FROM documents),
        m AS (
          SELECT doc_id,
                 length(text)::DOUBLE AS n,
                 len(list_filter(w, x -> x IN
                     ('the','and','of','to','is','in','that','it','a','for',
                      'on','with','as')))::DOUBLE / len(w) AS sw,
                 list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w) AS mwl,
                 pr
          FROM t)
        SELECT doc_id, round((
            (CASE WHEN n >= 100 AND n <= 20000 THEN 1.0 ELSE 0.5 END) +
            (CASE WHEN sw >= 0.05 AND sw <= 0.6 THEN 1.0 ELSE 0.5 END) +
            (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.5 END) +
            (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.5 END)) / 4.0, 4) AS quality
        FROM m""",
)
def text_quality(spark, sf_dir):
    """Quality scoring: length / stopword-ratio / word-length / punctuation
    heuristics composed into one [0,1] score."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(TX.quality_score(F.col("text")), 4).alias("quality"))


def _langid_oracle() -> str:
    counts = {
        lang: ("len(list_filter(w, x -> x IN ("
               + ", ".join(f"'{m}'" for m in markers) + ")))")
        for lang, markers in TX._LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    case = "CASE "
    for lang in TX._LANG_MARKERS:  # first match wins ties, like the Spark expr
        case += f"WHEN {best} > 0 AND {counts[lang]} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return (f"SELECT doc_id, {case} AS lang_pred "
            f"FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents)")


@register("text_langid", _langid_oracle())
def text_langid(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic over {en,de,fr,es}."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       TX.langid_heuristic(F.col("text")).alias("lang_pred"))


@register(
    "text_fingerprint",
    """SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                AS fingerprint
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of normalized text (engine-stable)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       TX.doc_fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "dedup_exact_docs",
    """SELECT min(doc_id) AS doc_id,
              md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                AS fingerprint
       FROM documents GROUP BY fingerprint""",
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup by content fingerprint, keep-first by doc_id
    (deterministic winner — reference A6 keep='first' semantics)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.doc_fingerprint(F.col("text")).alias("fingerprint"))
    return DD.exact_dedup(docs, ["fingerprint"], keep="first", order=["doc_id"])


@register(
    "dedup_ngram_jaccard",
    f"""WITH sh AS {_SHINGLES_SQL},
        inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM inv a JOIN inv b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               round(len(list_intersect(x.s, y.s))::DOUBLE
                     / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        WHERE len(list_intersect(x.s, y.s))::DOUBLE
              / len(list_distinct(list_concat(x.s, y.s))) >= 0.5""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (threshold 0.5) with inverted-
    index candidate generation — no cross join; the only shuffle is on the
    shingle key."""
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    out = DD.ngram_jaccard_pairs(docs, "text", "doc_id",
                                 shingle_k=3, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register("dedup_minhash_lsh")  # weak check: xxhash64 has no DuckDB twin;
def dedup_minhash_lsh(spark, sf_dir):  # exact verification in tests/test_dedup.py
    """MinHash(64 hashes) + LSH(16 bands) near-dup candidates with
    estimated-Jaccard >= 0.5. Shingle->signature->band join, all JVM-side
    expressions. The small parquet arrives as few input splits; the compute
    is per-row heavy, so repartition to the full core count first."""
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    out = DD.minhash_neardup_pairs(docs, "text", "doc_id",
                                   num_hashes=64, bands=16, threshold=0.5)
    return out.select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


@register("dedup_simhash")  # weak check; exact Hamming verified in tests
def dedup_simhash(spark, sf_dir):
    """SimHash(64-bit) near-dup pairs with Hamming <= 3 via the pigeonhole
    4-block equi-join (no cross join)."""
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    return DD.simhash_neardup_pairs(docs, "text", "doc_id",
                                    max_hamming=3, blocks=4)


WEAK_CHECK_ONLY_TEXT = ("dedup_minhash_lsh", "dedup_simhash")
