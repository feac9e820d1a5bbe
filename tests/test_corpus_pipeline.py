"""The composed corpus-curation funnel (examples/corpus_pipeline.py) on
the driver's documents table: every stage's invariant checked on the real
output, plus determinism across runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.examples.corpus_pipeline import curate_corpus
from stream2segment_spark.schema import load_table
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def curated(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    out, funnel = curate_corpus(docs, languages=("en", "und"),
                                min_quality=0.5, token_band=(5, 100_000),
                                neardup_threshold=0.5)
    return docs, out.persist(), funnel.collect()[0]


def test_funnel_monotone(curated):
    docs, out, funnel = curated
    assert (funnel["input"] >= funnel["filtered"] >= funnel["exact_dedup"]
            >= funnel["near_dedup"] > 0)
    assert out.count() == funnel["near_dedup"]


def test_filters_hold_on_output(curated):
    _, out, _ = curated
    bad = out.filter(~F.col("lang").isin("en", "und")
                     | (F.col("quality") < 0.5)
                     | (F.col("n_tokens") < 5)).count()
    assert bad == 0


def test_no_duplicate_fingerprints(curated):
    _, out, _ = curated
    assert out.groupBy("fingerprint").count().filter("count > 1").count() == 0


def test_neardups_collapsed(spark, curated):
    """No two surviving docs share >= threshold shingle Jaccard: re-run
    the exact near-dup pair detector on the OUTPUT — it must be empty."""
    from stream2segment_spark.operators.dedup import ngram_jaccard_pairs
    _, out, _ = curated
    leftovers = ngram_jaccard_pairs(out, "text", "doc_id", shingle_k=3,
                                    threshold=0.5)
    assert leftovers.count() == 0


def test_split_assignment_deterministic_and_complete(spark, curated):
    docs, out, _ = curated
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # deterministic: a second full run assigns identical splits
    out2, _ = curate_corpus(docs, languages=("en", "und"),
                            min_quality=0.5, token_band=(5, 100_000),
                            neardup_threshold=0.5)
    diff = (out.select("doc_id", "split")
            .join(out2.select("doc_id", F.col("split").alias("s2")),
                  "doc_id")
            .filter("split <> s2").count())
    assert diff == 0
