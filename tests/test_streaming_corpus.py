"""Incremental corpus ingestion (streaming/corpus.py): two file drops
through the same checkpoint — the second pass reads only the new files,
cross-batch duplicate CONTENT is skipped, and a no-op re-run ingests
nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from stream2segment_spark.streaming.corpus import ingest_documents_stream

SCHEMA = "doc_id long, text string"


def _drop(spark, src, name, rows):
    # one plain parquet FILE per drop (the file stream source lists the
    # landing dir non-recursively)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    }), f"{src}/{name}.parquet")


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    return str(src), str(tmp_path / "corpus.parquet")


def test_incremental_ingest_dedups_across_drops(spark, dirs):
    src, corpus = dirs
    _drop(spark, src, "drop1", [
        dict(doc_id=1, text="alpha beta gamma"),
        dict(doc_id=2, text="delta epsilon"),
        dict(doc_id=3, text="alpha beta gamma"),   # in-batch dup of 1
    ])
    out1 = ingest_documents_stream(spark, src, corpus, SCHEMA)
    got1 = {r.doc_id for r in out1.collect()}
    assert got1 == {1, 2}                          # in-batch dedup kept min id

    _drop(spark, src, "drop2", [
        dict(doc_id=4, text="delta epsilon"),      # cross-drop dup of 2
        dict(doc_id=5, text="zeta eta theta"),     # genuinely new
        dict(doc_id=1, text="alpha beta gamma"),   # full replay of doc 1
    ])
    out2 = ingest_documents_stream(spark, src, corpus, SCHEMA)
    got2 = {r.doc_id: r.fingerprint for r in out2.collect()}
    assert set(got2) == {1, 2, 5}
    # exactly one row per distinct content
    assert out2.count() == out2.select("fingerprint").distinct().count()

    # a third run with nothing new is a no-op (checkpoint: files already
    # seen are not re-read; anti-join: nothing re-appends)
    out3 = ingest_documents_stream(spark, src, corpus, SCHEMA)
    assert out3.count() == 3


def test_ingest_annotates_fingerprint(spark, dirs):
    src, corpus = dirs
    _drop(spark, src, "d", [dict(doc_id=7, text="Some  Text, here!")])
    out = ingest_documents_stream(spark, src, corpus, SCHEMA)
    row = out.collect()[0]
    # fingerprint is the normalized-content hash (case/punct-insensitive)
    from stream2segment_spark.functions.text import doc_fingerprint
    from pyspark.sql import functions as F
    want = spark.range(1).select(
        doc_fingerprint(F.lit("some text here")).alias("f")).first().f
    assert row.fingerprint == want


def test_ingest_empty_landing_dir_returns_empty_frame(spark, dirs):
    """First call before any file drop: no crash, an empty frame with
    the annotated schema; a later drop then ingests normally."""
    src, corpus = dirs
    out = ingest_documents_stream(spark, src, corpus, SCHEMA)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "text", "fingerprint"}
    _drop(spark, src, "late", [dict(doc_id=9, text="finally some data")])
    out2 = ingest_documents_stream(spark, src, corpus, SCHEMA)
    assert out2.count() == 1
