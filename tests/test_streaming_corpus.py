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


def _long_text(seed: str, n: int = 40) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_incremental_ingest_neardups_against_history(spark, dirs):
    """neardup_threshold: a batch doc that is a NEAR (not exact) dup of
    an already-ingested doc is skipped; signatures are stored with the
    corpus so the probe reads signatures + candidate text only."""
    src, corpus = dirs
    base = _long_text("tok")
    _drop(spark, src, "drop1", [
        dict(doc_id=1, text=base),
        dict(doc_id=2, text=_long_text("other")),
    ])
    out1 = ingest_documents_stream(spark, src, corpus, SCHEMA,
                                   neardup_threshold=0.7)
    assert {r.doc_id for r in out1.collect()} == {1, 2}
    assert "minhash" in out1.columns            # signatures persisted

    _drop(spark, src, "drop2", [
        # near-dup of doc 1: one token appended -> jaccard >> 0.7
        dict(doc_id=4, text=base + " extra"),
        # near-dup of a lower-id BATCH sibling
        dict(doc_id=6, text=_long_text("fresh") + " tail"),
        dict(doc_id=5, text=_long_text("fresh")),
        # genuinely new
        dict(doc_id=7, text=_long_text("novel")),
    ])
    out2 = ingest_documents_stream(spark, src, corpus, SCHEMA,
                                   neardup_threshold=0.7)
    got = {r.doc_id for r in out2.collect()}
    assert got == {1, 2, 5, 7}, got

    # re-run: no-op
    out3 = ingest_documents_stream(spark, src, corpus, SCHEMA,
                                   neardup_threshold=0.7)
    assert out3.count() == 4


def test_incremental_ingest_neardup_upgrades_plain_corpus(spark, dirs):
    """A corpus first ingested WITHOUT signatures still works when
    near-dedup is enabled later: history without a minhash column is
    probed only via the exact-fingerprint anti-join, new batches carry
    signatures."""
    src, corpus = dirs
    _drop(spark, src, "drop1", [dict(doc_id=1, text=_long_text("aa"))])
    ingest_documents_stream(spark, src, corpus, SCHEMA)
    _drop(spark, src, "drop2", [
        dict(doc_id=2, text=_long_text("bb")),
        dict(doc_id=3, text=_long_text("bb") + " x"),   # near-dup of 2
    ])
    out = ingest_documents_stream(spark, src, corpus, SCHEMA,
                                  neardup_threshold=0.7)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_ingest_cli_end_to_end(spark, dirs, capsys):
    """'s2s ingest': the incremental ingestion from the command line —
    two invocations over the same landing dir, exact + near dedup."""
    from stream2segment_spark.cli import main
    src, corpus = dirs
    _drop(spark, src, "drop1", [dict(doc_id=1, text=_long_text("aa")),
                                dict(doc_id=2, text=_long_text("aa"))])
    rc = main(["ingest", "-i", src, "-o", corpus,
               "--neardup-threshold", "0.7"])
    assert rc == 0
    assert "corpus now holds 1 document(s)" in capsys.readouterr().out
    _drop(spark, src, "drop2", [
        dict(doc_id=3, text=_long_text("aa") + " x"),   # near-dup of 1
        dict(doc_id=4, text=_long_text("bb"))])
    rc = main(["ingest", "-i", src, "-o", corpus,
               "--neardup-threshold", "0.7"])
    assert rc == 0
    assert "corpus now holds 2 document(s)" in capsys.readouterr().out
    got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got == {1, 4}


def test_ingest_quality_gates_in_flight(spark, dirs):
    """c4_rules + min_quality drop junk before it enters the corpus;
    clean prose survives with its C4-cleaned text."""
    src, corpus = dirs
    prose = ("This is a proper prose sentence with words here.\n"
             "Another proper prose sentence with many more words.\n"
             "A third proper prose sentence with words in it.\n"
             "The good and the words of that have with them here.")
    _drop(spark, src, "d1", [
        dict(doc_id=1, text=prose * 3),
        dict(doc_id=2, text="lorem ipsum dolor sit amet page."
                            + prose),              # C4 page drop
        dict(doc_id=3, text="zz\nxx\nqq"),          # fails line rules
    ])
    out = ingest_documents_stream(spark, src, corpus, SCHEMA,
                                  c4_rules=True, min_quality=0.5)
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {1}
    assert "\n" in got[1]                 # cleaned text kept line structure
