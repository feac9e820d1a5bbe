"""Range-clustered parquet layout (sinks/layout.py): disjoint per-file
min/max footer intervals (the contract scan pruning relies on), the
hash-layout contrast (overlapping intervals: nothing prunable), and
result correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.schema import load_table
from stream2segment_spark.sinks.layout import file_key_ranges, \
    write_range_layout
from tests.conftest import SF_DIR_SMOKE


def test_range_layout_disjoint_file_intervals(spark, tmp_path):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    out = str(tmp_path / "range")
    write_range_layout(docs, out, "doc_id", num_files=8)
    ranges = file_key_ranges(out, "doc_id")
    assert len(ranges) == 8
    ivals = sorted((lo, hi) for _, lo, hi in ranges)
    # tight AND disjoint: each file's interval ends before the next begins
    assert all(a_hi < b_lo for (_, a_hi), (b_lo, _) in
               zip(ivals, ivals[1:]))
    # a narrow range filter overlaps exactly one file's interval
    lo, hi = ivals[3]
    probe_lo = lo + (hi - lo) // 4
    probe_hi = lo + (hi - lo) // 2
    overlapping = [1 for (a, b) in ivals if a <= probe_hi and b >= probe_lo]
    assert len(overlapping) == 1
    # and the data read back under that filter is correct and complete
    got = (spark.read.parquet(out)
           .filter(F.col("doc_id").between(probe_lo, probe_hi)).count())
    want = docs.filter(F.col("doc_id").between(probe_lo, probe_hi)).count()
    assert got == want > 0


def test_hash_layout_contrast_overlapping_intervals(spark, tmp_path):
    """The same data hash-repartitioned: every file spans ~the whole key
    domain — footer stats can prune nothing. This is WHY the range sink
    exists."""
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    out = str(tmp_path / "hashed")
    docs.repartition(8, "doc_id").write.parquet(out)
    ranges = file_key_ranges(out, "doc_id")
    assert len(ranges) == 8
    glo = min(lo for _, lo, _ in ranges)
    ghi = max(hi for _, _, hi in ranges)
    span = ghi - glo
    # every file covers >90% of the global key span
    assert all((hi - lo) > 0.9 * span for _, lo, hi in ranges)


def test_range_layout_validation(spark, tmp_path):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    with pytest.raises(ValueError, match="num_files"):
        write_range_layout(docs, str(tmp_path / "x"), "doc_id", 0)


def test_layout_cli_end_to_end(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main

    src = str(tmp_path / "in.parquet")
    load_table(spark, SF_DIR_SMOKE, "documents").write.parquet(src)
    out = str(tmp_path / "ranged")
    rc = cli_main(["layout", "-i", src, "-o", out,
                   "--key", "doc_id", "--files", "4"])
    assert rc == 0
    ivals = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(ivals) == 4
    spans = sorted((int(r["min"]), int(r["max"])) for r in ivals)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    assert cli_main(["layout", "-i", src, "-o", out,
                     "--key", "nope", "--files", "4"]) == 2
