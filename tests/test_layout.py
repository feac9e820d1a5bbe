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


def _box_files(path, xkey, ykey, box):
    """Files whose (xkey, ykey) footer rectangles intersect the box."""
    xr = {f: (lo, hi) for f, lo, hi in file_key_ranges(path, xkey)}
    yr = {f: (lo, hi) for f, lo, hi in file_key_ranges(path, ykey)}
    (x0, x1), (y0, y1) = box
    return [f for f in xr
            if xr[f][0] <= x1 and xr[f][1] >= x0
            and yr[f][0] <= y1 and yr[f][1] >= y0]


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    from pyspark.sql import Row

    from stream2segment_spark.sinks.layout import (
        int_cell, write_range_layout, write_zorder_layout)
    n, files = 128, 16
    grid = spark.createDataFrame(
        [Row(x=i, y=j) for i in range(n) for j in range(n)])
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_layout(
        grid, zpath,
        {"x": int_cell(F.col("x"), 0, n - 1, 8),
         "y": int_cell(F.col("y"), 0, n - 1, 8)}, files, bits=8)
    write_range_layout(grid, rpath, "x", files)  # 1D contrast
    box = ((8, 23), (8, 23))  # a 16x16 box = 1/64 of the domain
    z_hit = _box_files(zpath, "x", "y", box)
    # repartitionByRange samples boundaries with an RDD-id-derived seed
    # (varies with how many RDDs the shared session created before this
    # test), so exact file counts are NOT stable — assert the
    # order-robust structural claims instead:
    # (1) the compact box touches a small corner of the z layout, never
    #     a large fraction of it (gross-blowup guard);
    assert 1 <= len(z_hit) <= 8
    # (2) the 2D-stats property itself: in the x-sorted contrast every
    #     file's y interval spans ~the whole domain (y is unprunable),
    #     while MOST z-order files bound y inside a sub-half window
    y_r = [hi - lo for _, lo, hi in file_key_ranges(rpath, "y")]
    assert all(s >= 0.9 * (n - 1) for s in y_r)
    y_z = [hi - lo for _, lo, hi in file_key_ranges(zpath, "y")]
    assert sum(1 for s in y_z if s <= (n - 1) // 2) >= len(y_z) // 2
    # (3) completeness under the box filter
    got = (spark.read.parquet(zpath)
           .where(F.col("x").between(8, 23) & F.col("y").between(8, 23))
           .count())
    assert got == 16 * 16


def test_zorder_key_matches_python_morton(spark):
    from pyspark.sql import Row

    from stream2segment_spark.sinks.layout import zorder_key

    def morton(a, b, bits):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(
        [Row(a=a, b=b) for a in (0, 1, 5, 255) for b in (0, 3, 128, 255)])
    got = {(r["a"], r["b"]): r["z"] for r in df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=8)
        .alias("z")).collect()}
    assert got == {(a, b): morton(a, b, 8) for a, b in got}


def test_zorder_validation(spark):
    from stream2segment_spark.sinks.layout import int_cell, zorder_key
    c = F.col("x")
    with pytest.raises(ValueError, match="hi > lo"):
        int_cell(c, 5, 5)
    with pytest.raises(ValueError, match="bits"):
        int_cell(c, 0, 10, bits=0)
    with pytest.raises(ValueError, match="2\\^53"):
        int_cell(c, 0, 1 << 45, bits=20)
    with pytest.raises(ValueError, match="2-4"):
        zorder_key([c])
    with pytest.raises(ValueError, match="exceeds 62"):
        zorder_key([c, c, c, c], bits=16)


def test_layout_cli_zorder(spark, tmp_path, capsys):
    import json

    from pyspark.sql import Row

    from stream2segment_spark.cli import main as cli_main

    src = str(tmp_path / "grid.parquet")
    spark.createDataFrame([Row(x=i, y=j) for i in range(64)
                           for j in range(64)]).write.parquet(src)
    out = str(tmp_path / "z")
    rc = cli_main(["layout", "-i", src, "-o", out, "--key", "x,y",
                   "--files", "8", "--domains", "0:63,0:63",
                   "--bits", "6"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["key"] for r in rows} == {"x", "y"}
    assert len(rows) == 16  # 8 files x 2 keys
    # every key's per-file span is a strict subset of the domain for
    # most files (both dims clustered), unlike a 1D sort
    for key in ("x", "y"):
        spans = [(int(r["min"]), int(r["max"])) for r in rows
                 if r["key"] == key]
        assert sum(1 for lo, hi in spans if hi - lo < 63) >= len(spans) // 2
    # missing domains / mismatched counts are usage errors
    assert cli_main(["layout", "-i", src, "-o", out, "--key", "x,y",
                     "--files", "4"]) == 2
    assert cli_main(["layout", "-i", src, "-o", out, "--key", "x,y",
                     "--files", "4", "--domains", "0:63"]) == 2


def test_int_cell_null_stays_null(spark):
    """The documented 'NULL stays NULL' contract: Spark greatest/least
    skip nulls, which used to clamp NULL inputs into cell 0."""
    from pyspark.sql import Row

    from stream2segment_spark.sinks.layout import int_cell
    df = spark.createDataFrame([Row(x=5), Row(x=None), Row(x=120)])
    got = [r["c"] for r in
           df.select(int_cell(F.col("x"), 0, 127, 8).alias("c"))
           .collect()]
    assert got[1] is None and got[0] is not None and got[2] is not None
