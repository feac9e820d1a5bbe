"""SDS file-tree sink (SURVEY K6; reference resources/templates/save2fs.py
+ Segment.sds_path, process/db/models.py:323-347): write one miniSEED file
per segment into the SeisComP SDS directory layout.

Spark shape: the path is a pure expression (columns.sds_path); the file
writes run in ``foreachPartition`` so every executor writes its own rows
directly to (shared) storage — no driver funnel. Each file is re-encoded
from the decoded samples with the SEED 2.4 serializer.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.columns import sds_path
from stream2segment_spark.sources.mseed import encode_record


def write_sds_tree(
    df: DataFrame,
    root: str,
    net_col: str = "network", sta_col: str = "station",
    loc_col: str = "location", cha_col: str = "channel",
    start_col: str = "start_time", rate_col: str = "sample_rate",
    samples_col: str = "samples",
    encoding: int = 3,
) -> None:
    """Write ``<root>/YEAR/NET/STA/CHA.D/NET.STA.LOC.CHA.D.YEAR.DOY`` files.

    Rows need (net, sta, loc, cha, start_time, sample_rate, samples).
    Rows with NULL samples are skipped. Multiple records per file when the
    samples exceed one record's capacity."""
    with_path = df.withColumn(
        "__sds", sds_path(F.col(net_col), F.col(sta_col), F.col(loc_col),
                          F.col(cha_col), F.col(start_col), root=root))
    cols = [net_col, sta_col, loc_col, cha_col, start_col, rate_col,
            samples_col, "__sds"]

    def _write(rows) -> None:
        from datetime import timedelta, timezone
        # rows arrive clustered by path and time-ordered (see the
        # repartition+sort below): one file handle per channel-day file,
        # truncated once and APPENDED across segments — per-row 'wb'
        # used to keep only the LAST segment of a day (and raced when
        # the day's rows spanned partitions)
        fh, cur, seq = None, None, 0
        try:
            for row in rows:
                samples = row[samples_col]
                if samples is None:
                    continue
                x = np.asarray(samples, dtype=np.int64)
                start = row[start_col].replace(tzinfo=timezone.utc)
                rate = float(row[rate_col])
                path = row["__sds"]
                if path != cur:
                    if fh is not None:
                        fh.close()
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    fh, cur, seq = open(path, "wb"), path, 0
                # 448-byte payload per 512-byte record -> 112 int32
                per_rec = 112 if encoding == 3 else 56
                for off in range(0, len(x), per_rec):
                    chunk = x[off:off + per_rec]
                    t0 = start + timedelta(seconds=off / rate)
                    seq += 1
                    fh.write(encode_record(
                        row[net_col], row[sta_col], row[loc_col],
                        row[cha_col], t0, rate, chunk,
                        encoding=encoding, seq=seq))
        finally:
            if fh is not None:
                fh.close()

    # one partition owns each channel-day file; rows time-ordered so a
    # day's segments append sequentially into one handle
    (with_path.select(*cols)
     .repartition(F.col("__sds"))
     .sortWithinPartitions("__sds", start_col)
     .foreachPartition(_write))
