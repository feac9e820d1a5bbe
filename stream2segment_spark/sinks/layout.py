"""Range-clustered parquet layout: sorted storage for range-pruned scans.

The complement of :mod:`.bucketed` (which co-locates JOIN keys): this
sink clusters rows by a RANGE key so that every parquet file's min/max
footer statistics for that key are tight and pairwise disjoint. A
range predicate on the key (time windows, id ranges, score bands) then
prunes whole files at scan time — at 100 TB the difference between
"read the 3 files overlapping the window" and "open every file because
each one spans the whole key domain" (a hash layout's footer stats are
useless: every file's min..max covers everything).

``repartitionByRange`` samples the key distribution, so file boundaries
track the DATA quantiles (skew-balanced file sizes), and
``sortWithinPartitions`` additionally makes every ROW GROUP's stats
tight inside each file, enabling row-group-level pruning within the
surviving files. One range exchange at write time buys every future
range scan.

Layout choice rule of thumb: bucket by the key you JOIN on, range-sort
by the key you FILTER on; when both matter, bucket then sort within
buckets (write_bucketed(sort=True) already does the in-bucket sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_range_layout(df: DataFrame, path: str, key: str | list[str],
                       num_files: int, *, mode: str = "overwrite") -> None:
    """Persist ``df`` at ``path`` clustered into ``num_files`` range
    partitions of ``key`` (quantile-sampled boundaries), sorted within
    each file. Footer min/max intervals for ``key`` are disjoint across
    files (modulo boundary ties), so range filters prune whole files.

    Size ``num_files`` for the target scale: ~128-512 MB per file at
    rest (too few caps scan parallelism; too many makes small files and
    bloats the footer-listing phase)."""
    keys = [key] if isinstance(key, str) else list(key)
    if num_files <= 0:
        raise ValueError(f"num_files must be positive, got {num_files}")
    (df.repartitionByRange(num_files, *[F.col(k) for k in keys])
       .sortWithinPartitions(*keys)
       .write.mode(mode).parquet(path))


def file_key_ranges(path: str, key: str) -> list[tuple[str, object, object]]:
    """Driver-side audit: each parquet file's (file, min, max) footer
    statistics for ``key`` — the intervals scan pruning works with.
    Used by tests to prove disjointness; handy for layout debugging."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if key not in idx:
            raise KeyError(f"{key} not in {name} schema")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[key]).statistics
            if st is None or not st.has_min_max:
                return []  # stats unavailable: nothing to audit
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((name, lo, hi))
    return out
