"""Bucketed-table sink: pre-shuffled storage for repeated co-located joins.

At 100 TB the dominant cost of the corpus pipeline's repeated id-keyed
joins (dedup verify re-attaching vectors by id, incremental anti-joins,
label/metadata enrichment) is the exchange of the big side. Hive-style
bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)` hashes
rows into a fixed number of files per partition, and Catalyst then plans
bucket-aware joins/aggregations over the stored table with NO Exchange on
the bucketed side (both sides bucketed on the join key and same bucket
count -> zero-shuffle sort-merge join).

This is metastore-backed by design (`saveAsTable` — plain
`parquet(path)` cannot record bucket metadata); the session's
`spark.sql.warehouse.dir` owns the files. Pick the bucket count for the
TARGET scale: buckets are the unit of join parallelism for every future
read, and each bucket of each write task becomes one file (aim for
~128-512 MB per bucket at rest; too few buckets caps parallelism, too
many produces small files).

Spark refuses bucketed writes in some modes (`insertInto` on mismatched
specs); stick to `saveAsTable` with an explicit mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   num_buckets: int, *, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. Sorting within buckets lets the zero-shuffle join also
    skip the per-task sort (sort-merge join reads presorted files)."""
    keys = [key] if isinstance(key, str) else list(key)
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(num_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (must go
    through the catalog — `spark.read.parquet(path)` on the same files
    would silently drop bucketing and reintroduce the shuffle)."""
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str | list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the SAME key with the SAME bucket
    count: plans as a sort-merge join with no Exchange on either side.
    (If bucket counts differ, Spark shuffles the smaller-bucketed side;
    keep counts aligned across the tables you co-locate.)"""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
