"""Physical table layout for scale: bucketing (co-located joins) and
partitioned writes (partition pruning).

The reference leaves physical layout to Postgres (indexes). On Spark the
equivalents are DECISIONS this module encodes:

- **Bucketing** (``write_bucketed``): persist the fact table hash-bucketed
  by its join key. Two tables bucketed the same way join with ZERO
  shuffle on either side (SortMergeJoin directly over bucket files) —
  the 100 TB answer for the recurring segments⋈channels/events joins.
  Requires a catalog table (``saveAsTable``), not a bare path.
- **Partitioned parquet** (``write_partitioned``): directory partitioning
  by low-cardinality selective columns (e.g. download_id, event day) so
  selections prune whole directories at planning time
  (``PartitionFilters`` in the scan, no data read).

Both are verified at the PLAN level in tests (no Exchange under the
bucketed join; PartitionFilters on the pruned scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables — with matching bucket specs
    Spark plans a shuffle-free SortMergeJoin over bucket pairs."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet: predicates on ``partition_cols``
    prune at planning time (zero IO for untouched partitions)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def plan_of(df: DataFrame) -> str:
    """The formatted physical plan as a string (test/debug helper)."""
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
