"""Output sinks (CSV / parquet) with the segment_db_id first-column contract."""
