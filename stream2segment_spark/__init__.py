"""stream2segment_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of rizac/stream2segment.

This is NOT a port: the reference (SQLAlchemy ORM + pandas + ObsPy over
SQLite/Postgres) is re-expressed as idiomatic Spark — declarative DataFrame /
SQL plans optimized by Catalyst, with Arrow-batched pandas UDFs only for the
per-segment numeric kernels that built-ins cannot express.

Layout
------
- ``session``     : tuned SparkSession factory
- ``schema``      : table schemas + relationship graph (the join planner's map)
- ``columns``     : derived-column expression library (reference's hybrid props)
- ``selectexpr``  : the selection-expression compiler (dict[attr, expr] -> plan)
- ``operators/``  : dedup, similarity, joins, stats (DataFrame -> DataFrame)
- ``functions/``  : scalar + text-analysis column functions
- ``funclib/``    : numpy numeric kernels + pandas-UDF adapters
- ``sources/``    : FDSN-text / parquet readers
- ``sinks/``      : CSV/parquet writers (segment_db_id first-column contract)
- ``process``     : the per-segment processing engine (applyInPandas)
- ``streaming/``  : incremental / Structured Streaming surface
"""

__version__ = "0.1.0"

from stream2segment_spark.session import get_spark  # noqa: F401
