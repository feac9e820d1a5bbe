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
- ``pipeline``    : the download pipeline composed end-to-end
- ``streaming/``  : incremental / Structured Streaming + stateful ops
- ``multimodal``  : binary media columns (probe/decode/frame-sample)
- ``plots``       : GUI-equivalent plot-data producers
"""

__version__ = "0.1.0"

from stream2segment_spark.process import (  # noqa: F401
    SegmentView, SkipSegment, imap, process, process_df)
from stream2segment_spark.schema import (  # noqa: F401
    infer_graph_schemas, load_table, load_tables, seismic_graph,
    testdata_graph)
from stream2segment_spark.selectexpr import exprquery  # noqa: F401
from stream2segment_spark.session import get_spark  # noqa: F401
