"""The ``spark.sql`` surface: register every table as a temp view, plus an
enriched ``<table>_v`` view exposing the derived-column library as real SQL
columns (SURVEY §4 item 6b — instead of a custom Catalyst
FunctionRegistry, views layer the same expressions, so
``spark.sql("... WHERE has_valid_data AND duration_sec > 30")`` works
verbatim).

Expression-only derived columns go into ``<table>_v`` (scan-cheap: pure
projections over the raw view). Derived columns needing relationship
joins (``requires_rels``/``attach`` — e.g. ``seed_id``,
``classlabels_count``) are materialized through the SelectionCompiler's
join planner into ``<table>_full``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream2segment_spark.schema import SchemaGraph
from stream2segment_spark.selectexpr import SelectionCompiler


def register_sql_views(
    spark: SparkSession,
    graph: SchemaGraph,
    dfs: dict[str, DataFrame],
    enriched_suffix: str = "_v",
    full_suffix: str = "_full",
) -> list[str]:
    """Create temp views: raw per table; ``<t>_v`` adding expression-only
    derived columns; ``<t>_full`` adding the join-dependent ones too when
    the table has any. Returns the created view names."""
    created: list[str] = []
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
        created.append(name)
        table = graph.tables.get(name)
        if table is None or not table.derived:
            continue

        cheap_names = [d for d, dc in table.derived.items()
                       if not dc.requires_rels
                       and getattr(dc, "attach", None) is None]
        joined_names = [d for d in table.derived if d not in cheap_names]

        if cheap_names:
            enriched = df
            for dname in cheap_names:
                dcol = table.derived[dname]
                enriched = enriched.withColumn(
                    dname, dcol.factory(lambda c, _e=enriched: _e[c]))
            enriched.createOrReplaceTempView(name + enriched_suffix)
            created.append(name + enriched_suffix)

        if joined_names:
            compiler = SelectionCompiler(graph, dfs, name)
            cols = []
            for dname in table.derived:  # cheap + joined, declared order
                col, _ = compiler.resolve(dname)
                cols.append(col.alias(dname))
            base_cols = [compiler.df[c] for c in df.columns]
            full = compiler.df.select(*base_cols, *cols)
            full.createOrReplaceTempView(name + full_suffix)
            created.append(name + full_suffix)
    return created
