"""Property-based tests (hypothesis): random selection-language conditions
compiled by exprquery vs a DuckDB query built from the same semantics —
row-set equality on the sf0.001 events table."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream2segment_spark.schema import (
    infer_graph_schemas, load_tables, testdata_graph)
from stream2segment_spark.selectexpr import exprquery

SF = "/root/testdata/sf0.001"
TYPES = ["click", "view", "purchase", "signup", "error"]

_num = st.floats(min_value=0, max_value=250, allow_nan=False).map(
    lambda x: round(x, 1))
_cmp_op = st.sampled_from(["<", ">", "<=", ">=", "!=", "="])
_bounds = st.tuples(_num, _num).map(sorted)
_interval_kind = st.sampled_from(["[]", "()", "[)", "(]"])


@st.composite
def value_condition(draw):
    if draw(st.booleans()):
        op = draw(_cmp_op)
        v = draw(_num)
        expr = f"{op}{v}"
        sql_op = {"=": "=", "!=": "!="}.get(op, op)
        sql = f"value {sql_op} {v}"
    else:
        lo, hi = draw(_bounds)
        kind = draw(_interval_kind)
        expr = f"{kind[0]}{lo}, {hi}{kind[1]}"
        lo_op = ">=" if kind[0] == "[" else ">"
        hi_op = "<=" if kind[1] == "]" else "<"
        sql = f"value {lo_op} {lo} AND value {hi_op} {hi}"
    return expr, sql


@st.composite
def type_condition(draw):
    neg = draw(st.booleans())
    subset = draw(st.lists(st.sampled_from(TYPES), min_size=1, max_size=3,
                           unique=True))
    expr = ("!=" if neg else "") + " ".join(subset)
    inlist = ", ".join(f"'{t}'" for t in subset)
    sql = f"event_type {'NOT IN' if neg else 'IN'} ({inlist})"
    return expr, sql


@pytest.fixture(scope="module")
def env(spark):
    dfs = load_tables(spark, SF, ["events"])
    graph = infer_graph_schemas(testdata_graph(), dfs)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return graph, dfs, con


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vc=value_condition(), tc=type_condition(), use_type=st.booleans())
def test_random_conditions_match_duckdb(env, vc, tc, use_type):
    graph, dfs, con = env
    conditions = {"value": vc[0]}
    where = [vc[1]]
    if use_type:
        conditions["event_type"] = tc[0]
        where.append(tc[1])
    out = exprquery(graph, dfs, "events", conditions)
    got = sorted(r["event_id"] for r in out.select("event_id").collect())
    want = sorted(r[0] for r in con.execute(
        "SELECT event_id FROM events WHERE " + " AND ".join(where)
    ).fetchall())
    assert got == want, (conditions, len(got), len(want))


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@pytest.fixture(scope="module")
def env_joins(spark):
    dfs = load_tables(spark, SF, ["lineitem", "orders", "part"])
    graph = infer_graph_schemas(testdata_graph(), dfs)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return graph, dfs, con


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    prio=st.lists(st.sampled_from(PRIORITIES), min_size=1, max_size=2,
                  unique=True),
    size=st.tuples(st.integers(1, 50), st.integers(1, 50)).map(sorted),
    qty_op=st.sampled_from(["<", ">", "<=", ">="]),
    qty=st.integers(1, 50),
)
def test_random_dotted_joins_match_duckdb(env_joins, prio, size, qty_op, qty):
    graph, dfs, con = env_joins
    conditions = {
        "order.o_orderpriority": " ".join(f"'{p}'" for p in prio),
        "part.p_size": f"[{size[0]}, {size[1]}]",
        "l_quantity": f"{qty_op}{qty}",
    }
    out = exprquery(graph, dfs, "lineitem", conditions)
    got = sorted((r["l_orderkey"], r["l_linenumber"])
                 for r in out.select("l_orderkey", "l_linenumber").collect())
    inlist = ", ".join(f"'{p}'" for p in prio)
    want = sorted(con.execute(f"""
        SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_orderpriority IN ({inlist})
          AND p.p_size BETWEEN {size[0]} AND {size[1]}
          AND l.l_quantity {qty_op} {qty}""").fetchall())
    assert got == want, (conditions, len(got), len(want))


def test_datetime_literal_conditions(env):
    """ISO datetime literals (both 'T' and space forms) in interval and
    comparison expressions — parsed per column type, matching DuckDB."""
    graph, dfs, con = env
    cases = [
        # space-form datetimes must be quoted (shlex value splitting, as in
        # the reference); the 'T' form needs no quotes
        ({"ts": "[2024-01-01T00:00:00, '2024-03-01 12:30:00')"},
         "ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-03-01 12:30:00'"),
        ({"ts": ">2024-06-15T06:00:00"},
         "ts > TIMESTAMP '2024-06-15 06:00:00'"),
        ({"ts": "!=null"}, "ts IS NOT NULL"),
    ]
    for conditions, where in cases:
        got = sorted(r["event_id"] for r in
                     exprquery(graph, dfs, "events", conditions)
                     .select("event_id").collect())
        want = sorted(r[0] for r in con.execute(
            f"SELECT event_id FROM events WHERE {where}").fetchall())
        assert got == want, (conditions, len(got), len(want))
