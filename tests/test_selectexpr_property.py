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
