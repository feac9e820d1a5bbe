"""Shared fixtures: one SparkSession per test run, synthetic seismic tables
registered in both Spark and DuckDB, and an order-insensitive comparator
mirroring the driver's correctness gate (row count + schema + value hash)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR_T2 = os.environ.get("SPARK_GRAFT_SF_T2", "/root/testdata/sf0.01")
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # workers unpickle module-level test functions by reference -> the repo
    # and tests dirs must be importable in the worker processes
    extra = f"{REPO}:{REPO / 'tests'}"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    from stream2segment_spark.session import get_spark
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seismic_pdfs():
    from tests.seismic_data import make_seismic_tables
    return make_seismic_tables()


@pytest.fixture(scope="session")
def seismic_dfs(spark, seismic_pdfs):
    from pyspark.sql import types as T

    from stream2segment_spark import schema as sch
    graph = sch.seismic_graph()
    out = {}
    for name, pdf in seismic_pdfs.items():
        out[name] = spark.createDataFrame(pdf, schema=graph.tables[name].schema)
    return out


@pytest.fixture(scope="session")
def seismic_duck(seismic_pdfs):
    con = duckdb.connect()
    for name, pdf in seismic_pdfs.items():
        con.register(f"{name}_pdf", pdf)
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM {name}_pdf")
    yield con
    con.close()


@pytest.fixture(scope="session")
def seismic_graph_full():
    from stream2segment_spark import columns, schema
    return columns.register_seismic_derived(schema.seismic_graph())


@pytest.fixture(scope="session")
def testdata_duck():
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR_T2}/{name}.parquet')")
    yield con
    con.close()


# --------------------------------------------------------------------------
# Comparison utilities (mimic the driver: rowcount + schema + value hash)
# --------------------------------------------------------------------------

def _normalize(df: pd.DataFrame, float_decimals: int = 6) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float).round(float_decimals)
        elif pd.api.types.is_datetime64_any_dtype(s):
            ser = pd.to_datetime(s)
            if getattr(ser.dt, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = ser
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            def _norm(v):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    return None
                if isinstance(v, (bytearray, memoryview)):
                    return bytes(v)
                return v
            df[c] = s.map(_norm)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last",
                            kind="mergesort").reset_index(drop=True)
    return df


def assert_same_result(spark_df, duck_rel_or_df, float_decimals: int = 6,
                       float_tol: float = 1e-9):
    """Compare a Spark DataFrame against a DuckDB result: same columns (by
    sorted name), same rowcount, same values order-insensitively."""
    left = spark_df.toPandas()
    right = duck_rel_or_df if isinstance(duck_rel_or_df, pd.DataFrame) \
        else duck_rel_or_df.df()
    assert sorted(left.columns) == sorted(right.columns), \
        f"columns differ: {sorted(left.columns)} vs {sorted(right.columns)}"
    assert len(left) == len(right), f"rowcount {len(left)} vs {len(right)}"
    ln = _normalize(left, float_decimals)
    rn = _normalize(right, float_decimals)
    for c in ln.columns:
        ls, rs = ln[c], rn[c]
        if pd.api.types.is_float_dtype(ls) or pd.api.types.is_float_dtype(rs):
            la = pd.to_numeric(ls, errors="coerce")
            ra = pd.to_numeric(rs, errors="coerce")
            both_nan = la.isna() & ra.isna()
            close = ((la - ra).abs() <= float_tol *
                     (1.0 + la.abs().combine(ra.abs(), max))) | both_nan
            assert close.all(), (
                f"column {c!r}: {int((~close).sum())} mismatched floats, e.g.\n"
                f"{pd.DataFrame({'spark': la[~close], 'duck': ra[~close]}).head()}")
        else:
            eq = (ls.astype(object).where(~ls.isna(), None)
                  == rs.astype(object).where(~rs.isna(), None)) | (ls.isna() & rs.isna())
            assert eq.all(), (
                f"column {c!r}: {int((~eq).sum())} mismatches, e.g.\n"
                f"{pd.DataFrame({'spark': ls[~eq], 'duck': rs[~eq]}).head()}")
