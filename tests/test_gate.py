"""Replicates the driver's correctness gate: each gate query runs through
the Spark engine AND its ANSI-SQL oracle in DuckDB on the same parquet, and
must match on row count, column names, and exact values (order-insensitive).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_spark.gate import gate_oracle_sql, gate_queries

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


QUERIES = gate_queries()
ORACLES = gate_oracle_sql()


def test_every_query_has_oracle():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_gate_query(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    exp = ddb.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: schema {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            ok = np.array_equal(
                gv.astype(np.float64), ev.astype(np.float64), equal_nan=True
            )
        else:
            ok = list(gv) == list(ev)
        assert ok, f"{name}.{c}:\n got={gv[:10]}\n exp={ev[:10]}"
