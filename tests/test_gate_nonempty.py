"""Meta-guard: every gate oracle must return at least one row at the gate
SF. A row whose oracle is empty passes the hash compare trivially — the
xy_* rows shipped that way for one commit (coordinate moduli too large for
the 500-doc table) and dedup_exact was empty from round 1 — so emptiness
is treated as an authoring error, caught here DuckDB-side (no Spark)."""

import os

import duckdb
import pytest

from lucene_spark.gate import gate_oracle_sql

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata parquet not present",
)


def test_every_oracle_nonempty():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    empty = []
    for name, sql in gate_oracle_sql().items():
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        if n == 0:
            empty.append(name)
    assert not empty, f"trivially-empty gate oracles: {empty}"
