"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in lucene_spark.gate: the BM25 family runs the full
engine path (index build → postings blocks → distributed block-max scoring)
in float64 oracle mode; float32 Lucene rank-parity is gated by the pure-
python oracle in tests/test_spark_index.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_spark.gate import entry_query, gate_oracle_sql, gate_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_query(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate_queries()


def oracle_sql() -> dict[str, str]:
    return gate_oracle_sql()
