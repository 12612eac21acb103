"""Reciprocal Rank Fusion (search/hybrid.py; Cormack/Clarke/Buettcher
SIGIR 2009). DuckDB-oracle gate row: hybrid_rrf in test_gate.py."""

import pytest

from lucene_spark.search.hybrid import rrf_fuse


def test_rrf_hand_example(spark):
    r1 = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "docid long, score double"
    )
    r2 = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "docid long, score double"
    )
    got = {
        r["docid"]: (r["score"], r["n_runs"])
        for r in rrf_fuse([r1, r2], k=60, top=10).collect()
    }
    want = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,   # rank 2 in r1, rank 1 in r2
        3: 1 / 63,
        4: 1 / 62,
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d][0] == pytest.approx(s)
    assert got[2][1] == 2 and got[1][1] == 1
    # doc in both runs outranks every single-run doc here
    order = [r["docid"] for r in rrf_fuse([r1, r2], k=60, top=10).collect()]
    assert order[0] == 2


def test_rrf_tie_breaks_and_top(spark):
    r1 = spark.createDataFrame(
        [(5, 1.0), (6, 1.0)], "docid long, score double"
    )
    # equal scores: rank by docid ASC -> 5 before 6
    got = [r["docid"] for r in rrf_fuse([r1], k=60, top=1).collect()]
    assert got == [5]
    with pytest.raises(ValueError):
        rrf_fuse([])
