"""join_search (JoinUtil.createJoinQuery analog): all score modes vs a
hand-computed expectation, plus plan shape (broadcast hash join, no
to-side shuffle)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import join_search


@pytest.fixture(scope="module")
def sides(spark):
    # from-hits: (doc_id, score); from/to side: (doc_id, grp)
    hits = spark.createDataFrame(
        [(0, 3.0), (1, 1.0), (2, 4.0), (3, 2.0)], "doc_id long, score double"
    )
    side = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, None), (4, "a"), (5, "b"), (6, "c")],
        "doc_id long, grp string",
    )
    return hits, side


# per-grp from-scores: a -> [3.0, 1.0]; b -> [4.0]; doc 3 has NULL grp
EXPECTED = {
    "max": {"a": 3.0, "b": 4.0},
    "min": {"a": 1.0, "b": 4.0},
    "total": {"a": 4.0, "b": 4.0},
    "avg": {"a": 2.0, "b": 4.0},
    "none": {"a": 1.0, "b": 1.0},
}


@pytest.mark.parametrize("mode", sorted(EXPECTED))
def test_join_modes(sides, mode):
    hits, side = sides
    out = join_search(hits, side, "grp", side, "grp", score_mode=mode)
    got = {(r["doc_id"], r["grp"]): r["score"] for r in out.collect()}
    exp = {
        (d, g): EXPECTED[mode][g]
        for d, g in [(0, "a"), (1, "a"), (4, "a"), (2, "b"), (5, "b")]
    }
    assert got == exp  # doc 3 (NULL) and doc 6 (unmatched "c") are absent


def test_join_invalid_mode(sides):
    hits, side = sides
    with pytest.raises(ValueError):
        join_search(hits, side, "grp", side, "grp", score_mode="sum")


def test_join_plan_broadcasts_values(sides):
    hits, side = sides
    out = join_search(hits, side, "grp", side, "grp", score_mode="max")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
