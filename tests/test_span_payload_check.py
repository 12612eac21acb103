"""SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery.java:53 +
MatchOperation): payload-filtered span matching. The exact-score gate is
test_gate.py's ``span_payload_check`` row; these pin the rewrite contracts
and the near-composition semantics."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.spans import (
    PayloadFilteredTerm,
    SpanNear,
    SpanTerm,
    span_payload_check,
)

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata parquet not present",
)


def test_rewrite_contracts():
    q = span_payload_check(SpanTerm("a"), [5])
    assert q == PayloadFilteredTerm("a", 5, "eq")
    near = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=1)
    qn = span_payload_check(near, [5, 6], op="gte")
    assert qn.clauses == (
        PayloadFilteredTerm("a", 5, "gte"), PayloadFilteredTerm("b", 6, "gte")
    ) and qn.slop == 1 and qn.in_order
    with pytest.raises(ValueError):
        span_payload_check(SpanTerm("a"), [1, 2])
    with pytest.raises(ValueError):
        span_payload_check(near, [1])
    with pytest.raises(ValueError):
        span_payload_check(
            SpanNear((SpanTerm("a"), SpanTerm("b")), slop=1, in_order=False),
            [1, 2],
        )
    with pytest.raises(ValueError):
        PayloadFilteredTerm("a", 1, "ne")


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    # payload = position (identity), so checks are position predicates
    idx = str(tmp_path_factory.mktemp("spc") / "idx")
    docs = spark.createDataFrame(
        [
            ("doc://1", "alpha beta alpha beta"),   # alpha@0,2 beta@1,3
            ("doc://2", "beta alpha"),              # alpha@1 beta@0
        ],
        "url string, text string",
    )
    build_index(
        spark, docs, idx, num_segments=1, analyzer="simple", stopwords=None,
        index_positions=True, payload_fn=lambda pos, doc: pos,
    )
    return Searcher(spark, idx, mode="double")


def _urls(s, q):
    return sorted(r["url"] for r in s.search(q, k=10, with_url=True).collect())


def test_eq_filters_positions(pidx):
    # alpha with payload(=pos) == 0: only doc 1 (alpha@0)
    assert _urls(pidx, span_payload_check(SpanTerm("alpha"), [0])) == ["doc://1"]
    # alpha with payload == 1: only doc 2
    assert _urls(pidx, span_payload_check(SpanTerm("alpha"), [1])) == ["doc://2"]


def test_near_with_payload_check(pidx):
    near = SpanNear((SpanTerm("alpha"), SpanTerm("beta")), slop=0)
    # both docs have adjacent alpha-beta? doc1 yes (0-1, 2-3); doc2 has
    # beta@0 alpha@1 (wrong order) -> only doc 1
    assert _urls(pidx, near) == ["doc://1"]
    # payload check [2, 3] keeps only the second occurrence pair in doc 1
    assert _urls(pidx, span_payload_check(near, [2, 3])) == ["doc://1"]
    # payload check [0, 3] matches nothing (alpha@0 then beta@3 not adjacent)
    assert _urls(pidx, span_payload_check(near, [0, 3])) == []


def test_no_payload_index_matches_nothing(spark, tmp_path):
    idx = str(tmp_path / "nopay")
    docs = spark.createDataFrame([("doc://1", "alpha beta")], "url string, text string")
    build_index(spark, docs, idx, num_segments=1, analyzer="simple",
                stopwords=None, index_positions=True)  # no payload_fn
    s = Searcher(spark, idx, mode="double")
    assert _urls(s, span_payload_check(SpanTerm("alpha"), [0])) == []
