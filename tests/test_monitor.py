"""monitor_matches (percolator) semantics vs hand oracles."""

import pytest

from lucene_spark.search.monitor import MonitorQuery, monitor_matches


DOCS = [
    (0, "alpha beta gamma"),
    (1, "beta alpha"),               # has both terms, wrong order
    (2, "alpha Beta!"),              # analyzer: lowercase + split on punct
    (3, "alpha alpha beta"),         # repeated lead term
    (4, "gamma delta"),
    (5, "alphabeta"),                # single token: must NOT match phrase
    (6, ""),
]


def _matches(spark, queries):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["query_id"])
        for r in monitor_matches(docs, queries).collect()
    }


def test_term_and_or_kinds(spark):
    got = _matches(
        spark,
        [
            MonitorQuery("t", "term", ("alpha",)),
            MonitorQuery("o", "or", ("gamma", "delta")),
            MonitorQuery("a", "and", ("alpha", "gamma")),
        ],
    )
    assert {(0, "t"), (1, "t"), (2, "t"), (3, "t")} == {p for p in got if p[1] == "t"}
    assert {(0, "o"), (4, "o")} == {p for p in got if p[1] == "o"}
    assert {(0, "a")} == {p for p in got if p[1] == "a"}


def test_phrase_requires_adjacent_in_order(spark):
    got = _matches(spark, [MonitorQuery("p", "phrase", ("alpha", "beta"))])
    # 0: adjacent; 2: punctuation stripped -> adjacent; 3: second alpha
    # adjacent to beta; 1 (wrong order) and 5 (one fused token) must not
    assert got == {(0, "p"), (2, "p"), (3, "p")}


def test_phrase_repeated_term(spark):
    got = _matches(spark, [MonitorQuery("pp", "phrase", ("alpha", "alpha"))])
    assert got == {(3, "pp")}


def test_kind_validation():
    with pytest.raises(ValueError):
        MonitorQuery("x", "near", ("a",))
    with pytest.raises(ValueError):
        MonitorQuery("x", "term", ("a", "b"))
    with pytest.raises(ValueError):
        MonitorQuery("x", "and", ())


def test_empty_doc_and_no_phrase_queries_path(spark):
    # the no-phrase fast path returns direct matches only
    got = _matches(spark, [MonitorQuery("t", "term", ("gamma",))])
    assert got == {(0, "t"), (4, "t")}
