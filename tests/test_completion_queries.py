"""ContextQuery + RegexCompletionQuery (suggest/document/ContextQuery.java,
RegexCompletionQuery.java). Exact-value gates live in test_gate.py
(suggest_regex / suggest_context rows); these pin the contracts the gate
corpus can't isolate: all-contexts matching, best-boost selection, context
filtering, and prefix-anchored regex semantics."""

import pytest

from lucene_spark.search.spell import context_suggest, regex_completion_suggest


@pytest.fixture(scope="module")
def sugg(spark):
    rows = [
        ("data stream joins", 10, ["en", "src1"]),
        ("data storage", 20, ["de", "src2"]),
        ("data stash", 30, ["ja", "src3"]),        # lang outside the query
        ("database sharding", 40, ["en", "de"]),   # two matching contexts
        ("other things", 50, ["en", "src1"]),      # prefix mismatch
    ]
    return spark.createDataFrame(
        rows, "text string, weight long, contexts array<string>"
    )


def test_context_filter_and_boost(sugg):
    out = context_suggest(sugg, "dat", {"en": 2.0, "de": 1.5}, k=10).collect()
    got = [(r["text"], r["score"]) for r in out]
    # ja-only doc dropped; two-context doc takes max boost (2.0)
    assert got == [
        ("database sharding", 80.0),  # 40 * max(2.0, 1.5)
        ("data storage", 30.0),       # 20 * 1.5
        ("data stream joins", 20.0),  # 10 * 2.0
    ]


def test_context_all_contexts_path(sugg):
    out = context_suggest(sugg, "dat", None, k=10).collect()
    assert [r["text"] for r in out] == [
        "database sharding", "data stash", "data storage", "data stream joins"
    ]  # weight DESC, no context filter


def test_context_empty_query_raises(sugg):
    with pytest.raises(ValueError):
        context_suggest(sugg, "  ", {"en": 1.0})


def test_regex_prefix_anchored(sugg):
    out = regex_completion_suggest(sugg, "data(base)? s[a-z]+", k=10).collect()
    assert [r["text"] for r in out] == [
        "database sharding", "data stash", "data storage", "data stream joins"
    ]  # weight DESC; (base)? makes all four data-prefixed docs match
    # anchored at the start: a mid-string match must not qualify
    out2 = regex_completion_suggest(sugg, "stream", k=10).collect()
    assert out2 == []
