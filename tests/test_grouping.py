"""Grouping/diversity collector semantics (search/grouping.py)."""

import pytest

from lucene_spark.search.grouping import (
    all_group_heads,
    all_groups_count,
    distinct_values_counts,
    diversified_topk,
)

HITS = [  # (doc_id, score)
    (1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0), (5, 5.0), (6, 4.0), (7, 9.0),
]
KEYS = [  # (doc_id, lang)
    (1, "en"), (2, "en"), (3, "en"), (4, "de"), (5, "de"), (6, "fr"),
    # doc 7 has no key row -> null group
]
VALS = [(1, "web"), (2, "web"), (3, "book"), (4, "web"), (5, "news"), (6, "web")]


@pytest.fixture(scope="module")
def dfs(spark):
    hits = spark.createDataFrame(HITS, "doc_id long, score double")
    keys = spark.createDataFrame(KEYS, "doc_id long, lang string")
    vals = spark.createDataFrame(VALS, "doc_id long, source string")
    return hits, keys, vals


def test_diversified_caps_per_key(dfs):
    hits, keys, _ = dfs
    rows = diversified_topk(hits, keys, "lang", k=10, max_per_key=2).collect()
    langs = [r.lang for r in rows]
    assert langs.count("en") == 2  # doc 3 (third-best en) excluded
    ids = {r.doc_id for r in rows}
    assert 3 not in ids and {1, 2, 4, 5, 6, 7} == ids


def test_diversified_global_rank_order(dfs):
    hits, keys, _ = dfs
    rows = diversified_topk(hits, keys, "lang", k=3, max_per_key=2).collect()
    # score DESC, doc_id ASC tie-break: doc1 (9.0) before doc7 (9.0)
    assert [(r.rank, r.doc_id) for r in rows] == [(1, 1), (2, 7), (3, 2)]


def test_null_key_forms_own_group(dfs):
    hits, keys, _ = dfs
    rows = diversified_topk(hits, keys, "lang", k=10, max_per_key=1).collect()
    assert any(r.lang is None and r.doc_id == 7 for r in rows)


def test_group_heads(dfs):
    hits, keys, _ = dfs
    got = {
        r.lang: r.doc_id for r in all_group_heads(hits, keys, "lang").collect()
    }
    assert got == {"en": 1, "de": 4, "fr": 6, None: 7}


def test_all_groups_count(dfs):
    hits, keys, _ = dfs
    got = {
        r.lang: r.n_hits
        for r in all_groups_count(hits, keys, "lang").collect()
    }
    assert got == {"en": 3, "de": 2, "fr": 1, None: 1}


def test_distinct_values_top_groups(dfs):
    hits, keys, vals = dfs
    out = distinct_values_counts(
        hits, keys, "lang", vals, "source", top_groups=2
    ).collect()
    got = {r.lang: r.n_distinct for r in out}
    # heads: en 9.0, None 9.0, de 6.0, fr 4.0; top-2 by (head desc, lang asc)
    # -> NULL sorts... verified below by membership
    assert len(got) == 2 and got.get("en") == 2  # en: web, book
