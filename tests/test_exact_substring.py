"""ExactSubstr dedup (Lee et al. 2021 recipe): duplicated k-gram windows
merged to maximal spans; span removal."""

import pytest

from lucene_spark.pipeline.dedup import (
    duplicated_substring_spans,
    remove_duplicated_substrings,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # docs 0/1 share "one two three four" (4 tokens) and nothing else
        (0, "alpha one two three four beta gamma"),
        (1, "one two three four delta epsilon zeta"),
        # doc 2 repeats a 3-gram INSIDE itself only — min_df counts
        # DISTINCT docs, so within-doc repetition is NOT a duplicate
        (2, "red green blue pad red green blue"),
        # docs 3/4 are verbatim copies end to end
        (3, "the whole document is identical here today"),
        (4, "the whole document is identical here today"),
        # doc 5 shares nothing
        (5, "unique words only appear once ever"),
        # docs 6/7 share TWO disjoint runs -> two spans each
        (6, "aa bb cc xx yy dd ee ff qq"),
        (7, "aa bb cc mm nn dd ee ff pp"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans(spark, docs):
    got = duplicated_substring_spans(docs, k=3, min_df=2).collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in got:
        by_doc.setdefault(int(r["doc_id"]), []).append(
            (int(r["span_start"]), int(r["span_end"]))
        )
    for v in by_doc.values():
        v.sort()
    # shared 4-token run = two overlapping 3-gram windows merged
    assert by_doc[0] == [(1, 5)]
    assert by_doc[1] == [(0, 4)]
    # within-doc repetition is not cross-doc duplication
    assert 2 not in by_doc
    # full-document copies: one span covering everything
    assert by_doc[3] == [(0, 7)]
    assert by_doc[4] == [(0, 7)]
    assert 5 not in by_doc
    # two disjoint shared runs stay two spans
    assert by_doc[6] == [(0, 3), (5, 8)]
    assert by_doc[7] == [(0, 3), (5, 8)]


def test_clean(spark, docs):
    got = {
        int(r["doc_id"]): r["clean_text"]
        for r in remove_duplicated_substrings(docs, k=3, min_df=2).collect()
    }
    assert got[0] == "alpha beta gamma"
    assert got[1] == "delta epsilon zeta"
    assert got[2] == "red green blue pad red green blue"
    assert got[3] == ""  # verbatim copy: everything drops
    assert got[5] == "unique words only appear once ever"
    assert got[6] == "xx yy qq"
    assert got[7] == "mm nn pp"
    assert set(got) == set(range(8))  # every input doc present


def test_boilerplate_guard(spark):
    # a gram above max_gram_df is ignored (the hot-shingle skew guard)
    rows = [(i, "common boiler plate tail%d" % i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicated_substring_spans(df, k=3, min_df=2, max_gram_df=3)
    assert spans.count() == 0  # df=5 > cap 3 -> dropped
    spans2 = duplicated_substring_spans(df, k=3, min_df=2, max_gram_df=None)
    assert spans2.count() == 5
