"""CommonTermsQuery rewrite semantics (queries/CommonTermsQuery.java)."""

import os

import pytest

from lucene_spark.gate import _searcher
from lucene_spark.search.query import BooleanQuery, TermQuery

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def searcher(spark):
    return _searcher(spark, SF_DIR)


def test_low_and_high_split(searcher):
    # dup (df 25) and line (df ~376-378) are low at cutoff ceil(.76*500)=380;
    # scan (df ~398-405) is high
    q = searcher.common_terms_query("dup line scan", max_term_frequency=0.76)
    assert isinstance(q, BooleanQuery)
    (low,) = q.must
    (high,) = q.should
    assert {t.term for t in low.should} == {"dup", "line"}
    assert {t.term for t in high.should} == {"scan"}


def test_all_high_becomes_conjunction(searcher):
    # every term over the cutoff -> the high group rewrites to MUST
    # (the slow-query guard, CommonTermsQuery.java:176-182)
    q = searcher.common_terms_query("scan merge", max_term_frequency=0.5)
    assert q.must == ()
    (high,) = q.should
    assert high.should == () and {t.term for t in high.must} == {"scan", "merge"}


def test_single_term_is_term_query(searcher):
    q = searcher.common_terms_query("scan", max_term_frequency=0.5)
    assert isinstance(q, TermQuery) and q.term == "scan"


def test_absolute_frequency_cutoff(searcher):
    # maxTermFrequency >= 1 is an absolute docFreq bound
    q = searcher.common_terms_query("dup scan", max_term_frequency=30.0)
    (low,) = q.must
    (high,) = q.should
    assert {t.term for t in low.should} == {"dup"}
    assert {t.term for t in high.should} == {"scan"}


def test_low_freq_msm_ratio(searcher):
    # fractional minShouldMatch rounds over the optional count (Math.round)
    q = searcher.common_terms_query(
        "dup line scan", max_term_frequency=0.76, low_freq_min_should_match=0.9
    )
    (low,) = q.must
    assert low.min_should_match == 2  # round(0.9 * 2)


def test_matches_equivalent_boolean(searcher):
    q = searcher.common_terms_query("dup line scan", max_term_frequency=0.76)
    manual = BooleanQuery(
        must=(BooleanQuery(should=(TermQuery("dup"), TermQuery("line"))),),
        should=(BooleanQuery(should=(TermQuery("scan"),)),),
    )
    got = searcher.search(q, k=20, with_url=True).toPandas()
    exp = searcher.search(manual, k=20, with_url=True).toPandas()
    assert got.equals(exp)
