"""TermAutomatonQuery: builder API, path enumeration, graph matching.

Reference behavior: lucene/sandbox/src/java/org/apache/lucene/sandbox/
search/TermAutomatonQuery.java (createState/addTransition/setAccept/finish)
and TestTermAutomatonQuery-style assertions. The DuckDB-oracle gate row
(term_automaton) lives in test_gate.py; these tests cover the builder,
variable-length alternatives (beyond MultiPhraseQuery), and span dedup.
"""

import pytest

from lucene_spark.constants import ENGLISH_STOP_WORDS as STOP
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.search.query import (
    MatchNoDocsQuery,
    TermAutomatonBuilder,
    TermAutomatonQuery,
    rewrite,
)
from lucene_spark.search.searcher import Searcher


def _builder_two_paths():
    b = TermAutomatonBuilder()
    mid_a, mid_b, end = b.create_state(), b.create_state(), b.create_state()
    b.add_transition(0, mid_a, "w0001")
    b.add_transition(mid_a, end, "w0002")
    b.add_transition(0, mid_b, "w0002")
    b.add_transition(mid_b, end, "w0001")
    b.set_accept(end)
    return b


def test_builder_enumerates_paths():
    q = _builder_two_paths().finish()
    assert q.paths == (("w0001", "w0002"), ("w0002", "w0001"))
    assert q.distinct_terms == ("w0001", "w0002")


def test_variable_length_alternatives():
    # accept "w0001 w0002" (2 tokens) OR "w0003" (1 token) — the synonym
    # graph shape ("wi fi" ≡ "wifi") MultiPhraseQuery cannot express
    b = TermAutomatonBuilder()
    mid, end = b.create_state(), b.create_state()
    b.add_transition(0, mid, "w0001")
    b.add_transition(mid, end, "w0002")
    b.add_transition(0, end, "w0003")
    b.set_accept(end)
    q = b.finish()
    assert set(q.paths) == {("w0001", "w0002"), ("w0003",)}


def test_cycle_rejected():
    b = TermAutomatonBuilder()
    s1 = b.create_state()
    b.add_transition(0, s1, "a")
    b.add_transition(s1, s1, "a")
    b.set_accept(s1)
    with pytest.raises(ValueError, match="cyclic"):
        b.finish()


def test_empty_automaton_rewrites_to_no_docs():
    q = TermAutomatonQuery(paths=())
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_empty_path_rejected():
    with pytest.raises(ValueError, match="empty path"):
        TermAutomatonQuery(paths=(("a",), ()))


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("taidx"))
    rows = generate_webtext(300)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=STOP)
    return d, rows


def _py_spans(text, paths, stopwords):
    from lucene_spark.analysis.tokenizer import analyze_terms_positions

    terms, poss = analyze_terms_positions(text, stopwords)
    by_pos = {}
    for t, p in zip(terms, poss):
        by_pos.setdefault(p, set()).add(t)
    spans = set()
    for path in paths:
        for start in by_pos:
            if all(
                path[i] in by_pos.get(start + i, ()) for i in range(len(path))
            ):
                spans.add((start, len(path)))
    return spans


def test_match_set_equals_python_oracle(spark, index_dir):
    d, rows = index_dir
    s = Searcher(spark, d, stopwords=STOP)
    q = _builder_two_paths().finish()
    got = {
        r["url"]
        for r in s.search(q, k=300, with_url=True).collect()
    }
    exp = {
        r["url"]
        for r in rows
        if _py_spans(r["text"], q.paths, STOP)
    }
    assert got == exp


def test_freq_counts_distinct_spans(spark, index_dir):
    d, rows = index_dir
    s = Searcher(spark, d, stopwords=STOP)
    q = _builder_two_paths().finish()
    # single-path vs two-path on the same doc set: two-path freq >= either
    b = TermAutomatonBuilder()
    mid, end = b.create_state(), b.create_state()
    b.add_transition(0, mid, "w0001")
    b.add_transition(mid, end, "w0002")
    b.set_accept(end)
    single = b.finish()
    assert s.count(q) >= s.count(single)
