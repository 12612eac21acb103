"""Classic n-gram SpellChecker (spell/SpellChecker.java) — candidate
retrieval by shared character n-grams, ranking by plain Levenshtein
similarity 1 − lev/max(len) (spell/LevenshteinDistance.java:100). The
DuckDB-oracle gate row (spellcheck_ngram) lives in test_gate.py."""

import pytest

from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.spell import (
    NGramSpellChecker,
    _spell_form_grams,
    _spell_gram_sizes,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_gram_sizes_match_reference():
    # SpellChecker.java:554-572
    assert _spell_gram_sizes(7) == (3, 4)
    assert _spell_gram_sizes(6) == (3, 4)
    assert _spell_gram_sizes(5) == (2, 3)
    assert _spell_gram_sizes(4) == (1, 2)
    assert _spell_gram_sizes(2) == (1, 2)
    assert _spell_gram_sizes(1) == (1, 1)


def test_form_grams():
    assert _spell_form_grams("abcde", 3) == ["abc", "bcd", "cde"]
    assert _spell_form_grams("ab", 3) == []


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(250)


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spellngram"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, analyzer="simple")
    return d


@pytest.fixture(scope="module")
def dictionary(spark, idx):
    s = Searcher(spark, idx, analyzer="simple")
    rows = (
        s.reader.term_dict.groupBy("term").sum("df").collect()
    )
    return {r["term"]: int(r["sum(df)"]) for r in rows}


def _brute(dictionary, word, num_sug, accuracy=0.5):
    lo, hi = _spell_gram_sizes(len(word))
    grams = set()
    for ng in range(lo, hi + 1):
        grams.update(_spell_form_grams(word, ng))
    out = []
    for t, df in dictionary.items():
        if t == word or not any(g in t for g in grams):
            continue
        sc = 1.0 - _lev(word, t) / max(len(word), len(t))
        if sc >= accuracy:
            out.append((t, sc, df))
    out.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return out[:num_sug]


def test_suggestions_match_brute_force(spark, idx, dictionary):
    checker = NGramSpellChecker(Searcher(spark, idx, analyzer="simple"))
    # fixture vocabulary is w0000..; typo one digit
    got = checker.suggest_similar("w00x1", num_sug=8, mode="always")
    want = _brute(dictionary, "w00x1", 8)
    assert [(g.word, g.freq) for g in got] == [(w, f) for w, _, f in want]
    for g, (_, sc, _) in zip(got, want):
        assert g.score == pytest.approx(sc)
    assert got, "typo of an indexed word must yield suggestions"


def test_when_not_in_index_returns_word_itself(spark, idx, dictionary):
    checker = NGramSpellChecker(Searcher(spark, idx, analyzer="simple"))
    indexed = next(iter(dictionary))
    got = checker.suggest_similar(indexed, num_sug=5, mode="when_not_in_index")
    assert [(g.word, g.score) for g in got] == [(indexed, 1.0)]


def test_more_popular_requires_higher_df(spark, idx, dictionary):
    checker = NGramSpellChecker(Searcher(spark, idx, analyzer="simple"))
    # pick an indexed word; suggestions must all have df > its df
    word = max(dictionary, key=dictionary.get)  # most frequent word
    got = checker.suggest_similar(word, num_sug=10, mode="more_popular")
    assert all(g.freq > dictionary[word] for g in got)


def test_max_hits_cut_is_subset(spark, idx, dictionary):
    s = Searcher(spark, idx, analyzer="simple")
    full = {
        g.word
        for g in NGramSpellChecker(s).suggest_similar(
            "w00x1", num_sug=50, mode="always"
        )
    }
    cut = NGramSpellChecker(s).suggestions_df(
        "w00x1", num_sug=50, mode="always", max_hits=20
    )
    assert {r["word"] for r in cut.collect()} <= full
