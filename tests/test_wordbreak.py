"""WordBreakSpellChecker: hand-computed break/combination expectations on
a controlled-vocabulary corpus (WordBreakSpellChecker.java semantics)."""

import pytest

from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.wordbreak import WordBreakSpellChecker

# controlled docFreqs: each word appears once per doc listed
DOCS = [
    "data base store",          # 0
    "data base",                # 1
    "data stream",              # 2
    "database big",             # 3  (compound present in index)
    "base big data",            # 4
    "sun flower",               # 5
    "sunflower field",          # 6
    "sun sun field",            # 7
]
# df: data=4 base=3 store=1 stream=1 database=1 big=2 sun=2(docs 5,7)
# flower=1 sunflower=1 field=2


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_wb"))
    df = spark.createDataFrame(
        [(f"doc://{i:04d}", t) for i, t in enumerate(DOCS)],
        "url string, text string",
    )
    build_index(spark, df, d, num_segments=2, stopwords=None)
    return Searcher(spark, d, stopwords=None)


def words(breaks):
    return [[w.word for w in ws] for ws in breaks]


def test_break_basic(searcher):
    wb = WordBreakSpellChecker(searcher)
    got = wb.suggest_word_breaks("databasestore")  # not in index
    # max_changes=1 -> 2-part splits only: data|basestore? basestore df=0;
    # database|store both present
    assert words(got) == [["database", "store"]]
    freqs = [(w.word, w.freq) for w in got[0]]
    assert freqs == [("database", 1), ("store", 1)]


def test_break_two_changes_and_sort(searcher):
    wb = WordBreakSpellChecker(searcher, max_changes=2)
    got = wb.suggest_word_breaks("databasestore")
    # 2-part first (fewer changes), then the 3-part data|base|store
    assert words(got) == [
        ["database", "store"],
        ["data", "base", "store"],
    ]
    # summed-frequency sort keeps the same order here (2-part first)
    got2 = wb.suggest_word_breaks(
        "databasestore", sort_method="num_changes_then_summed_frequency"
    )
    assert words(got2) == words(got)


def test_break_max_freq_ranking(searcher):
    # 'sunflower' IS in the index -> when_not_in_index returns nothing
    wb = WordBreakSpellChecker(searcher)
    assert wb.suggest_word_breaks("sunflower") == []
    # always mode: sun|flower qualifies
    got = wb.suggest_word_breaks("sunflower", mode="always")
    assert words(got) == [["sun", "flower"]]


def test_break_more_popular(searcher):
    # more_popular: parts need df >= df('sunflower') = 1 -> sun|flower ok
    wb = WordBreakSpellChecker(searcher)
    got = wb.suggest_word_breaks("sunflower", mode="more_popular")
    assert words(got) == [["sun", "flower"]]
    # raise the bar: min_suggestion_frequency above flower's df kills it
    wb2 = WordBreakSpellChecker(searcher, min_suggestion_frequency=2)
    assert wb2.suggest_word_breaks("sunflower", mode="always") == []


def test_break_min_word_length(searcher):
    wb = WordBreakSpellChecker(searcher, min_break_word_length=5)
    # both parts must be >= 5 chars: database(8)|store(5) survives
    assert words(wb.suggest_word_breaks("databasestore")) == [
        ["database", "store"]
    ]
    wb2 = WordBreakSpellChecker(searcher, min_break_word_length=6)
    assert wb2.suggest_word_breaks("databasestore") == []


def test_combinations(searcher):
    wb = WordBreakSpellChecker(searcher)
    # 'sun flower' -> 'sunflower' (df 1); inputs present -> blocked in
    # when_not_in_index (minFreq != 0), allowed in always mode
    assert wb.suggest_word_combinations(["sun", "flower"]) == []
    got = wb.suggest_word_combinations(["sun", "flower"], mode="always")
    assert [(c.suggestion.word, c.suggestion.freq, c.orig_indexes) for c in got] == [
        ("sunflower", 1, (0, 1))
    ]
    # a typo'd absent input unlocks when_not_in_index
    got2 = wb.suggest_word_combinations(["sun", "flowerz"])
    assert got2 == []  # 'sunflowerz' not in index
    got3 = wb.suggest_word_combinations(["data", "basex"])
    assert got3 == []
    # more_popular: combined df must beat every input's
    got4 = wb.suggest_word_combinations(["data", "base"], mode="more_popular")
    assert got4 == []  # df(database)=1 < df(data)=4


def test_combination_window_and_length(searcher):
    wb = WordBreakSpellChecker(searcher, max_changes=2)
    got = wb.suggest_word_combinations(
        ["data", "base", "store"], mode="always"
    )
    # windows: data+base=database(1), data+base+store(0), base+store(0)
    assert [(c.suggestion.word, c.orig_indexes) for c in got] == [
        ("database", (0, 1))
    ]
    wb2 = WordBreakSpellChecker(searcher, max_combine_word_length=7)
    assert wb2.suggest_word_combinations(["data", "base"], mode="always") == []
