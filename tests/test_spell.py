"""DirectSpellChecker + prefix suggester: engine vs a pure-python oracle
implementing DirectSpellChecker.suggestSimilar (suggest/.../spell/
DirectSpellChecker.java:321-476) brute-force over PyIndex."""

import math

import pytest

from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.fuzzy import osa_distance
from lucene_spark.search.spell import DirectSpellChecker, prefix_suggest

N_DOCS = 250
STOP = ENGLISH_STOP_WORDS


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(N_DOCS)


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_spell"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=STOP)
    return d


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(spark, index_dir, stopwords=STOP)


@pytest.fixture(scope="module")
def pyidx(corpus):
    idx = PyIndex(stopwords=STOP)
    for i, r in enumerate(corpus):
        idx.add(i, r["text"])
    return idx


def py_suggest(
    pyidx,
    term,
    num_sug,
    *,
    max_edits=2,
    min_prefix=1,
    accuracy=0.5,
    min_query_length=4,
    max_query_frequency=0.01,
    threshold_frequency=0.0,
    transpositions=True,
    mode="when_not_in_index",
):
    """Brute-force suggestSimilar over every index term (no enumeration
    shortcuts — the semantics reference for the distributed path)."""
    if len(term) < min_query_length:
        return []
    docfreq = pyidx.doc_freq(term)
    if mode == "when_not_in_index" and docfreq > 0:
        return []
    max_doc = pyidx.doc_count
    if max_query_frequency >= 1.0:
        if docfreq > max_query_frequency:
            return []
    elif docfreq > int(math.ceil(max_query_frequency * float(max_doc))):
        return []
    min_df = docfreq if mode == "more_popular" else 0
    if threshold_frequency >= 1.0:
        min_df = max(min_df, int(threshold_frequency))
    elif threshold_frequency > 0.0:
        min_df = max(min_df, int(threshold_frequency * float(max_doc)) - 1)
    # two-pass prefix union: d<=1 candidates need min_prefix shared chars,
    # d>1 candidates need max(min_prefix, max_edits-1)
    pl_weak = min(min_prefix, len(term))
    pl_strong = min(max(min_prefix, max_edits - 1), len(term))
    out = []
    for t in pyidx.postings:
        if t == term or not t.startswith(term[:pl_weak]):
            continue
        if abs(len(t) - len(term)) > max_edits:
            continue
        d = osa_distance(term, t, max_edits, transpositions)
        if d > max_edits or d == 0:
            continue
        if d > 1 and not t.startswith(term[:pl_strong]):
            continue
        df = pyidx.doc_freq(t)
        if df <= min_df:
            continue
        score = 1.0 - d / min(len(t), len(term))
        if score < accuracy:
            continue
        out.append((t, score, df))
    out.sort(key=lambda x: (-x[1], -x[2], x[0]))
    return out[:num_sug]


def got_triples(sc, term, num_sug, mode="when_not_in_index", **kw):
    checker = DirectSpellChecker(sc, **kw)
    return [
        (w.word, w.score, w.freq)
        for w in checker.suggest_similar(term, num_sug, mode=mode)
    ]


def test_misspelling_default_mode(searcher, pyidx):
    got = got_triples(searcher, "w012x", 5)
    exp = py_suggest(pyidx, "w012x", 5)
    assert exp, "fixture should offer candidates"
    assert got == exp


def test_transpositions_toggle(searcher, pyidx):
    # w0023 exists; the transposed neighbor w0032 is OSA=1 but Levenshtein=2
    # (max_query_frequency disabled: the query term is a frequent one)
    assert "w0032" in pyidx.postings
    mqf = 10**6
    for transp in (True, False):
        got = got_triples(
            searcher, "w0023", 8, mode="always",
            transpositions=transp, max_query_frequency=mqf,
        )
        exp = py_suggest(
            pyidx, "w0023", 8, mode="always",
            transpositions=transp, max_query_frequency=mqf,
        )
        assert got == exp, f"transpositions={transp}"
        assert got, "candidates expected"
    hi = dict(
        (w, s)
        for w, s, _f in got_triples(
            searcher, "w0023", 5000, mode="always", max_query_frequency=mqf
        )
    )
    lo = dict(
        (w, s)
        for w, s, _f in got_triples(
            searcher, "w0023", 5000, mode="always",
            transpositions=False, max_query_frequency=mqf,
        )
    )
    swapped = [w for w in hi if w in lo and hi[w] > lo[w]]
    assert swapped, "some neighbor should score higher with transpositions"


def test_more_popular_and_threshold(searcher, pyidx):
    kw = dict(mode="more_popular", threshold_frequency=2.0)
    got = got_triples(searcher, "w019x", 5, **kw)
    exp = py_suggest(pyidx, "w019x", 5, **kw)
    assert got == exp
    for _w, _s, f in got:
        assert f >= 2


def test_when_not_in_index_short_and_hot_gates(searcher, pyidx):
    # existing term -> no suggestions in the default mode
    assert got_triples(searcher, "w0001", 5) == []
    # below min_query_length
    assert got_triples(searcher, "w00", 5, mode="always") == []
    # a frequent term trips max_query_frequency even in always mode
    hot = max(pyidx.postings, key=lambda t: pyidx.doc_freq(t))
    assert pyidx.doc_freq(hot) > math.ceil(0.01 * pyidx.doc_count)
    assert got_triples(searcher, hot, 5, mode="always") == []
    assert got_triples(searcher, hot, 5, mode="always") == py_suggest(
        pyidx, hot, 5, mode="always"
    )


def test_min_prefix_zero_union(searcher, pyidx):
    """min_prefix=0: distance-1 candidates may differ in the first char,
    distance-2 candidates still need 1 shared char (the pass-2 prefix)."""
    kw = dict(mode="always", min_prefix=0, max_query_frequency=10**6)
    got = got_triples(searcher, "x0023", 5000, **kw)
    exp = py_suggest(pyidx, "x0023", 5000, **kw)
    assert got == exp
    words = [w for w, _s, _f in got]
    assert "w0023" in words  # d=1, different first char: admitted
    d2_diff_first = [
        w
        for w in words
        if w[0] != "x"
        and osa_distance("x0023", w, 2) == 2
    ]
    assert d2_diff_first == []  # pass-2 prefix excludes these


def test_prefix_suggest(searcher, pyidx):
    got = prefix_suggest(searcher, "w00", k=10)
    cands = [(t, pyidx.doc_freq(t)) for t in pyidx.postings if t.startswith("w00")]
    cands.sort(key=lambda x: (-x[1], x[0]))
    assert got == cands[:10]


def test_infix_suggest_semantics(spark):
    from lucene_spark.search.spell import infix_suggest

    rows = [
        ("big data streaming engine", 50),
        ("data stock ticker", 40),       # 'st' prefix on 'stock'
        ("stream first no data", 30),    # has 'data' token and 'st' prefix
        ("metadata stream", 20),         # 'metadata' != token 'data'
        ("data warehouse", 10),          # no 'st' prefix token
    ]
    sugg = spark.createDataFrame(rows, "text string, weight long")
    got = [r["text"] for r in infix_suggest(sugg, "data st", k=10).collect()]
    # exact-token 'data' AND some token starting 'st', weight DESC
    assert got == [
        "big data streaming engine",
        "data stock ticker",
        "stream first no data",
    ]


def test_infix_suggest_last_token_only_prefix(spark):
    from lucene_spark.search.spell import infix_suggest

    sugg = spark.createDataFrame(
        [("database x", 1)], "text string, weight long"
    )
    # single-token query: pure prefix match, no exact-token clause
    assert infix_suggest(sugg, "data", k=5).count() == 1
    import pytest as _pt

    with _pt.raises(ValueError):
        infix_suggest(sugg, "  ", k=5)


# --- FuzzySuggester (suggest/analyzing/FuzzySuggester.java:66) ---------------

def _sugg_table(spark):
    rows = [
        ("stream", 90), ("streams", 40), ("strength", 30), ("stem", 25),
        ("merge", 70), ("storm", 20), ("xstream", 60),
    ]
    return spark.createDataFrame(rows, "text string, weight long")


def test_fuzzy_suggest_typo_prefix(spark):
    from lucene_spark.search.spell import fuzzy_suggest

    got = [tuple(r) for r in fuzzy_suggest(_sugg_table(spark), "strem", k=10).collect()]
    # 'stream'/'streams' prefix 'strea' & 'stream' within 1 edit; 'stem'
    # via delete-r; 'strength' prefix 'stren' via delete... 'strem'->'stren'
    # is 1 substitution; 'storm'/'merge'/'xstream' excluded (xstream fails
    # the exact first char? no — starts with 'x' != 's')
    texts = [t for t, _w in got]
    assert "stream" in texts and "streams" in texts and "stem" in texts
    assert "xstream" not in texts  # non_fuzzy_prefix: first char exact
    assert "merge" not in texts
    # ranking: weight DESC, text ASC
    weights = [w for _t, w in got]
    assert weights == sorted(weights, reverse=True)


def test_fuzzy_suggest_short_query_is_plain_prefix(spark):
    from lucene_spark.search.spell import fuzzy_suggest

    got = [r["text"] for r in fuzzy_suggest(_sugg_table(spark), "st", k=10).collect()]
    assert set(got) == {"stream", "streams", "strength", "stem", "storm"}


def test_fuzzy_suggest_transpositions_flag(spark):
    from lucene_spark.search.spell import fuzzy_suggest

    # 'srteam': transposition of 'stream'[1:3] -> OSA distance 1, plain 2
    with_t = [r["text"] for r in fuzzy_suggest(
        _sugg_table(spark), "srteam", k=10, transpositions=True
    ).collect()]
    without = [r["text"] for r in fuzzy_suggest(
        _sugg_table(spark), "srteam", k=10, transpositions=False
    ).collect()]
    assert "stream" in with_t
    assert "stream" not in without


def test_fuzzy_suggest_max_edits_validation(spark):
    import pytest
    from lucene_spark.search.spell import fuzzy_suggest

    with pytest.raises(ValueError, match="max_edits"):
        fuzzy_suggest(_sugg_table(spark), "strem", max_edits=3)
