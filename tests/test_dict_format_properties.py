"""Property-based round-trips for the round-4 dictionary-format codecs
(hypothesis): arbitrary content must survive store→load byte-exactly —
the guarantee that makes the loaders safe for REAL user-mounted tables
whose content we cannot enumerate in fixtures.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.analysis.stempel import (
    MultiTrie2,
    Trie,
    _JIn,
    _JOut,
    load_stemmer_table,
    save_stemmer_table,
)

# BMP minus surrogates (java chars; writeChar is UTF-16 code units)
_bmp = st.characters(
    min_codepoint=0, max_codepoint=0xFFFF, blacklist_categories=("Cs",)
)
_any_str = st.text(alphabet=_bmp, max_size=24)
# trie keys: non-empty, drawn from a small alphabet so paths share rows
_key = st.text(alphabet="abcdefksiążę中日", min_size=1, max_size=8)
# patch commands: pairs of op+param (the egothor command grammar)
_cmd = st.lists(
    st.tuples(st.sampled_from("-RDI"), st.sampled_from("abcdefgh")),
    min_size=1,
    max_size=4,
).map(lambda ps: "".join(op + par for (op, par) in ps))


@settings(max_examples=60, deadline=None)
@given(st.lists(_any_str, max_size=8))
def test_java_utf_roundtrip_property(strings):
    jout = _JOut()
    for s in strings:
        jout.write_utf(s)
    jin = _JIn(jout.getvalue())
    for s in strings:
        assert jin.read_utf() == s


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_key, _cmd), min_size=1, max_size=12),
       st.booleans())
def test_trie_store_load_fixpoint(pairs, forward):
    t = Trie(forward=forward)
    for key, cmd in pairs:
        t.add(key, cmd)
    data = save_stemmer_table(t)
    t2 = load_stemmer_table(data)
    # store∘load is a byte fixpoint and lookups agree on every added key
    assert save_stemmer_table(t2) == data
    for key, _cmd2 in pairs:
        assert t2.get_last_on_path(key) == t.get_last_on_path(key)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_key, _cmd), min_size=1, max_size=10),
       st.booleans())
def test_multitrie_store_load_fixpoint(pairs, forward):
    m = MultiTrie2(forward=forward)
    for key, cmd in pairs:
        m.add(key, cmd)
    data = save_stemmer_table(m)
    m2 = load_stemmer_table(data)
    assert isinstance(m2, MultiTrie2)
    assert save_stemmer_table(m2) == data
    for key, _cmd2 in pairs:
        assert m2.get_last_on_path(key) == m.get_last_on_path(key)


# --- smartcn .dct ---------------------------------------------------------

from lucene_spark.analysis.smartcn import (  # noqa: E402
    load_bigram_dct,
    load_word_dct,
    save_bigram_dct,
    save_word_dct,
)

# GB2312-encodable hanzi (level-1 common set starts at 0xB0A1)
_hanzi = st.sampled_from(list("中国人民大学生活经济新闻机场技术工作世界语言分析北京"))
_zh_word = st.text(alphabet=_hanzi, min_size=1, max_size=4)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(_zh_word, st.integers(1, 10**6), max_size=20))
def test_word_dct_roundtrip_property(words):
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "coredict.dct")
    save_word_dct(words, p)
    assert load_word_dct(p) == words


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.tuples(_zh_word, _zh_word).map(lambda t: f"{t[0]}@{t[1]}"),
    st.integers(1, 10**6),
    max_size=20,
))
def test_bigram_dct_roundtrip_property(bigrams):
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "bigramdict.dct")
    save_bigram_dct(bigrams, p)
    assert load_bigram_dct(p) == bigrams
