"""Stempel (egothor) patch-command stemmer + table-format loader
(analysis/stempel.py). The fixture tables are hand-written pairs (public
Polish morphology) built and serialized through the same classes a
Lucene ``stemmer_*.tbl`` is read with — format fidelity is tested by
byte-level round-trips through the Java DataOutput layout. The
exact-value BM25 gate is polish_stempel_index in test_gate.py."""

import pytest

from lucene_spark.analysis.stempel import (
    MultiTrie2,
    Trie,
    _JIn,
    _JOut,
    build_demo_table,
    diff_apply,
    load_stemmer_table,
    polish_analyze,
    save_stemmer_table,
    stempel_stem,
)


# --- Diff.apply vectors (Diff.java:103-142, hand-computed) ----------------


def test_diff_apply_commands():
    # D<n>: delete n ('a'=1) chars ending at the cursor (starts at end)
    assert diff_apply("kotem", "Db") == "kot"
    assert diff_apply("domu", "Da") == "dom"
    # R<x>: replace the cursor char
    assert diff_apply("książki", "Ra") == "książka"
    # -<n>: move the cursor left n chars without editing
    assert diff_apply("abcde", "-bRz") == "abzde"
    # I<x>: insert after the cursor (java: pos=2, pos+=1 -> insert at
    # index 3, after 'c')
    assert diff_apply("abc", "Ix") == "abcx"
    # out-of-bounds edits swallow (Diff.apply catches the
    # StringIndexOutOfBounds): the word survives as edited so far
    assert diff_apply("ab", "DzRq") == "ab"  # Dz underflows -> unchanged
    assert diff_apply("", "Da") == ""
    assert diff_apply("abc", None) == "abc"
    assert diff_apply("abc", "") == "abc"


# --- Trie behavior --------------------------------------------------------


def test_trie_backward_last_on_path():
    t = Trie(forward=False)
    t.add("kota", "Da")
    t.add("kotem", "Db")
    assert t.get_last_on_path("kota") == "Da"
    assert t.get_last_on_path("kotem") == "Db"
    assert t.get_last_on_path("xyz") is None
    # a word EXTENDING a known one picks up the deepest command passed
    # on its (reversed) path (egothor last-on-path generalization)
    assert t.get_last_on_path("wykota") == "Da"
    # diverging before any command yields None
    assert t.get_last_on_path("psota") is None


def test_trie_forward_walk():
    t = Trie(forward=True)
    t.add("walk", "Da")
    t.add("walking", "Dc")
    assert t.get_last_on_path("walking") == "Dc"
    # get_fully requires the exact path to be consumed
    assert t.get_fully("walking") == "Dc"
    assert t.get_fully("walkingx") is None


def test_multitrie2_decompose_and_stem():
    m = MultiTrie2(forward=False)
    m.add("kotem", "Db")
    assert stempel_stem("kotem", m) == "kot"
    # multi-part command with a '-' skip decomposes into levels
    parts = MultiTrie2.decompose("-bRz")
    assert parts == ["-b", "Rz"]
    assert MultiTrie2.decompose("DaRb") == ["DaRb"]


# --- binary format round-trips (Java DataOutput layout) -------------------


def test_java_utf_roundtrip():
    jout = _JOut()
    for s in ["M2", "Da", "książka", "a\x00b", "emoji \U0001F600"]:
        jout.write_utf(s)
    jin = _JIn(jout.getvalue())
    assert jin.read_utf() == "M2"
    assert jin.read_utf() == "Da"
    assert jin.read_utf() == "książka"
    assert jin.read_utf() == "a\x00b"
    assert jin.read_utf() == "emoji \U0001F600"
    # modified UTF-8: U+0000 must be the 2-byte C0 80 form, never raw 0
    jout2 = _JOut()
    jout2.write_utf("\x00")
    assert jout2.getvalue() == b"\x00\x02\xc0\x80"


def test_table_roundtrip_multitrie():
    t = build_demo_table()
    data = save_stemmer_table(t)
    t2 = load_stemmer_table(data)
    assert isinstance(t2, MultiTrie2)
    for w in ["kotem", "kota", "koty", "domu", "domach", "książki",
              "językami", "miastach"]:
        assert stempel_stem(w, t2) == stempel_stem(w, t)
    # round-trip is byte-stable (store(load(x)) == x)
    assert save_stemmer_table(t2) == data


def test_table_roundtrip_plain_trie():
    t = Trie(forward=False)
    t.add("walking", "Dc")
    t.add("walked", "Db")
    data = save_stemmer_table(t)
    t2 = load_stemmer_table(data)
    assert isinstance(t2, Trie) and not isinstance(t2, MultiTrie2)
    assert stempel_stem("walking", t2) == "walk"
    assert stempel_stem("walked", t2) == "walk"


def test_truncated_table_raises():
    data = save_stemmer_table(build_demo_table())
    with pytest.raises(EOFError):
        load_stemmer_table(data[: len(data) // 2])


# --- analyzer chain -------------------------------------------------------


def test_polish_analyze_chain():
    toks = polish_analyze("Koty i domy w miastach")
    assert [t.term for t in toks] == ["kot", "i", "dom", "w", "miast"]
    # words shorter than minLength pass through unstemmed
    assert [t.term for t in polish_analyze("on")] == ["on"]
    # no command → token unchanged (StempelFilter null contract)
    assert [t.term for t in polish_analyze("spark")] == ["spark"]


def test_polish_user_table():
    m = MultiTrie2(forward=False)
    m.add("running", "Dd")
    toks = polish_analyze("running spark", table=m)
    assert toks[0].term == "run"
    assert toks[1].term == "spark"
