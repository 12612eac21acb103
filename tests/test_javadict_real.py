"""javadict readers against the REAL Lucene-shipped binary resources.

The reference tree bundles the actual compiled kuromoji/nori dictionary
resources (minus the large TokenInfoDictionary$buffer.dat entry buffers
and nori's fst). These tests read that REAL data — produced by Lucene's
own Java writers, not by this repo's write_* twins — which
independently pins the byte readers, most importantly the FST reader
(real IPADIC FSTs use the fixed-length-arc encodings heavily, far
beyond what hand-built fixtures cover). The data is used strictly as
read-only test INPUT from the reference mount; nothing is copied into
this repo. Tests skip when the reference tree is not mounted.
"""

import os

import pytest

from lucene_spark.analysis.javadict import (
    JA_CHARACTER_CLASSES,
    KO_CHARACTER_CLASSES,
    KO_POS_TAGS,
    decode_ja_entry,
    decode_ko_entry,
    fst_enumerate,
    read_buffer,
    read_char_def,
    read_conn_costs,
    read_fst,
    read_ko_pos_dict,
    read_pos_dict,
    read_target_map,
)

_JA = ("/root/reference/lucene/analysis/kuromoji/src/resources/"
       "org/apache/lucene/analysis/ja/dict")
_KO = ("/root/reference/lucene/analysis/nori/src/resources/"
       "org/apache/lucene/analysis/ko/dict")

ja_mounted = pytest.mark.skipif(
    not os.path.isdir(_JA), reason="reference kuromoji resources absent")
ko_mounted = pytest.mark.skipif(
    not os.path.isdir(_KO), reason="reference nori resources absent")


def _read(base, name):
    with open(os.path.join(base, name), "rb") as fh:
        return fh.read()


@ja_mounted
def test_real_ja_character_definition():
    cat, flags = read_char_def(
        _read(_JA, "CharacterDefinition.dat"), "kuromoji_cd",
        len(JA_CHARACTER_CLASSES))
    cls = {n: i for i, n in enumerate(JA_CHARACTER_CLASSES)}
    # well-known IPADIC char.def classifications
    assert cat[ord("ア")] == cls["KATAKANA"]
    assert cat[ord("あ")] == cls["HIRAGANA"]
    assert cat[ord("漢")] == cls["KANJI"]
    assert cat[ord("a")] == cls["ALPHA"]
    assert cat[ord("5")] == cls["NUMERIC"]
    assert cat[ord(" ")] == cls["SPACE"]
    # the writer's Nakaguro override is baked into the binary
    assert cat[0x30FB] == cls["SYMBOL"]
    # IPADIC invoke/group rows: KATAKANA 1 1 2, KANJI 0 0 2, ALPHA 1 1 0
    assert flags[cls["KATAKANA"]] == (True, True)
    assert flags[cls["KANJI"]] == (False, False)
    assert flags[cls["ALPHA"]] == (True, True)


@ja_mounted
def test_real_ja_connection_costs():
    conn = read_conn_costs(_read(_JA, "ConnectionCosts.dat"), "kuromoji_cc")
    # IPADIC context-id space is 1316x1316
    assert conn.forward_size == 1316
    assert len(conn.costs) == 1316 * 1316
    # all values are shorts; the matrix has both signs
    assert all(-32768 <= c <= 32767 for c in conn.costs[:5000])
    assert any(c < 0 for c in conn.costs)
    assert conn.get((0, 0)) is not None


@ja_mounted
def test_real_ja_pos_dict():
    rows = read_pos_dict(_read(_JA, "TokenInfoDictionary$posDict.dat"),
                         "kuromoji_dict_pos")
    assert len(rows) == 1316
    # POS strings are real IPADIC tags
    tags = {r[0] for r in rows if r[0]}
    assert any(t.startswith("名詞") for t in tags)
    assert any(t.startswith("動詞") for t in tags)
    # inflection data present for verb rows
    assert any(r[1] is not None for r in rows)


@ja_mounted
def test_real_ja_fst_full_walk():
    """Enumerate the ENTIRE shipped IPADIC FST (the strongest pin the
    sandbox allows for the FST reader: ~300k+ real keys over all arc
    encodings) and align its output space with the real targetMap."""
    meta = read_fst(_read(_JA, "TokenInfoDictionary$fst.dat"))
    assert meta.input_type == 1  # BYTE2
    tmap = read_target_map(
        _read(_JA, "TokenInfoDictionary$targetMap.dat"), "kuromoji_dict_map")
    n = 0
    max_ord = -1
    seen = set()
    want = {"東京", "日本", "する", "京都"}
    for labels, ord_ in fst_enumerate(meta):
        n += 1
        # ord 0 is legitimate: PositiveIntOutputs writes nothing for the
        # first key (NO_OUTPUT == 0), so the builder's first surface
        # enumerates with output 0
        assert ord_ >= 0
        if ord_ > max_ord:
            max_ord = ord_
        s = "".join(chr(c) for c in labels)
        if s in want:
            seen.add(s)
    # every FST output ord must be addressable in the targetMap, and the
    # ord space must be essentially dense (outputs are the builder's
    # running ord counter)
    assert max_ord < len(tmap)
    assert n > 300_000
    assert max_ord > 300_000
    assert seen == want


@ja_mounted
def test_real_ja_unknown_dictionary():
    tmap = read_target_map(
        _read(_JA, "UnknownDictionary$targetMap.dat"), "kuromoji_dict_map")
    pos = read_pos_dict(_read(_JA, "UnknownDictionary$posDict.dat"),
                        "kuromoji_dict_pos")
    buf = read_buffer(_read(_JA, "UnknownDictionary$buffer.dat"),
                      "kuromoji_dict")
    # one sourceId per character class (+ the builder's NGRAM row 0)
    assert len(tmap) >= len(JA_CHARACTER_CLASSES)
    ci = JA_CHARACTER_CLASSES.index("KATAKANA")
    rows = [decode_ja_entry(buf, wid, pos) for wid in tmap[ci]]
    assert rows, "KATAKANA must have at least one unknown template"
    for (left, p, _it, _if, cost, _b, _r) in rows:
        assert 0 <= left < 1316
        assert -32768 <= cost <= 32767
        assert p  # a real POS string


@ko_mounted
def test_real_ko_character_definition():
    cat, flags = read_char_def(
        _read(_KO, "CharacterDefinition.dat"), "ko_cd",
        len(KO_CHARACTER_CLASSES))
    cls = {n: i for i, n in enumerate(KO_CHARACTER_CLASSES)}
    assert cat[ord("한")] == cls["HANGUL"]
    assert cat[ord("漢")] in (cls["HANJA"], cls["HANJANUMERIC"])
    assert cat[ord("a")] == cls["ALPHA"]


@ko_mounted
def test_real_ko_pos_and_unknown():
    tags = read_ko_pos_dict(_read(_KO, "TokenInfoDictionary$posDict.dat"))
    assert len(tags) > 100
    assert "NNG" in tags and "VV" in tags
    tmap = read_target_map(
        _read(_KO, "UnknownDictionary$targetMap.dat"), "ko_dict_map")
    unk_pos = read_ko_pos_dict(_read(_KO, "UnknownDictionary$posDict.dat"))
    buf = read_buffer(_read(_KO, "UnknownDictionary$buffer.dat"), "ko_dict")
    assert len(tmap) >= len(KO_CHARACTER_CLASSES)
    ci = KO_CHARACTER_CLASSES.index("HANGUL")
    for wid in tmap[ci]:
        (left, right, cost, pos, _rd, _seg) = decode_ko_entry(
            buf, wid, unk_pos, "")
        assert pos in KO_POS_TAGS
        assert -32768 <= cost <= 32767


_ZH = ("/root/reference/lucene/analysis/smartcn/src/resources/"
       "org/apache/lucene/analysis/cn/smart/hhmm")

zh_mounted = pytest.mark.skipif(
    not os.path.isdir(_ZH), reason="reference smartcn resources absent")


@zh_mounted
def test_real_smartcn_coredict_mem():
    """The REAL Lucene-shipped coredict.mem (Java serialization)
    deserializes into the word dictionary, and the HHMM chain over it
    reproduces TestSmartChineseAnalyzer.testChineseAnalyzer's expected
    segmentation exactly."""
    from lucene_spark.analysis.javadict import load_smartcn_coredict_mem
    from lucene_spark.analysis.smartcn import smart_chinese_analyze

    words = load_smartcn_coredict_mem(os.path.join(_ZH, "coredict.mem"))
    assert len(words) > 70_000
    assert words["中国"] > 10_000  # a high-frequency word
    assert all(f >= 0 for f in list(words.values())[:1000])
    toks = [t.term for t in
            smart_chinese_analyze("我购买了道具和服装。", dicts=(words, {}))]
    assert toks == ["我", "购买", "了", "道具", "和", "服装"]


@zh_mounted
def test_real_smartcn_mem_dir_mount():
    from lucene_spark.analysis.smartcn import load_mem_dir

    words, bigrams = load_mem_dir(_ZH)  # bigramdict.mem absent in repo
    assert len(words) > 70_000
    assert bigrams == {}


# --- real stempel table / ja stoptags / ja stopwords -----------------------

_PL_TBL = ("/root/reference/lucene/analysis/stempel/src/resources/"
           "org/apache/lucene/analysis/pl/stemmer_20000.tbl")
_JA_STOPTAGS = ("/root/reference/lucene/analysis/kuromoji/src/resources/"
                "org/apache/lucene/analysis/ja/stoptags.txt")

pl_mounted = pytest.mark.skipif(
    not os.path.exists(_PL_TBL), reason="reference stempel table absent")
tags_mounted = pytest.mark.skipif(
    not os.path.exists(_JA_STOPTAGS), reason="reference stoptags absent")


@pl_mounted
def test_real_stempel_table_stems():
    """The REAL 2.2MB egothor stemmer table loads (MultiTrie2), the
    byte serializer round-trips it, and the stems the reference's own
    TestPolishAnalyzer asserts (studenta/studenci → student) come out of
    the full chain with the real stopword file (był stopped)."""
    from lucene_spark.analysis.stempel import (
        load_stemmer_table, polish_analyze, save_stemmer_table,
        stempel_stem,
    )

    with open(_PL_TBL, "rb") as fh:
        raw = fh.read()
    table = load_stemmer_table(raw)
    assert type(table).__name__ == "MultiTrie2"
    assert stempel_stem("studenta", table) == "student"
    assert stempel_stem("studenci", table) == "student"
    assert stempel_stem("kotem", table) == "kot"
    assert stempel_stem("domami", table) == "dom"
    # byte round-trip through this repo's serializer
    t2 = load_stemmer_table(save_stemmer_table(table))
    assert stempel_stem("studenci", t2) == "student"
    stop = set()
    stops_path = os.path.join(os.path.dirname(_PL_TBL), "stopwords.txt")
    with open(stops_path, encoding="utf-8") as fh:
        for line in fh:
            w = line.split("|")[0].strip()
            if w:
                stop.add(w)
    toks = [t.term for t in polish_analyze(
        "studenta studenci był", stopwords=frozenset(stop), table=table)]
    assert toks == ["student", "student"]


@tags_mounted
def test_default_stop_tags_match_reference_file():
    """ja.DEFAULT_STOP_TAGS is exactly the active entry set of the
    reference's default stoptags.txt (JapaneseAnalyzer's default)."""
    from lucene_spark.analysis.ja import DEFAULT_STOP_TAGS

    want = set()
    with open(_JA_STOPTAGS, encoding="utf-8") as fh:
        for line in fh:
            tag = line.split("#")[0].strip()
            if tag:
                want.add(tag)
    assert DEFAULT_STOP_TAGS == frozenset(want)
