"""SmartChineseAnalyzer analog (analysis/smartcn.py): HHMM word graph +
bigram-Viterbi shortest path, SegTokenFilter normalization, and the raw
ICTCLAS .dct little-endian format loaders. Demo dictionaries (made-up
frequencies) are the fixture; format fidelity is pinned by byte-level
round-trips. The exact-value BM25 gate is smartcn_index in test_gate.py."""

import os

import pytest

from lucene_spark.analysis.smartcn import (
    build_demo_dicts,
    hhmm_segment,
    load_bigram_dct,
    load_dicts_dir,
    load_word_dct,
    save_bigram_dct,
    save_word_dct,
    smart_chinese_analyze,
)


def terms(toks):
    return [t.term for t in toks]


# --- segmentation vectors -------------------------------------------------


def test_dictionary_words_beat_char_splits():
    # 北京(40000)+大学(45000) — two high-freq dictionary words win over
    # four single chars (each absent/low-freq → much larger -log weights)
    assert [t[0] for t in hhmm_segment("北京大学")] == ["北京", "大学"]
    # the 7-char compound is itself a dictionary word: one edge beats any
    # split despite lower unigram frequency (fewer -log terms)
    assert [t[0] for t in hhmm_segment("中华人民共和国")] == ["中华人民共和国"]


def test_unknown_hanzi_fall_to_single_chars():
    # 的 is not in the demo dict: it segments as a single char between
    # dictionary words
    got = [t[0] for t in hhmm_segment("北京大学的学生")]
    assert got == ["北京", "大学", "的", "学生"]


def test_letter_and_digit_runs_restore_span():
    toks = smart_chinese_analyze("我们在Spark上工作123次。")
    assert terms(toks) == ["我们", "在", "spark", "上", "工作", "123", "次"]
    # offsets point at the original spans
    spark_tok = [t for t in toks if t.term == "spark"][0]
    assert (spark_tok.start, spark_tok.end) == (3, 8)


def test_delimiter_drop_and_position_gap():
    toks = smart_chinese_analyze("搜索引擎，技术新闻")
    assert [(t.term, t.position) for t in toks] == [
        ("搜索", 0), ("引擎", 1), ("技术", 3), ("新闻", 4),
    ]
    kept = smart_chinese_analyze("搜索引擎，技术新闻", keep_delimiters=True)
    assert [t.term for t in kept] == ["搜索", "引擎", ",", "技术", "新闻"]


def test_fullwidth_and_porter():
    # fullwidth letters fold to halfwidth + lowercase (SegTokenFilter),
    # then the chain's PorterStemFilter applies to latin tokens
    toks = smart_chinese_analyze("ＲＵＮＮＩＮＧ")
    assert terms(toks) == ["run"]
    toks2 = smart_chinese_analyze("１２３")
    assert terms(toks2) == ["123"]


def test_stopwords_gap():
    toks = smart_chinese_analyze("北京大学的学生", stopwords=frozenset({"的"}))
    assert [(t.term, t.position) for t in toks] == [
        ("北京", 0), ("大学", 1), ("学生", 3),
    ]


def test_bigram_steers_the_path():
    """搜索引擎 has the bigram 搜索@引擎 (1200): the two-word path's middle
    edge is much cheaper than any char-crossing alternative; both words
    exist only as whole entries so the segmentation is exact."""
    assert [t[0] for t in hhmm_segment("搜索引擎")] == ["搜索", "引擎"]


def test_empty_and_space():
    assert smart_chinese_analyze("") == []
    assert terms(smart_chinese_analyze("   ")) == []


# --- .dct format round-trips ---------------------------------------------


def test_dct_roundtrip(tmp_path):
    w, b = build_demo_dicts()
    save_word_dct(w, str(tmp_path / "coredict.dct"))
    save_bigram_dct(b, str(tmp_path / "bigramdict.dct"))
    w2 = load_word_dct(str(tmp_path / "coredict.dct"))
    b2 = load_bigram_dct(str(tmp_path / "bigramdict.dct"))
    assert w2 == w
    assert b2 == b
    # directory loader
    w3, b3 = load_dicts_dir(str(tmp_path))
    assert w3 == w and b3 == b


def test_dct_loader_missing_files(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dicts_dir(str(tmp_path))


def test_user_dicts_drive_segmentation(tmp_path):
    """A user-mounted .dct pair replaces the demo dictionaries end to
    end: a custom word unknown to the demo dict segments whole."""
    w, b = build_demo_dicts()
    w["电脑"] = 50000
    save_word_dct(w, str(tmp_path / "coredict.dct"))
    save_bigram_dct(b, str(tmp_path / "bigramdict.dct"))
    dicts = load_dicts_dir(str(tmp_path))
    # demo dict: 电/脑 unknown singles; user dict: one word
    assert [t[0] for t in hhmm_segment("电脑")] == ["电", "脑"]
    assert [t[0] for t in hhmm_segment("电脑", dicts)] == ["电脑"]
    toks = smart_chinese_analyze("电脑工作", dicts=(dicts[0], dicts[1]))
    assert terms(toks) == ["电脑", "工作"]
