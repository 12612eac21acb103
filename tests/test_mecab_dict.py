"""MeCab dictionary-format loaders (analysis/mecab.py).

The fixture dictionaries below are HAND-WRITTEN instances of the public
MeCab formats (entry CSV / matrix.def / char.def / unk.def) with made-up
costs — no IPADIC / mecab-ko-dic data is copied. Segmentations are
checked against hand-computed cheapest lattice paths, so the loader +
lattice round trip is verified end to end through the same
``japanese_analyze(mdict=...)`` / ``korean_analyze(mdict=...)`` entry
points a user with a real mounted dictionary would call.
"""

import pytest

from lucene_spark.analysis.ja import japanese_analyze
from lucene_spark.analysis.ko import korean_analyze
from lucene_spark.analysis.mecab import (
    load_mecab_dict,
    parse_char_def,
    parse_entries_csv,
    parse_matrix_def,
    parse_unk_def,
    split_csv,
)

# --- fixture dictionary (ja, IPADIC 13-field layout) ----------------------
# context ids: 0=BOS/EOS, 1=noun, 2=particle, 3=verb, 4=aux

JA_ENTRIES = """\
東京,1,1,3000,名詞,固有名詞,地域,一般,*,*,*,トウキョウ,トーキョー
京都,1,1,3000,名詞,固有名詞,地域,一般,*,*,*,キョウト,キョート
東京都,1,1,2500,名詞,固有名詞,地域,一般,*,*,*,トウキョウト,トーキョート
都,1,1,4000,名詞,接尾,地域,*,*,*,*,ト,ト
に,2,2,500,助詞,格助詞,一般,*,*,*,*,ニ,ニ
住む,3,3,4000,動詞,自立,*,*,五段・マ行,基本形,住む,スム,スム
住ん,3,3,4500,動詞,自立,*,*,五段・マ行,連用タ接続,住む,スン,スン
だ,4,4,800,助動詞,*,*,*,特殊・ダ,基本形,だ,ダ,ダ
"何,か",1,1,6000,名詞,一般,*,*,*,*,*,ナニカ,ナニカ
"""

JA_MATRIX_CHEAP = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 0), (3, 0), (2, 1),
]


def _ja_matrix() -> str:
    lines = ["5 5"]
    for r in range(5):
        for l in range(5):  # noqa: E741
            lines.append(f"{r} {l} {0 if (r, l) in JA_MATRIX_CHEAP else 1000}")
    return "\n".join(lines) + "\n"


JA_CHAR_DEF = """\
# hand-written char.def instance
DEFAULT\t0 1 0
KANJI\t0 0 2
HIRAGANA\t0 1 2
KATAKANA\t1 1 2
ALPHA\t1 1 0
NUMERIC\t1 1 0
0x3041..0x3096 HIRAGANA
0x30A1..0x30FC KATAKANA
0x4E00..0x9FFF KANJI
0x0041..0x005A ALPHA
0x0061..0x007A ALPHA
0x0030..0x0039 NUMERIC  # ascii digits
"""

JA_UNK_DEF = """\
DEFAULT,9,9,12000,記号,一般,*,*,*,*,*
KANJI,9,9,11000,名詞,一般,*,*,*,*,*
HIRAGANA,9,9,12000,名詞,一般,*,*,*,*,*
KATAKANA,9,9,9000,名詞,一般,*,*,*,*,*
ALPHA,9,9,9000,名詞,一般,*,*,*,*,*
NUMERIC,9,9,9000,名詞,数,*,*,*,*,*
"""


@pytest.fixture(scope="module")
def ja_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ipadic_fixture")
    (d / "entries.csv").write_text(JA_ENTRIES, encoding="utf-8")
    (d / "matrix.def").write_text(_ja_matrix(), encoding="utf-8")
    (d / "char.def").write_text(JA_CHAR_DEF, encoding="utf-8")
    (d / "unk.def").write_text(JA_UNK_DEF, encoding="utf-8")
    return str(d)


# --- unit: format parsers -------------------------------------------------


def test_split_csv_quotes():
    assert split_csv('a,"b,c",d') == ["a", "b,c", "d"]
    assert split_csv('"x""y",z') == ['x"y', "z"]
    assert split_csv("plain,row") == ["plain", "row"]


def test_parse_matrix_def():
    conn = parse_matrix_def(["2 2", "0 0 10", "0 1 -20", "1 0 30", "1 1 0"])
    assert conn[(0, 1)] == -20 and conn[(1, 0)] == 30
    with pytest.raises(ValueError):
        parse_matrix_def(["2 2", "2 0 5"])  # id out of range
    with pytest.raises(ValueError):
        parse_matrix_def([])


def test_parse_char_def():
    cats, ranges = parse_char_def(JA_CHAR_DEF.splitlines())
    assert cats["KANJI"] == (False, False, 2)
    assert cats["KATAKANA"] == (True, True, 2)
    assert cats["DEFAULT"] == (False, True, 0)
    assert (0x4E00, 0x9FFF, "KANJI") in ranges
    # comment after a mapping is stripped
    assert (0x30, 0x39, "NUMERIC") in ranges
    with pytest.raises(ValueError):
        parse_char_def(["KANJI 0 0 2"])  # no DEFAULT
    with pytest.raises(ValueError):
        parse_char_def(["DEFAULT 0 1 0", "0x1000..0x1001 NOSUCH"])


def test_parse_unk_def():
    unk = parse_unk_def(JA_UNK_DEF.splitlines())
    assert unk["KATAKANA"] == ((9, 9, 9000, "名詞-一般"),)
    assert unk["NUMERIC"][0][3] == "名詞-数"


def test_parse_unk_def_keeps_every_row_per_category():
    # kuromoji UnknownDictionaryBuilder keeps every row; order preserved,
    # exact duplicates collapsed
    unk = parse_unk_def([
        "ALPHA,4,4,9000,名詞,一般,*,*,*,*,*",
        "ALPHA,5,5,9500,記号,アルファベット,*,*,*,*,*",
        "ALPHA,4,4,9000,名詞,一般,*,*,*,*,*",
        "DEFAULT,9,9,12000,記号,一般,*,*,*,*,*",
    ])
    assert unk["ALPHA"] == (
        (4, 4, 9000, "名詞-一般"), (5, 5, 9500, "記号-アルファベット"),
    )


def test_parse_entries_ipadic():
    es = parse_entries_csv(JA_ENTRIES.splitlines(), fmt="ipadic")
    by_surface = {e.surface: e for e in es}
    e = by_surface["住ん"]
    assert (e.left_id, e.right_id, e.cost) == (3, 3, 4500)
    assert e.attrs["pos"] == "動詞-自立"
    assert e.attrs["base"] == "住む"
    assert e.attrs["reading"] == "スン"
    # baseform '*' → no base attr; quoted comma surface survives
    assert "base" not in by_surface["東京都"].attrs
    assert "何,か" in by_surface


# --- end-to-end: loaded dictionary drives the ja chain --------------------


def test_ja_loaded_dict_cheapest_path(ja_dir):
    d = load_mecab_dict(ja_dir, fmt="ipadic")
    # 東京都に住んだ: 東京都(2500) に(500) 住ん(4500→base 住む) だ(800)
    # over cheap transitions = 8300; the split 東京+都 pays 3000+1000+4000
    # = 8000 for the same span vs 2500, so the compound wins. Particles
    # (助詞) and aux (助動詞) are POS-stopped by the default stop tags.
    toks = japanese_analyze("東京都に住んだ", mdict=d)
    assert [t.term for t in toks] == ["東京都", "住む"]
    assert [t.position for t in toks] == [0, 2]
    # forcing the compound out: 東京 then 都 via noun→noun
    toks2 = japanese_analyze("京都に住む", mdict=d)
    assert [t.term for t in toks2] == ["京都", "住む"]


def test_ja_loaded_dict_unknowns(ja_dir):
    d = load_mecab_dict(ja_dir, fmt="ipadic")
    # katakana run is not in the lexicon: KATAKANA invoke=1 group=1 →
    # one grouped unknown (run NOT capped by LENGTH=2), then the
    # katakana stem filter drops a trailing ー on len>=4
    toks = japanese_analyze("グーグルー", mdict=d)
    assert [t.term for t in toks] == ["グーグル"]
    # ascii alpha run groups too
    toks2 = japanese_analyze("東京都のspark", mdict=d)
    assert "spark" in [t.term for t in toks2]


def test_load_missing_files(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_mecab_dict(str(tmp_path), fmt="ipadic")


# --- fixture dictionary (ko, mecab-ko-dic 12-field layout) ----------------
# context ids: 0=BOS/EOS, 1=noun, 2=josa, 3=verb

KO_ENTRIES = """\
학교,1,1,3000,NNG,*,T,학교,*,*,*,*
국제,1,1,3000,NNG,*,T,국제,*,*,*,*
공항,1,1,3000,NNG,*,T,공항,*,*,*,*
국제공항,1,1,2500,NNG,*,T,국제공항,Compound,*,*,국제/NNG/*+공항/NNG/*
에,2,2,500,JKB,*,F,에,*,*,*,*
가다,3,3,4000,VV,*,F,가다,*,*,*,*
漢字,1,1,3500,NNG,*,T,한자,*,*,*,*
"""

KO_MATRIX_CHEAP = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 0), (2, 1)]


def _ko_matrix() -> str:
    lines = ["4 4"]
    for r in range(4):
        for l in range(4):  # noqa: E741
            lines.append(f"{r} {l} {0 if (r, l) in KO_MATRIX_CHEAP else 1000}")
    return "\n".join(lines) + "\n"


KO_CHAR_DEF = """\
DEFAULT 0 1 0
HANGUL 0 1 0
HANJA 0 0 2
ALPHA 1 1 0
0xAC00..0xD7A3 HANGUL
0x4E00..0x9FFF HANJA
0x0041..0x005A ALPHA
0x0061..0x007A ALPHA
"""

KO_UNK_DEF = """\
DEFAULT,9,9,12000,UNKNOWN,*,*,*,*,*,*
HANGUL,9,9,11000,UNKNOWN,*,*,*,*,*,*
HANJA,9,9,11000,SH,*,*,*,*,*,*
ALPHA,9,9,9000,SL,*,*,*,*,*,*
"""


@pytest.fixture(scope="module")
def ko_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mecab_ko_fixture")
    (d / "entries.csv").write_text(KO_ENTRIES, encoding="utf-8")
    (d / "matrix.def").write_text(_ko_matrix(), encoding="utf-8")
    (d / "char.def").write_text(KO_CHAR_DEF, encoding="utf-8")
    (d / "unk.def").write_text(KO_UNK_DEF, encoding="utf-8")
    return str(d)


def test_parse_entries_ko_expression():
    es = parse_entries_csv(KO_ENTRIES.splitlines(), fmt="ko")
    by_surface = {e.surface: e for e in es}
    c = by_surface["국제공항"]
    assert c.segmentation == (
        ("국제", {"pos": "NNG"}), ("공항", {"pos": "NNG"})
    )
    assert by_surface["학교"].segmentation is None
    assert by_surface["漢字"].attrs["reading"] == "한자"


def test_ko_loaded_dict_decompound_and_reading(ko_dir):
    d = load_mecab_dict(ko_dir, fmt="ko")
    # compound 국제공항(2500) beats 국제+공항 (3000+1000+3000); DISCARD
    # emits the parts; 에 (JKB) is POS-stopped
    toks = korean_analyze("국제공항에 가다", mdict=d)
    assert [t.term for t in toks] == ["국제", "공항", "가다"]
    # MIXED stacks the compound at the first part's position
    toks_m = korean_analyze("국제공항에 가다", mdict=d, decompound="mixed")
    assert [t.term for t in toks_m] == ["국제공항", "국제", "공항", "가다"]
    assert toks_m[0].position == toks_m[1].position
    # Hanja surface → Hangul reading (KoreanReadingFormFilter)
    toks_h = korean_analyze("漢字", mdict=d)
    assert [t.term for t in toks_h] == ["한자"]


def test_ko_loaded_dict_unknown_hangul_run(ko_dir):
    d = load_mecab_dict(ko_dir, fmt="ko")
    toks = korean_analyze("위키백과", mdict=d)  # not in the lexicon
    assert [t.term for t in toks] == ["위키백과"]


# --- multi-template unknown words (kuromoji keeps every unk.def row) ------

MT_ENTRIES = "の,2,2,500,助詞,格助詞,*,*,*,*,*,ノ,ノ\n"

MT_CHAR_DEF = """\
DEFAULT 0 1 0
ALPHA 1 1 0
0x0061..0x007A ALPHA
"""

MT_UNK_DEF = """\
DEFAULT,1,1,12000,記号,一般,*,*,*,*,*
ALPHA,4,4,9000,名詞,一般,*,*,*,*,*
ALPHA,5,5,9500,記号,アルファベット,*,*,*,*,*
"""


def _mt_matrix(conn42: int, conn52: int) -> str:
    # 6x6, default 1000; BOS→both templates free; particle→EOS free;
    # the (template right_id → の left_id 2) edges are the experiment knob
    special = {(0, 4): 0, (0, 5): 0, (2, 0): 0, (4, 2): conn42,
               (5, 2): conn52}
    lines = ["6 6"]
    for r in range(6):
        for l in range(6):  # noqa: E741
            lines.append(f"{r} {l} {special.get((r, l), 1000)}")
    return "\n".join(lines) + "\n"


def _mt_dir(tmp_path, conn42: int, conn52: int) -> str:
    d = tmp_path / f"mt_{conn42}_{conn52}"
    d.mkdir()
    (d / "entries.csv").write_text(MT_ENTRIES, encoding="utf-8")
    (d / "matrix.def").write_text(_mt_matrix(conn42, conn52),
                                  encoding="utf-8")
    (d / "char.def").write_text(MT_CHAR_DEF, encoding="utf-8")
    (d / "unk.def").write_text(MT_UNK_DEF, encoding="utf-8")
    return str(d)


def test_unknown_template_chosen_by_context(tmp_path):
    """Hand-computed: over "abcの" the ALPHA run "abc" has TWO unk.def
    templates — T1 (left/right 4, cost 9000, 名詞-一般) and T2
    (left/right 5, cost 9500, 記号-アルファベット).

    With conn(4,2)=2000, conn(5,2)=0:
      T1 path: conn(0,4)=0 + 9000 + conn(4,2)=2000 + 500 + conn(2,0)=0
             = 11500
      T2 path: conn(0,5)=0 + 9500 + conn(5,2)=0    + 500 + 0 = 10000
    → the lattice must pick the HIGHER-word-cost T2 for its cheaper
    connection (first-row-only would pick T1)."""
    from lucene_spark.analysis.lattice import viterbi_segment

    d = load_mecab_dict(_mt_dir(tmp_path, 2000, 0), fmt="ipadic")
    segs = viterbi_segment("abcの", d)
    assert [(s.surface, s.pos) for s in segs] == [
        ("abc", "記号-アルファベット"), ("の", "助詞-格助詞"),
    ]


def test_unknown_template_first_row_when_connections_flip(tmp_path):
    # flip the knob: conn(4,2)=0, conn(5,2)=2000 → T1 wins
    # (9000+0 = 9000 < 9500+2000 = 11500 before the shared の tail)
    from lucene_spark.analysis.lattice import viterbi_segment

    d = load_mecab_dict(_mt_dir(tmp_path, 0, 2000), fmt="ipadic")
    segs = viterbi_segment("abcの", d)
    assert [(s.surface, s.pos) for s in segs] == [
        ("abc", "名詞-一般"), ("の", "助詞-格助詞"),
    ]


def test_char_def_compat_categories_and_nakaguro(tmp_path):
    """Compat-category lists keep the primary (matching the reference's
    split(' ')[0], CharacterDefinitionWriter.java:61); the Nakaguro
    codepoint 0x30FB is forced to SYMBOL when the dictionary defines a
    SYMBOL class (the builder's override at :65-68)."""
    cats, ranges = parse_char_def([
        "DEFAULT 0 1 0",
        "SYMBOL 1 1 0",
        "KANJI 0 0 2",
        "KANJINUMERIC 1 1 0",
        "0x3007 SYMBOL KANJI KANJINUMERIC",  # compat list → SYMBOL
        "0x30FB KANJINUMERIC",               # mapped away, but overridden
        "0x4E00..0x9FFF KANJI",
    ])
    assert (0x3007, 0x3007, "SYMBOL") in ranges
    d = tmp_path / "compat"
    d.mkdir()
    (d / "entries.csv").write_text(
        "の,1,1,500,助詞,格助詞,*,*,*,*,*,ノ,ノ\n", encoding="utf-8")
    (d / "matrix.def").write_text("2 2\n0 0 0\n0 1 0\n1 0 0\n1 1 0\n",
                                  encoding="utf-8")
    (d / "char.def").write_text(
        "DEFAULT 0 1 0\nSYMBOL 1 1 0\nKANJINUMERIC 1 1 0\n"
        "0x30FB KANJINUMERIC\n", encoding="utf-8")
    (d / "unk.def").write_text(
        "DEFAULT,1,1,12000,記号,一般,*,*,*,*,*\n"
        "SYMBOL,1,1,9000,記号,一般,*,*,*,*,*\n"
        "KANJINUMERIC,1,1,9000,名詞,数,*,*,*,*,*\n", encoding="utf-8")
    md = load_mecab_dict(str(d), fmt="ipadic")
    assert md.char_class("・").name == "SYMBOL"
