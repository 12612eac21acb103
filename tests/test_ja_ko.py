"""Kuromoji/nori analog tests: Viterbi lattice, mode penalties, user
dictionaries, decompound modes, reading form, katakana stem, POS stops."""

from lucene_spark.analysis.ja import (
    japanese_analyze,
    parse_user_dict,
)
from lucene_spark.analysis.ko import (
    korean_analyze,
    parse_user_dict_ko,
)
from lucene_spark.analysis.lattice import (
    CharClass,
    DictEntry,
    MorphDict,
    viterbi_segment,
)


def terms(toks):
    return [t.term for t in toks]


def pos_terms(toks):
    return [(t.term, t.position) for t in toks]


# --- lattice core ------------------------------------------------------------


def _tiny_dict():
    classes = [CharClass("DEFAULT", False, True, 16, 8, 8, 10000, "UNK")]
    entries = [
        DictEntry("ab", 1, 1, 100, {"pos": "A"}),
        DictEntry("abc", 1, 1, 350, {"pos": "A"}),
        DictEntry("c", 1, 1, 100, {"pos": "A"}),
        DictEntry("cd", 1, 1, 100, {"pos": "A"}),
    ]
    conn = {(0, 1): 0, (1, 1): 50, (1, 0): 0, (8, 1): 0, (1, 8): 0, (8, 0): 0, (0, 8): 0, (8, 8): 0}
    return MorphDict(entries, conn, classes, lambda ch: "DEFAULT")


def test_lattice_picks_cheapest_path():
    d = _tiny_dict()
    # "abcd": ab+cd = 100+50+100 = 250; abc+? (no 'd' entry: unknown 10000)
    segs = viterbi_segment("abcd", d)
    assert [s.surface for s in segs] == ["ab", "cd"]


def test_lattice_connection_cost_tips_the_path():
    classes = [CharClass("DEFAULT", False, True, 16, 8, 8, 10000, "UNK")]
    entries = [
        DictEntry("ab", 1, 1, 100, {"pos": "A"}),
        DictEntry("c", 2, 2, 100, {"pos": "A"}),
        DictEntry("abc", 1, 1, 150, {"pos": "A"}),
    ]
    # make 1->2 transitions expensive: ab+c = 100+900+100 > abc = 150
    conn = {(0, 1): 0, (1, 2): 900, (1, 0): 0, (2, 0): 0}
    d = MorphDict(entries, conn, classes, lambda ch: "DEFAULT", default_conn=0)
    segs = viterbi_segment("abc", d)
    assert [s.surface for s in segs] == ["abc"]


def test_lattice_unknown_grouping_and_cap():
    d = _tiny_dict()
    segs = viterbi_segment("xxxxx", d)
    assert [s.surface for s in segs] == ["xxxxx"]
    assert segs[0].entry is None and segs[0].pos == "UNK"


# --- Japanese ----------------------------------------------------------------


def test_ja_basic_segmentation_and_baseform():
    # 行った is an inflected dict entry whose baseform is 行く
    assert terms(japanese_analyze("東京大学に行った")) == ["東京", "大学", "行く"]


def test_ja_particles_pos_stopped_with_position_gap():
    got = pos_terms(japanese_analyze("日本経済新聞を読んだ"))
    # を sits at position 3 (gap), 読んだ -> baseform 読む at position 4
    assert got == [("日本", 0), ("経済", 1), ("新聞", 2), ("読む", 4)]


def test_ja_search_mode_splits_compound_normal_keeps_it():
    # ViterbiNBest.computePenalty: all-kanji len 3 pays (3-2)*3000, which
    # makes the 形態+素 split cheaper in SEARCH mode only
    assert terms(japanese_analyze("形態素解析", mode="search")) == [
        "形態", "素", "解析"
    ]
    assert terms(japanese_analyze("形態素解析", mode="normal")) == [
        "形態素", "解析"
    ]


def test_ja_katakana_stem_strips_prolonged_mark():
    # JapaneseKatakanaStemFilter: len >= 4 all-katakana drops trailing ー
    assert terms(japanese_analyze("コンピューター")) == ["コンピュータ"]
    # 3-char katakana keeps its mark (below DEFAULT_MINIMUM_LENGTH)
    assert terms(japanese_analyze("キー")) == ["キー"]


def test_ja_unknown_classes():
    got = terms(japanese_analyze("Pythonで10件を検索"))
    assert got == ["python", "10", "件", "検索"]


def test_ja_user_dictionary_segments_and_wins():
    ud = parse_user_dict(
        ["関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞"]
    )
    got = japanese_analyze("関西国際空港へ行く", user_dict=ud)
    assert terms(got) == ["関西", "国際", "空港", "行く"]
    assert got[0].type == "カスタム名詞"
    # offsets are the parts' real character spans
    assert (got[0].start, got[0].end) == (0, 2)
    assert (got[2].start, got[2].end) == (4, 6)


def test_ja_user_dict_rejects_bad_segmentation():
    import pytest

    with pytest.raises(ValueError):
        parse_user_dict(["関西空港,関西 国際 空港,,名詞"])


def test_ja_stopwords_drop_after_baseform_and_lowercase():
    got = terms(japanese_analyze("東京大学に行った", stopwords=frozenset({"行く"})))
    assert got == ["東京", "大学"]


def test_ja_punctuation_discarded_no_gap():
    # discardPunctuation=true: 。 drops without a position gap
    got = pos_terms(japanese_analyze("東京。大学"))
    assert got == [("東京", 0), ("大学", 1)]


def test_ja_width_fold_applies():
    # full-width ASCII folds before the lattice (CJKWidthCharFilter)
    assert terms(japanese_analyze("Ｐｙｔｈｏｎで検索")) == ["python", "検索"]


# --- Korean ------------------------------------------------------------------


def test_ko_basic_and_josa_stopped():
    got = pos_terms(korean_analyze("학교에서 언어를 분석했다"))
    assert got == [("학교", 0), ("언어", 2), ("분석", 4), ("했다", 5)]


def test_ko_decompound_discard_default():
    assert terms(korean_analyze("국제공항에 갔다")) == ["국제", "공항", "갔다"]


def test_ko_decompound_mixed_stacks_compound():
    got = pos_terms(korean_analyze("국제공항에 갔다", decompound="mixed"))
    # compound at the first part's position (posIncrement 0 stack)
    assert got == [("국제공항", 0), ("국제", 0), ("공항", 1), ("갔다", 3)]


def test_ko_decompound_none_keeps_compound():
    assert terms(korean_analyze("국제공항에 갔다", decompound="none")) == [
        "국제공항", "갔다"
    ]


def test_ko_reading_form_hanja_to_hangul():
    assert terms(korean_analyze("漢字를 읽었다")) == ["한자", "읽었다"]


def test_ko_unknown_hangul_groups():
    got = korean_analyze("서울은 한국의 수도")
    assert terms(got) == ["서울", "한국", "수도"]
    assert got[-1].type == "UNKNOWN"


def test_ko_user_dictionary():
    ud = parse_user_dict_ko(["데이터베이스,데이터 베이스,,NNG"])
    assert terms(korean_analyze("데이터베이스를 봤다", user_dict=ud)) == [
        "데이터", "베이스", "봤다"
    ]


def test_ko_alpha_numeric_unknowns():
    assert terms(korean_analyze("Python으로 검색했다")) == [
        "python", "검색", "했다"
    ]


def test_ko_invalid_mode_raises():
    import pytest

    with pytest.raises(ValueError):
        korean_analyze("학교", decompound="bogus")


# --- build-path registration (vectorized batch == per-doc chain) -------------


def test_batch_lane_matches_per_document_chain():
    from lucene_spark.analysis.vectorized import analyze_batch

    texts = [
        "東京大学に行った",
        "日本経済新聞を読んだ",
        "コンピューターで形態素解析をします",
        "",
        None,
    ]
    bt = analyze_batch(texts, analyzer="japanese")
    per_doc = {}
    for di, t in enumerate(texts):
        for tok in japanese_analyze(t or ""):
            per_doc.setdefault(di, []).append((tok.term, tok.position))
    got = {}
    for code, di, p in zip(bt.codes, bt.docids, bt.positions):
        got.setdefault(int(di), []).append((bt.uniques[int(code)], int(p)))
    for di in got:
        got[di].sort(key=lambda x: x[1])
    assert got == per_doc


def test_batch_lane_korean():
    from lucene_spark.analysis.vectorized import analyze_batch

    texts = ["국제공항에 갔다", "학교에서 언어를 분석했다"]
    bt = analyze_batch(texts, analyzer="korean")
    per_doc = {}
    for di, t in enumerate(texts):
        for tok in korean_analyze(t):
            per_doc.setdefault(di, []).append((tok.term, tok.position))
    got = {}
    for code, di, p in zip(bt.codes, bt.docids, bt.positions):
        got.setdefault(int(di), []).append((bt.uniques[int(code)], int(p)))
    for di in got:
        got[di].sort(key=lambda x: x[1])
    assert got == per_doc
