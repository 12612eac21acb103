"""JapaneseTokenizer EXTENDED mode and n-best output (ja/ViterbiNBest).

Hand-computed against the demo lexicon's published costs (analysis/ja.py):
形態=3000, 素=3000, 形態素=5500, conn BOS→N=0, N→N=1800, N→EOS=0;
SEARCH penalty (ViterbiNBest.java:82-106): all-kanji token len>2 pays
(len−2)·3000.
"""

from lucene_spark.analysis.ja import japanese_analyze
from lucene_spark.analysis.lattice import nbest_words
from lucene_spark.analysis.ja import build_ja_dict, _search_penalty


def test_extended_mode_unknown_unigrams():
    # katakana run is an unknown grouped word; EXTENDED splits it into
    # character unigrams (Mode.EXTENDED), each advancing the position
    toks = japanese_analyze("グーグル", mode="extended")
    assert [t.term for t in toks] == ["グ", "ー", "グ", "ル"]
    assert [t.position for t in toks] == [0, 1, 2, 3]
    # dictionary words are untouched by EXTENDED
    toks2 = japanese_analyze("東京", mode="extended")
    assert [t.term for t in toks2] == ["東京"]


def test_extended_rejects_bad_mode():
    import pytest

    with pytest.raises(ValueError):
        japanese_analyze("東京", mode="bogus")


def test_nbest_words_totals():
    """SEARCH mode: 形態+素 costs 0+3000+1800+3000+0 = 7800; the compound
    形態素 pays the all-kanji penalty (3−2)·3000 on top of 5500 ⇒ 8500.
    nbest within 700 must include both; within 100 only the split."""
    d = build_ja_dict()
    pen = _search_penalty("形態素")
    within_700 = nbest_words("形態素", d, 700, penalty=pen)
    surfaces = {(s.surface, on_best) for (s, on_best) in within_700}
    assert ("形態", True) in surfaces and ("素", True) in surfaces
    assert ("形態素", False) in surfaces
    within_100 = nbest_words("形態素", d, 100, penalty=pen)
    assert {s.surface for (s, _b) in within_100} == {"形態", "素"}


def test_nbest_cost_stacks_compound():
    toks = japanese_analyze("形態素", nbest_cost=700)
    by_term = {t.term: t.position for t in toks}
    assert by_term["形態"] == 0 and by_term["素"] == 1
    # the off-best-path compound stacks at the covering position 0
    assert by_term["形態素"] == 0
    toks2 = japanese_analyze("形態素", nbest_cost=100)
    assert sorted(t.term for t in toks2) == ["形態", "素"]


def test_nbest_normal_mode_inverts_preference():
    """NORMAL mode has no penalty: the compound (5500) beats the split
    (7800); nbest within 2300 surfaces the split parts as extras."""
    toks = japanese_analyze("形態素", mode="normal", nbest_cost=2300)
    by_term = {t.term: t.position for t in toks}
    assert by_term["形態素"] == 0
    assert by_term["形態"] == 0  # stacked at the covering position
    assert by_term["素"] == 0


def test_kanji_two_char_unknown_candidate():
    """char.def "KANJI 0 0 2": a 2-char kanji unknown candidate competes
    with two 1-char candidates. Demo classes: KANJI cost 11000, unk↔unk
    conn 2000 — 2-char candidate (11000 once) beats 1+1 (22000+2000), so
    an unknown kanji pair is ONE token; a same-class triple splits 1+2
    (equal-cost tie: the first-relaxed path wins deterministically)."""
    toks = japanese_analyze("鰻丼", mode="normal")
    assert [t.term for t in toks] == ["鰻丼"]
    toks3 = japanese_analyze("鰻丼鮨", mode="normal")
    assert [t.term for t in toks3] == ["鰻", "丼鮨"]
    # class boundary stops the multi-length candidate: kanji + hiragana
    toks_mix = japanese_analyze("鰻を", mode="normal")
    assert [t.term for t in toks_mix] == ["鰻"]  # を is a particle (stopped)
