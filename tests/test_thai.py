"""Thai analyzer (analysis/th.py) — maximal-matching segmentation over a
wordlist (the rule-based fallback for th/ThaiTokenizer.java's
dictionary BreakIterator), DecimalDigitFilter, stop handling, and the
user-wordlist loader. The exact-value BM25 gate is thai_index in
test_gate.py."""

from lucene_spark.analysis.th import (
    DEMO_WORDLIST,
    thai_analyze,
    thai_terms_positions,
    thai_wordlist,
)


def test_longest_match_wins():
    # หนังสือพิมพ์ (newspaper) is in the lexicon along with its parts
    # หนังสือ + พิมพ์ — maximal matching keeps the longest
    assert [t.term for t in thai_analyze("หนังสือพิมพ์")] == ["หนังสือพิมพ์"]
    assert [t.term for t in thai_analyze("สนามบิน")] == ["สนามบิน"]
    # concatenated words split at dictionary boundaries (no spaces)
    assert [t.term for t in thai_analyze("เศรษฐกิจสนามบินทำงาน")] == [
        "เศรษฐกิจ", "สนามบิน", "ทำงาน",
    ]


def test_unknown_run_groups():
    # chars with no dictionary match group into ONE token between matches
    toks = [t.term for t in thai_analyze("ภาษาฦๅฦๅไทย")]
    assert toks == ["ภาษา", "ฦๅฦๅ", "ไทย"]


def test_mixed_script_and_digits():
    terms, poss = thai_terms_positions("ภาษาไทย และ ๑๒๓ spark")
    assert terms == ["ภาษา", "ไทย", "และ", "123", "spark"]
    assert poss == [0, 1, 2, 3, 4]
    # ascii text alone runs the standard chain
    assert thai_terms_positions("Hello World")[0] == ["hello", "world"]


def test_stopwords_gap():
    toks = thai_analyze("ภาษาและไทย", stopwords=frozenset({"และ"}))
    assert [t.term for t in toks] == ["ภาษา", "ไทย"]
    assert [t.position for t in toks] == [0, 2]  # stop advances position


def test_offsets():
    toks = thai_analyze("เศรษฐกิจสนามบิน")
    assert (toks[0].start, toks[0].end) == (0, len("เศรษฐกิจ"))
    assert toks[1].start == len("เศรษฐกิจ")


def test_user_wordlist_loader():
    wl = thai_wordlist(["# comment", "กรุงเทพ", "", "มหานคร"])
    assert wl == frozenset({"กรุงเทพ", "มหานคร"})
    toks = [t.term for t in thai_analyze("กรุงเทพมหานคร", wordlist=wl)]
    assert toks == ["กรุงเทพ", "มหานคร"]
    # the demo lexicon is NOT consulted when a wordlist is supplied
    toks2 = [t.term for t in thai_analyze("เศรษฐกิจ", wordlist=wl)]
    assert toks2 == ["เศรษฐกิจ"]  # one grouped unknown run


def test_demo_wordlist_is_frozen():
    assert "ทำงาน" in DEMO_WORDLIST
