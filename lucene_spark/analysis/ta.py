"""Tamil analysis chain: StandardTokenizer → lowercase → decimal-digit
fold → Indic normalization (Tamil subset) → stop → snowball Tamil stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ta/TamilAnalyzer.java:121-131 (createComponents order — LowerCase,
DecimalDigit, IndicNormalization, Stop, SnowballFilter(TamilStemmer); the
stop filter runs AFTER normalization so the stop set is stored
normalized) and the published snowball Tamil stemmer by Damodharan
Rajalingam (https://snowballstem.org/algorithms/tamil/stemmer.html;
generated form org/tartarus/snowball/ext/TamilStemmer.java). Golden
vectors in tests/test_multilang_analyzers.py were produced by running the
reference snowball runtime itself, so every rule below is oracle-checked.

Reimplemented from the published algorithm (not a code translation — the
generated Java is a cursor machine; this is direct string rewriting):

- stem() pipeline: fix_ending once → length gate (>4) → question
  prefixes → pronoun prefixes → question suffixes → "um" → common word
  endings → vetrumai urupukal (case suffixes) → plural suffix → command
  suffixes → tense suffixes (repeat-until-no-match). Snowball's driver
  ignores stem()'s boolean, so the initial fix_ending sticks even when
  the length gate then stops the pipeline.
- fix_ending normalizes sandhi debris left by suffix removal (e.g.
  ட்க் → ள், ன்ற் → ல், ட்ட் → டு, dangling ்-consonant clusters); the
  த்த் → ம் rewrite fires only once a vetrumai case suffix was removed.
- Each suffix table is longest-match-wins (snowball among semantics);
  when the longest match's side condition fails, shorter entries are NOT
  retried — control falls through to the next stage.

The IndicNormalizationFilter subset is the five decomposed-vowel
compositions the reference applies to the Tamil script block
(in/IndicNormalizer.java rows flagged TAMIL): உ+ௗ→ஊ, ஒ+ௗ→ஔ, ெ+ா→ொ,
ெ+ௗ→ௌ, ே+ா→ோ.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the Lucene Tamil stopword list (from
https://github.com/AshokR/TamilNLP, Apache 2).
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "tamil_normalize",
    "tamil_stem",
    "tamil_term",
    "tamil_analyze",
    "tamil_terms_positions",
    "TAMIL_STOP_WORDS",
]

# Tamil digits -> ASCII (DecimalDigitFilter subset)
_TA_DIGITS = str.maketrans({chr(0x0BE6 + i): str(i) for i in range(10)})

# IndicNormalizer Tamil-block compositions (two-char decomposed forms)
_TA_COMPOSE = (
    ("உௗ", "ஊ"),  # உ + ௗ -> ஊ
    ("ஔ", "ஔ"),  # ஒ + ௗ -> ஔ
    ("ொ", "ொ"),  # ெ + ா -> ொ
    ("ௌ", "ௌ"),  # ெ + ௗ -> ௌ
    ("ோ", "ோ"),  # ே + ா -> ோ
)


def tamil_normalize(term: str) -> str:
    """DecimalDigitFilter (Tamil block) + IndicNormalizer Tamil rules."""
    term = term.translate(_TA_DIGITS)
    for pair, composed in _TA_COMPOSE:
        if pair[0] in term:
            term = term.replace(pair, composed)
    return term


# ---------------------------------------------------------------------------
# snowball Tamil stemmer
# ---------------------------------------------------------------------------

_VIRAMA = "்"  # ்
# dependent vowel signs ா ி ீ ு ூ ெ ே ை
_SIGNS = frozenset("ாிீுூெேை")
_SIGNS_OR_VIRAMA = _SIGNS | {_VIRAMA}
# vallinam (hard) consonants க ச ட த ப ற
_HARD = frozenset("கசடதபற")
# mellinam/idaiyinam ஞ ண ந ன ம ய ர ல ள ழ வ
_SOFT = frozenset("ஞணநனமயரலளழவ")
# prefix-joinable consonants க ங ச ஞ த ந ப ம ய வ
_PREFIX_CONS = frozenset("கஙசஞதநபமயவ")
# independent vowels அ ஆ இ ஈ உ ஊ எ ஏ ஐ ஒ ஓ ஔ
_INDEP_VOWELS = frozenset(
    "அஆஇஈஉஊஎஏஐஒஓஔ"
)

# வ-initial glide fixes after prefix removal: வு/வூ/வொ/வோ -> உ/ஊ/ஒ/ஓ
_VA_START = (
    ("வோ", "ஓ"),
    ("வொ", "ஒ"),
    ("வூ", "ஊ"),
    ("வு", "உ"),
)


def _fix_va_start(w: str) -> str:
    for pre, rep in _VA_START:
        if w.startswith(pre):
            return rep + w[2:]
    return w


def _longest_suffix(w: str, table) -> tuple[str, int] | None:
    """Longest-match-wins suffix lookup (snowball find_among_b)."""
    best = None
    for suf, case in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, case)
    return best


# fix_ending sandhi table: suffix -> case id (see _fix_ending)
_ENDINGS = (
    ("ந்த", 1),  # ந்த
    ("ய", 1),  # ய
    ("வ", 1),  # வ
    ("னு", 8),  # னு
    ("ுக்", 7),  # ுக்
    ("ுக்க்", 7),  # ுக்க்
    ("ட்க்", 3),  # ட்க்
    ("ற்க்", 4),  # ற்க்
    ("ங்", 9),  # ங்
    ("ட்ட்", 5),  # ட்ட்
    ("த்த்", 6),  # த்த்
    ("ந்த்", 1),  # ந்த்
    ("ந்", 1),  # ந்
    ("ட்ப்", 3),  # ட்ப்
    ("ய்", 2),  # ய்
    ("ன்ற்", 4),  # ன்ற்
    ("வ்", 1),  # வ்
)


def _fix_ending(w: str, found_vetrumai: bool) -> tuple[str, bool]:
    """One sandhi-cleanup pass; returns (word, changed)."""
    if len(w) <= 3:
        return w, False
    hit = _longest_suffix(w, _ENDINGS)
    if hit is not None:
        suf, case = hit
        base = w[: len(w) - len(suf)]
        if case == 1:
            return base, True
        if case == 2:  # ய் after ி/ீ/ை
            if base and base[-1] in "ிீை":
                return base, True
        elif case == 3:
            return base + "ள்", True  # -> ள்
        elif case == 4:
            return base + "ல்", True  # -> ல்
        elif case == 5:
            return base + "டு", True  # -> டு
        elif case == 6:  # த்த் -> ம் only after a vetrumai removal, not ை_
            if found_vetrumai and not base.endswith("ை"):
                return base + "ம்", True
        elif case == 7:
            return base + _VIRAMA, True
        elif case == 8:  # னு deleted unless a vowel sign precedes
            if not (base and base[-1] in _SIGNS):
                return base, True
        elif case == 9:  # ங் -> deleted after ை/், else -> ம்
            if base and base[-1] in ("ை", _VIRAMA):
                return base, True
            return base + "ம்", True
    # fallback: trailing ்-cluster cleanup
    if not w.endswith(_VIRAMA):
        return w, False
    rest = w[:-1]
    if rest and rest[-1] in _HARD:
        base = rest[:-1]
        if len(base) >= 2 and base[-1] == _VIRAMA and base[-2] in _HARD:
            return base[:-2], True  # double hard cluster க்க் etc.
        return base, True
    if len(rest) >= 2 and rest[-1] in _SOFT and rest[-2] == _VIRAMA:
        return rest[:-1], True  # drop soft consonant + its ்
    if rest and rest[-1] in _SIGNS_OR_VIRAMA:
        return rest, True  # just drop the dangling ்
    return w, False


def _fix_endings(w: str, found_vetrumai: bool) -> str:
    changed = True
    while changed:
        w, changed = _fix_ending(w, found_vetrumai)
    return w


def _remove_question_prefixes(w: str) -> str:
    # எ + joinable consonant + ் prefix (interrogative எ-)
    if len(w) >= 3 and w[0] == "எ" and w[1] in _PREFIX_CONS and w[2] == _VIRAMA:
        return _fix_va_start(w[3:])
    return w


def _remove_pronoun_prefixes(w: str) -> str:
    # அ/இ/உ + joinable consonant + ் prefix (demonstrative pronouns)
    if (
        len(w) >= 3
        and w[0] in "அஇஉ"
        and w[1] in _PREFIX_CONS
        and w[2] == _VIRAMA
    ):
        return _fix_va_start(w[3:])
    return w


_PLURALS = (
    ("கள்", 4),  # கள்
    ("ுங்கள்", 1),  # ுங்கள்
    ("ட்கள்", 3),  # ட்கள்
    ("ற்கள்", 2),  # ற்கள்
)


def _remove_plural_suffix(w: str) -> str:
    hit = _longest_suffix(w, _PLURALS)
    if hit is None:
        return w
    suf, case = hit
    base = w[: len(w) - len(suf)]
    if case == 1:  # ுங்கள் after a hard consonant keeps ுங்
        if base and base[-1] in _HARD:
            return base + "ுங்"
        return base + _VIRAMA
    if case == 2:
        return base + "ல்"  # ற்கள் -> ல்
    if case == 3:
        return base + "ள்"  # ட்கள் -> ள்
    return base  # கள் deleted


def _remove_question_suffixes(w: str, found_vetrumai: bool) -> str:
    if len(w) > 4 and w[-1] in "ாேோ":  # ா ே ோ
        w = w[:-1] + _VIRAMA
    return _fix_endings(w, found_vetrumai)


def _remove_command_suffixes(w: str) -> str:
    if len(w) > 4 and w[-2:] in ("பி", "வி"):  # பி வி
        return w[:-2]
    return w


def _remove_um(w: str, found_vetrumai: bool) -> str:
    if len(w) > 4 and w.endswith("ும்"):  # ும்
        w = w[:-3] + _VIRAMA
        w, _ = _fix_ending(w, found_vetrumai)
    return w


_COMMON_ENDINGS = (
    ("பட்ட", 3),  # பட்ட
    ("பட்டண", 3),  # பட்டண
    ("தான", 3),  # தான
    ("படிதான", 3),  # படிதான
    ("ென", 1),  # ென
    ("ாகிய", 1),  # ாகிய
    ("குரிய", 3),  # குரிய
    ("ுடைய", 1),  # ுடைய
    ("ல்ல", 2),  # ல்ல
    ("ுள்ள", 1),  # ுள்ள
    ("ாகி", 1),  # ாகி
    ("படி", 3),  # படி
    ("ின்றி", 1),  # ின்றி
    ("பற்றி", 3),  # பற்றி
    ("படு", 3),  # படு
    ("விடு", 3),  # விடு
    ("பட்டு", 3),  # பட்டு
    ("விட்டு", 3),  # விட்டு
    ("பட்டது", 3),  # பட்டது
    ("ென்று", 1),  # ென்று
    ("ுடை", 1),  # ுடை
    ("ில்லை", 1),  # ில்லை
    ("ுடன்", 1),  # ுடன்
    ("ிடம்", 1),  # ிடம்
    ("ெல்லாம்", 3),  # ெல்லாம்
    ("ெனும்", 1),  # ெனும்
)


def _remove_common_word_endings(w: str, found_vetrumai: bool) -> str:
    if len(w) <= 4:
        return w
    hit = _longest_suffix(w, _COMMON_ENDINGS)
    if hit is None:
        return w
    suf, case = hit
    base = w[: len(w) - len(suf)]
    if case == 1:
        w = base + _VIRAMA
    elif case == 2:  # ல்ல -> ் unless a vowel sign precedes (then no-op)
        if base and base[-1] in _SIGNS:
            return w
        w = base + _VIRAMA
    else:
        w = base
    return _fix_endings(w, found_vetrumai)


_VETRUMAI = (
    ("விட", 2),  # விட
    ("ீ", 7),  # ீ
    ("ொடு", 2),  # ொடு
    ("ோடு", 2),  # ோடு
    ("து", 6),  # து
    ("ிருந்து", 2),  # ிருந்து
    ("ின்று", 2),  # ின்று
    ("ுடை", 2),  # ுடை
    ("னை", 1),  # னை
    ("கண்", 1),  # கண்
    ("ின்", 3),  # ின்
    ("முன்", 1),  # முன்
    ("ிடம்", 4),  # ிடம்
    ("ிற்", 2),  # ிற்
    ("மேற்", 1),  # மேற்
    ("ல்", 5),  # ல்
    ("ாமல்", 2),  # ாமல்
    ("ால்", 2),  # ால்
    ("ில்", 2),  # ில்
    ("மேல்", 1),  # மேல்
    ("ுள்", 2),  # ுள்
    ("கீழ்", 1),  # கீழ்
)


def _remove_vetrumai_urupukal(w: str) -> tuple[str, bool]:
    """Case-suffix removal; returns (word, found_vetrumai_urupu)."""
    if len(w) <= 4:
        return w, False
    matched = False
    hit = _longest_suffix(w, _VETRUMAI)
    if hit is not None:
        suf, case = hit
        base = w[: len(w) - len(suf)]
        if case == 1:
            w, matched = base, True
        elif case == 2:
            w, matched = base + _VIRAMA, True
        elif case == 3:  # ின் unless ம precedes
            if not base.endswith("ம"):
                w, matched = base + _VIRAMA, True
        elif case == 4:  # ிடம் needs length >= 7
            if len(w) >= 7:
                w, matched = base + _VIRAMA, True
        elif case == 5:  # ல் unless a vowel sign precedes
            if not (base and base[-1] in _SIGNS):
                w, matched = base + _VIRAMA, True
        elif case == 6:  # து unless a vowel sign precedes
            if not (base and base[-1] in _SIGNS):
                w, matched = base, True
        elif case == 7:  # ீ -> ி
            w, matched = base + "ி", True
    if not matched:
        # accusative ை after a non-hard letter or a doubled hard consonant
        if not w.endswith("ை"):
            return w, False
        base = w[:-1]
        if base and base[-1] in _HARD:
            if not (len(base) >= 2 and base[-2] == _VIRAMA):
                return w, False
        w = base + _VIRAMA
    # genitive ின் tail after the main case suffix came off
    if w.endswith("ின்"):
        w = w[:-3] + _VIRAMA
    return _fix_endings(w, True), True


_TENSES = (
    ("க", 1),  # க
    ("த", 1),  # த
    ("ன", 1),  # ன
    ("ப", 1),  # ப
    ("ய", 1),  # ய
    ("ா", 5),  # ா
    ("கு", 6),  # கு
    ("படு", 1),  # படு
    ("து", 3),  # து
    ("ிற்று", 1),  # ிற்று
    ("னை", 1),  # னை
    ("வை", 1),  # வை
    ("னன்", 1),  # னன்
    ("பன்", 1),  # பன்
    ("வன்", 2),  # வன்
    ("ான்", 4),  # ான்
    ("னான்", 1),  # னான்
    ("மின்", 1),  # மின்
    ("னென்", 1),  # னென்
    ("ேன்", 5),  # ேன்
    ("னம்", 1),  # னம்
    ("பம்", 1),  # பம்
    ("ாம்", 5),  # ாம்
    ("கும்", 1),  # கும்
    ("டும்", 5),  # டும்
    ("தும்", 1),  # தும்
    ("றும்", 1),  # றும்
    ("ெம்", 5),  # ெம்
    ("ேம்", 5),  # ேம்
    ("ோம்", 5),  # ோம்
    ("ாய்", 5),  # ாய்
    ("னர்", 1),  # னர்
    ("பர்", 1),  # பர்
    ("ீயர்", 5),  # ீயர்
    ("வர்", 1),  # வர்
    ("ார்", 5),  # ார்
    ("னார்", 1),  # னார்
    ("மார்", 1),  # மார்
    ("கொண்டிர்", 1),  # கொண்டிர்
    ("னிர்", 5),  # னிர்
    ("ீர்", 5),  # ீர்
    ("னள்", 1),  # னள்
    ("பள்", 1),  # பள்
    ("வள்", 1),  # வள்
    ("ாள்", 5),  # ாள்
    ("னாள்", 1),  # னாள்
)

_PARTICIPLES = (
    "கிற",  # கிற
    "கின்ற",  # கின்ற
    "ாநின்ற",  # ாநின்ற
    "கிற்",  # கிற்
    "கின்ற்",  # கின்ற்
    "ாநின்ற்",  # ாநின்ற்
)


def _remove_tense_suffix(w: str, found_vetrumai: bool) -> tuple[str, bool]:
    if len(w) <= 4:
        return w, False
    found = False
    hit = _longest_suffix(w, _TENSES)
    if hit is not None:
        suf, case = hit
        base = w[: len(w) - len(suf)]
        if case == 1:
            w, found = base, True
        elif case == 2:  # வன் unless an independent vowel precedes
            if not (base and base[-1] in _INDEP_VOWELS):
                w, found = base, True
        elif case == 3:  # து unless a vowel sign precedes
            if not (base and base[-1] in _SIGNS):
                w, found = base, True
        elif case == 4:  # ான் unless ச precedes
            if not base.endswith("ச"):
                w, found = base + _VIRAMA, True
        elif case == 5:
            w, found = base + _VIRAMA, True
        elif case == 6:  # கு only after ்
            if base.endswith(_VIRAMA):
                w, found = base, True
    best = None
    for suf in _PARTICIPLES:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        w, found = w[: len(w) - len(best)], True
    return _fix_endings(w, found_vetrumai), found


def tamil_stem(term: str) -> str:
    """The published snowball Tamil stemmer, string-rewriting form."""
    w, _ = _fix_ending(term, False)
    if len(w) <= 4:
        return w
    w = _remove_question_prefixes(w)
    w = _remove_pronoun_prefixes(w)
    w = _remove_question_suffixes(w, False)
    w = _remove_um(w, False)
    w = _remove_common_word_endings(w, False)
    w, found_vetrumai = _remove_vetrumai_urupukal(w)
    w = _remove_plural_suffix(w)
    w = _remove_command_suffixes(w)
    found = True
    while found:
        w, found = _remove_tense_suffix(w, found_vetrumai)
    return w


TAMIL_STOP_WORDS = frozenset(
    """ஒரு என்று மற்றும் இந்த இது என்ற கொண்டு என்பது பல ஆகும் அல்லது அவர்
    நான் உள்ள அந்த இவர் என முதல் என்ன இருந்து சில என் போன்ற வேண்டும்
    வந்து இதன் அது அவன் தான் பலரும் என்னும் மேலும் பின்னர் கொண்ட
    இருக்கும் தனது உள்ளது போது என்றும் அதன் தன் பிறகு அவர்கள் வரை அவள்
    நீ ஆகிய இருந்தது உள்ளன வந்த இருந்த மிகவும் இங்கு மீது ஓர் இவை
    இந்தக் பற்றி வரும் வேறு இரு இதில் போல் இப்போது அவரது மட்டும்
    இந்தப் எனும் மேல் பின் சேர்ந்த ஆகியோர் எனக்கு இன்னும் அந்தப் அன்று
    ஒரே மிக அங்கு பல்வேறு விட்டு பெரும் அதை பற்றிய உன் அதிக அந்தக்
    பேர் இதனால் அவை அதே ஏன் முறை யார் என்பதை எல்லாம் மட்டுமே இங்கே
    அங்கே இடம் இடத்தில் அதில் நாம் அதற்கு எனவே பிற சிறு மற்ற விட எந்த
    எனவும் எனப்படும் எனினும் அடுத்த இதனை இதை கொள்ள இந்தத் இதற்கு
    அதனால் தவிர போல வரையில் சற்று எனக்""".split()
)


def tamil_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Per-term chain: normalize → stop → stem (tokenizer lowercased)."""
    term = tamil_normalize(term)
    if stopwords is not None and term in stopwords:
        return None
    return tamil_stem(term)


def tamil_analyze(
    text: str, stopwords: frozenset[str] | None = TAMIL_STOP_WORDS
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=MAX_TOKEN_LENGTH
    ):
        term = tamil_term(tok.term, stopwords)
        if term:
            out.append(Token(term, tok.position, tok.start, tok.end, tok.type))
    return out


def tamil_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = tamil_analyze(text, stopwords if stopwords is not None else None)
    return [t.term for t in toks], [t.position for t in toks]
