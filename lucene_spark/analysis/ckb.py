"""Sorani Kurdish analysis chain: StandardTokenizer → Sorani
normalization → lowercase → decimal-digit fold → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ckb/SoraniAnalyzer.java:122-130 (createComponents order — note
normalization runs FIRST, before lowercase/stop, unlike the Indic
chains), ckb/SoraniNormalizer.java (Arabic-script unification for Sorani
orthography) and ckb/SoraniStemmer.java (postposition / possessive /
ezafe / definiteness suffix strips — the affix order matters: the
postposition and possessive strips CASCADE, the rest is one
first-match-wins ladder).

All strings here are written as codepoint escapes: Sorani text is RTL
Arabic script and editor/terminal round-trips silently reorder or
decompose it.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "sorani_normalize",
    "sorani_stem",
    "sorani_term",
    "sorani_analyze",
    "sorani_terms_positions",
    "SORANI_STOP_WORDS",
]

_FARSI_YEH = "\u06cc"
_KEHEH = "\u06a9"
_HEH = "\u0647"
_AE = "\u06d5"
_ZWNJ = "\u200c"
_RREH = "\u0695"

# single-char folds (SoraniNormalizer switch, context-free cases)
_CKB_MAP = {
    "\u064a": _FARSI_YEH,  # yeh -> farsi yeh
    "\u0649": _FARSI_YEH,  # dotless yeh -> farsi yeh
    "\u0643": _KEHEH,      # kaf -> keheh
    "\u0629": _AE,         # teh marbuta -> ae
    "\u06be": _HEH,        # heh doachashmee -> heh
    "\u0692": _RREH,       # reh with small v above -> rreh
}
# deleted outright: tatweel + harakat (FORMAT chars also delete, handled
# via unicodedata category Cf)
_CKB_DELETE = frozenset(
    "\u0640\u064b\u064c\u064d\u064e\u064f\u0650\u0651\u0652"
)

# Arabic-Indic + extended digits -> ASCII (DecimalDigitFilter subset)
_CKB_DIGITS = str.maketrans(
    {
        **{chr(0x0660 + i): str(i) for i in range(10)},
        **{chr(0x06F0 + i): str(i) for i in range(10)},
    }
)

import unicodedata  # noqa: E402


def sorani_normalize(term: str) -> str:
    """SoraniNormalizer.normalize: yeh/kaf/rreh unification, final heh →
    ae, heh+ZWNJ → ae, tatweel/harakat/format-char deletion."""
    s = list(term)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == _ZWNJ:
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            continue
        if ch == _HEH:
            if i == len(s) - 1:
                s[i] = _AE
            i += 1
            continue
        if ch == "\u0631":  # reh: initial -> rreh
            if i == 0:
                s[i] = _RREH
            i += 1
            continue
        if ch in _CKB_MAP:
            s[i] = _CKB_MAP[ch]
            i += 1
            continue
        if ch in _CKB_DELETE or unicodedata.category(ch) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(term: str) -> str:
    """SoraniStemmer.stem on a normalized token."""
    s = term
    n = len(s)
    # postposition (cascades into the later strips)
    if n > 5 and s.endswith("\u062f\u0627"):          # -da
        s = s[:-2]
    elif n > 4 and s.endswith("\u0646\u0627"):        # -(n)a: drop final alef
        s = s[:-1]
    elif n > 6 and s.endswith("\u06d5\u0648\u06d5"):  # -ewe
        s = s[:-3]
    n = len(s)
    # possessive pronoun (also cascades)
    if n > 6 and s.endswith(
        ("\u0645\u0627\u0646", "\u06cc\u0627\u0646", "\u062a\u0627\u0646")
    ):
        s = s[:-3]
    n = len(s)
    # first-match-wins ladder: ezafe / (in)definite / demonstrative forms
    if n > 6 and s.endswith("\u06ce\u06a9\u06cc"):            # -êkî
        return s[:-3]
    if n > 7 and s.endswith("\u06cc\u06d5\u06a9\u06cc"):      # -yekî
        return s[:-4]
    if n > 5 and s.endswith("\u06ce\u06a9"):                  # -êk
        return s[:-2]
    if n > 6 and s.endswith("\u06cc\u06d5\u06a9"):            # -yek
        return s[:-3]
    if n > 6 and s.endswith("\u06d5\u06a9\u06d5"):            # -eke
        return s[:-3]
    if n > 5 and s.endswith("\u06a9\u06d5"):                  # -ke
        return s[:-2]
    if n > 7 and s.endswith("\u06d5\u06a9\u0627\u0646"):      # -ekan
        return s[:-4]
    if n > 6 and s.endswith("\u06a9\u0627\u0646"):            # -kan
        return s[:-3]
    if n > 7 and s.endswith("\u06cc\u0627\u0646\u06cc"):      # -yanî
        return s[:-4]
    if n > 6 and s.endswith("\u0627\u0646\u06cc"):            # -anî
        return s[:-3]
    if n > 6 and s.endswith("\u06cc\u0627\u0646"):            # -yan
        return s[:-3]
    if n > 5 and s.endswith("\u0627\u0646"):                  # -an
        return s[:-2]
    if n > 7 and s.endswith("\u06cc\u0627\u0646\u06d5"):      # -yane
        return s[:-4]
    if n > 6 and s.endswith("\u0627\u0646\u06d5"):            # -ane
        return s[:-3]
    if n > 5 and s.endswith(("\u0627\u06cc\u06d5", "\u06d5\u06cc\u06d5")):
        return s[:-2]                                         # -aye / -eye
    if n > 4 and s.endswith("\u06d5"):                        # -e
        return s[:-1]
    if n > 4 and s.endswith("\u06cc"):                        # -î
        return s[:-1]
    return s


# function-word core of the Lucene sorani stopword list (public), stored
# in normalized form (the reference stop file ships normalized)
SORANI_STOP_WORDS = frozenset(
    sorani_normalize(w)
    for w in (
        "\u0648",                       # û (and)
        "\u0644\u06d5",                 # le (in/from)
        "\u0628\u06d5",                 # be (to/with)
        "\u0628\u06c6",                 # bo (for)
        "\u0643\u06d5",                 # ke (that)
        "\u0644\u06d5\u0645",           # lem
        "\u0626\u06d5\u0645",           # em (this)
        "\u0626\u06d5\u0648",           # ew (that)
        "\u0626\u06d5\u0648\u06d5",     # ewe
        "\u0647\u06d5\u0631",           # her (each)
        "\u0647\u06d5\u0645\u0648\u0648",  # hemû (all)
        "\u0626\u06d5\u06af\u06d5\u0631",  # eger (if)
        "\u0648\u06d5\u0643",           # wek (like)
    )
)


def sorani_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: normalize, digit fold, stop, stem.
    (Normalization precedes the stop filter in the reference chain, so the
    stop set is matched in normalized form.)"""
    t = sorani_normalize(term).translate(_CKB_DIGITS)
    if not t:
        return None
    if stopwords and t in stopwords:
        return None
    return sorani_stem(t)


def sorani_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = sorani_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def sorani_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = sorani_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
