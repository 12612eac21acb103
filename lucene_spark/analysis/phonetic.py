"""Phonetic analysis: classic American Soundex — the phonetic-module
analog.

Behavioral reference: analysis/phonetic/src/java/org/apache/lucene/
analysis/phonetic/PhoneticFilter.java:34 (wraps a commons-codec encoder;
Soundex is the canonical one) in the replace configuration
(``inject=false`` — each token is replaced by its phonetic code; the
inject form stacks posIncr-0 tokens, the same stacked-token layout
``synonym_expanded_index`` exercises). The Soundex algorithm itself is
public knowledge (Russell & Odell, US patents 1918/1922; the commons-codec
US_ENGLISH rules): keep the first letter, code the rest
b f p v→1 / c g j k q s x z→2 / d t→3 / l→4 / m n→5 / r→6, drop vowels and
y, collapse adjacent equal codes INCLUDING across h/w (the HW rule:
"Ashcraft" → A261, not A226), pad/truncate to letter + 3 digits.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
Matching is phonetic on both sides: the query analyzes through the same
chain, so "Rupert" finds "Robert" (both R163).
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "soundex",
    "soundex_term",
    "soundex_analyze",
    "soundex_terms_positions",
]

_CODES = {}
for _c in "bfpv":
    _CODES[_c] = "1"
for _c in "cgjkqsxz":
    _CODES[_c] = "2"
for _c in "dt":
    _CODES[_c] = "3"
_CODES["l"] = "4"
for _c in "mn":
    _CODES[_c] = "5"
_CODES["r"] = "6"


def soundex(term: str) -> str:
    """Classic 4-char Soundex code of a (lowercased) term; non-letters are
    ignored, a term with no ASCII letters returns '' (token dropped)."""
    letters = [c for c in term.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    out = letters[0].upper()
    last = _CODES.get(letters[0], "")
    for ch in letters[1:]:
        if ch in ("h", "w"):
            continue  # HW rule: h/w do not reset the run
        code = _CODES.get(ch, "")
        if not code:
            last = ""  # vowels/y separate runs
            continue
        if code != last:
            out += code
            if len(out) == 4:
                break
        last = code
    return (out + "000")[:4]


# --- Refined Soundex (commons-codec RefinedSoundex, wrapped by the same
# PhoneticFilter): retain the first letter, then append EVERY letter's code
# digit (vowels/h/w/y code 0 and are kept), collapsing only adjacent equal
# codes; no length cap. The mapping is the commons-codec US_ENGLISH table
# "01360240043788015936020505" for a..z (javadoc example:
# refinedSoundex("testing") == "T6036084").

_REFINED = "01360240043788015936020505"


def refined_soundex(term: str) -> str:
    letters = [c for c in term.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    out = [letters[0].upper()]
    last = None
    for ch in letters:
        code = _REFINED[ord(ch) - 97]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


def refined_soundex_term(
    term: str, stopwords: frozenset[str] | None
) -> str | None:
    if stopwords and term in stopwords:
        return None
    code = refined_soundex(term)
    return code or None


def refined_soundex_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = refined_soundex_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def refined_soundex_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = refined_soundex_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


# --- Caverphone 2.0 (commons-codec Caverphone2, wrapped by the same
# PhoneticFilter): David Hood's revised Caverphone (Caversham project,
# University of Otago, 2004) — the published replacement cascade, 10-char
# code padded with '1'. Verified against the published vectors
# (Stevenson → STFNSN1111, Thompson → TMPSN11111, Peter → PTA1111111).

import re as _re

_CV_STARTS = (
    ("cough", "cou2f"), ("rough", "rou2f"), ("tough", "tou2f"),
    ("enough", "enou2f"), ("trough", "trou2f"), ("gn", "2n"),
)
_CV_PAIRS = (
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
)


def caverphone2(term: str) -> str:
    s = "".join(c for c in term.lower() if "a" <= c <= "z")
    if not s:
        return ""
    if s.endswith("e"):
        s = s[:-1]
    for pre, rep in _CV_STARTS:
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    if s.endswith("mb"):
        s = s[:-2] + "m2"
    for pat, rep in _CV_PAIRS:
        s = s.replace(pat, rep)
    if s and s[0] in "aeiou":
        s = "A" + s[1:]
    s = _re.sub(r"[aeiou]", "3", s)
    s = s.replace("j", "y")
    if s.startswith("y3"):
        s = "Y3" + s[2:]
    if s.startswith("y"):
        s = "A" + s[1:]
    s = s.replace("y", "3")
    s = s.replace("3gh3", "3kh3")
    s = s.replace("gh", "22")
    s = s.replace("g", "k")
    for ch in "stpkfmn":
        s = _re.sub(ch + "+", ch.upper(), s)
    s = s.replace("w3", "W3").replace("wh3", "Wh3")
    if s.endswith("w"):
        s = s[:-1] + "3"
    s = s.replace("w", "2")
    if s.startswith("h"):
        s = "A" + s[1:]
    s = s.replace("h", "2")
    s = s.replace("r3", "R3")
    if s.endswith("r"):
        s = s[:-1] + "3"
    s = s.replace("r", "2")
    s = s.replace("l3", "L3")
    if s.endswith("l"):
        s = s[:-1] + "3"
    s = s.replace("l", "2")
    s = s.replace("2", "")
    if s.endswith("3"):
        s = s[:-1] + "A"
    s = s.replace("3", "")
    return (s + "1111111111")[:10]


def caverphone2_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    code = caverphone2(term)
    return code or None


def caverphone2_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = caverphone2_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def caverphone2_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = caverphone2_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


def soundex_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form), then encode."""
    if stopwords and term in stopwords:
        return None
    code = soundex(term)
    return code or None


def soundex_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = soundex_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def soundex_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = soundex_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


# ---------------------------------------------------------------------------
# NYSIIS (Taft 1970, the New York State Identification and Intelligence
# System code — the commons-codec Nysiis encoder PhoneticFilter wraps)
# ---------------------------------------------------------------------------

_NY_VOWELS = frozenset("aeiou")


def nysiis(term: str, strict: bool = True) -> str:
    """NYSIIS code of a term per the published algorithm: first/last
    letter-group rewrites, vowel folding to A, the Q/Z/M/KN/K/SCH/PH
    consonant rewrites, H/W elision against their neighbours, duplicate
    squeeze, and the trailing S / AY / A cleanup. ``strict`` truncates to
    the classic 6 characters (the commons-codec default)."""
    s = [c for c in term.lower() if "a" <= c <= "z"]
    if not s:
        return ""
    w = "".join(s)
    # first-character rewrites
    if w.startswith("mac"):
        w = "mcc" + w[3:]
    elif w.startswith("kn"):
        w = "nn" + w[2:]
    elif w.startswith("k"):
        w = "c" + w[1:]
    elif w.startswith("ph") or w.startswith("pf"):
        w = "ff" + w[2:]
    elif w.startswith("sch"):
        w = "sss" + w[3:]
    # last-character rewrites
    if w.endswith("ee") or w.endswith("ie"):
        w = w[:-2] + "y"
    elif w[-2:] in ("dt", "rt", "rd", "nt", "nd"):
        w = w[:-2] + "d"
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        ch = w[i]
        step = 1
        if ch == "e" and i + 1 < n and w[i + 1] == "v":
            rep = "af"
            step = 2
        elif ch in _NY_VOWELS:
            rep = "a"
        elif ch == "q":
            rep = "g"
        elif ch == "z":
            rep = "s"
        elif ch == "m":
            rep = "n"
        elif ch == "k":
            if i + 1 < n and w[i + 1] == "n":
                rep = "n"
                step = 2
            else:
                rep = "c"
        elif ch == "s" and w[i: i + 3] == "sch":
            rep = "sss"
            step = 3
        elif ch == "p" and i + 1 < n and w[i + 1] == "h":
            rep = "ff"
            step = 2
        elif ch == "h" and (
            w[i - 1] not in _NY_VOWELS
            or (i + 1 < n and w[i + 1] not in _NY_VOWELS)
        ):
            # "previous character" reads the transcoded stream: vowels
            # have already folded to A
            rep = "a" if w[i - 1] in _NY_VOWELS else w[i - 1]
        elif ch == "w" and w[i - 1] in _NY_VOWELS:
            rep = "a"
        else:
            rep = ch
        for r in rep:
            if r != key[-1]:
                key.append(r)
        i += step
    # trailing cleanup
    if key[-1] == "s" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2] == "a" and key[-1] == "y":
        del key[-2]
    if key[-1] == "a" and len(key) > 1:
        key.pop()
    out = "".join(key).upper()
    return out[:6] if strict else out


def nysiis_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    code = nysiis(term)
    return code or None


def nysiis_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = nysiis_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def nysiis_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = nysiis_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


# ---------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969 — the commons-codec ColognePhonetic encoder;
# the German-language Soundex counterpart)
# ---------------------------------------------------------------------------

# context-free codes; context-dependent letters (c, d, t, p, x) are handled
# inline. Umlauts/ß fold like their base vowels / ss first.
_KOELN_SIMPLE = {
    **{c: "0" for c in "aeijouy"},
    **{c: "1" for c in "b"},
    **{c: "3" for c in "fvw"},
    **{c: "4" for c in "gkq"},
    "l": "5",
    **{c: "6" for c in "mn"},
    "r": "7",
    **{c: "8" for c in "sz"},
}
_KOELN_FOLD = str.maketrans({"ä": "a", "ö": "o", "ü": "u", "ß": "s"})


def cologne_phonetic(term: str) -> str:
    """Kölner Phonetik code: per-letter digits with the Postel context
    rules (C initial/after-S/Z, D/T before sibilants, P before H, X), then
    collapse adjacent duplicates and drop every '0' except a leading one."""
    w = [
        c
        for c in term.lower().translate(_KOELN_FOLD)
        if "a" <= c <= "z"
    ]
    n = len(w)
    raw: list[str] = []
    for i, ch in enumerate(w):
        nxt = w[i + 1] if i + 1 < n else ""
        prv = w[i - 1] if i > 0 else ""
        if ch == "h":
            continue
        if ch == "p":
            raw.append("3" if nxt == "h" else "1")
        elif ch in ("d", "t"):
            raw.append("8" if nxt in ("c", "s", "z") else "2")
        elif ch == "c":
            if i == 0:
                raw.append("4" if nxt in "ahkloqrux" else "8")
            elif prv in ("s", "z"):
                raw.append("8")
            else:
                raw.append("4" if nxt in "ahkoqux" else "8")
        elif ch == "x":
            raw.append("8" if prv in ("c", "k", "q") else "48")
        else:
            code = _KOELN_SIMPLE.get(ch)
            if code is not None:
                raw.append(code)
    flat = "".join(raw)
    squeezed = []
    last = ""
    for d in flat:
        if d != last:
            squeezed.append(d)
        last = d
    return "".join(
        d for i, d in enumerate(squeezed) if d != "0" or i == 0
    )


def cologne_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    code = cologne_phonetic(term)
    return code or None


def cologne_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = cologne_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def cologne_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = cologne_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


# --- Match Rating Approach (commons-codec MatchRatingApproachEncoder,
# wrapped by the same PhoneticFilter; the algorithm is public knowledge —
# Western Airlines' Match Rating Approach, Moore et al. 1977, as published
# in the commons-codec docs): uppercase/strip non-letters, fold accents,
# delete all vowels (AEIOU) except a word-LEADING vowel, collapse doubled
# consonants to one, and reduce codes longer than 6 to first-3 + last-3.

_MRA_VOWELS = frozenset("AEIOU")


def match_rating_encode(term: str) -> str:
    import unicodedata

    up = "".join(
        c
        for c in unicodedata.normalize("NFKD", term.upper())
        if "A" <= c <= "Z"
    )
    if not up:
        return ""
    kept: list[str] = []
    for i, c in enumerate(up):
        if c in _MRA_VOWELS and i > 0:
            continue
        kept.append(c)
    # remove the second of doubled letters
    dedup: list[str] = []
    for c in kept:
        if dedup and dedup[-1] == c:
            continue
        dedup.append(c)
    code = "".join(dedup)
    if len(code) > 6:
        code = code[:3] + code[-3:]
    return code


def match_rating_term(
    term: str, stopwords: frozenset[str] | None
) -> str | None:
    if stopwords and term in stopwords:
        return None
    code = match_rating_encode(term)
    return code or None


def match_rating_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = match_rating_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def match_rating_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = match_rating_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
