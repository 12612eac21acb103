"""StandardAnalyzer-equivalent analysis chain, from scratch in Python.

Behavioral reference (lucene/core/src/java/org/apache/lucene/analysis/):
- StandardTokenizer: UAX#29 word-break (Unicode 12.1 JFlex DFA,
  standard/StandardTokenizerImpl.jflex) emitting ALPHANUM/NUM/IDEOGRAPHIC/
  HIRAGANA/KATAKANA/HANGUL/EMOJI tokens; tokens longer than
  maxTokenLength=255 are skipped but still increment the position
  (standard/StandardTokenizer.java:152-175).
- LowerCaseFilter: per-codepoint Character.toLowerCase(int)
  (LowerCaseFilter.java:23-44, CharacterUtils.java:53-59).
- StopFilter: drops stopwords, accumulating position increments
  (StopFilter.java:25-40, FilteringTokenFilter.java:49-63).
  StandardAnalyzer() defaults to the EMPTY stop set
  (standard/StandardAnalyzer.java:51-53).

This implements the UAX#29 word-boundary rules WB1-WB16 + WB999 directly
(subset of property data resolved via unicodedata + explicit ranges — the
synthetic fixture corpus is constrained to this surface, with golden tests
for the CJK/emoji/numeric edge cases).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from ..constants import MAX_TOKEN_LENGTH

__all__ = ["tokenize", "analyze", "Token", "TYPE_ALPHANUM", "TYPE_NUM"]

# --- word-break property classes -------------------------------------------

CR, LF, NEWLINE, EXTEND, ZWJ, RI, FORMAT = 1, 2, 3, 4, 5, 6, 7
KATAKANA, ALETTER, SINGLE_QUOTE, DOUBLE_QUOTE = 8, 9, 10, 11
MIDNUMLET, MIDLETTER, MIDNUM, NUMERIC, EXTENDNUMLET, WSEGSPACE = 12, 13, 14, 15, 16, 17
HEBREW_LETTER = 18
IDEOGRAPHIC, HIRAGANA, HANGUL, EXT_PICT, OTHER = 19, 20, 21, 22, 0

_MIDLETTER = {0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A}
_MIDNUM = {0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
           0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B}
_MIDNUMLET = {0x002E, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
# NB: U+2019 RIGHT SINGLE QUOTATION MARK is MidNumLet per WordBreakProperty

_KATAKANA_RANGES = ((0x30A0, 0x30FF), (0x31F0, 0x31FF), (0x32D0, 0x32FE),
                    (0x3300, 0x3357), (0xFF66, 0xFF9D))
_HIRAGANA_RANGE = (0x3041, 0x309F)
_IDEO_RANGES = ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF),
                (0x20000, 0x2FA1F), (0x3005, 0x3007))
_HANGUL_RANGES = ((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F),
                  (0xA960, 0xA97F), (0xD7B0, 0xD7FF))
_EXT_PICT_RANGES = ((0x1F000, 0x1FAFF), (0x2600, 0x26FF), (0x2700, 0x27BF),
                    (0x2B00, 0x2BFF), (0x1F900, 0x1F9FF), (0x2460, 0x24FF),
                    (0x2139, 0x2139), (0x2194, 0x21AA), (0x231A, 0x231B),
                    (0x23E9, 0x23FA), (0x25AA, 0x25FE), (0x2934, 0x2935),
                    (0x3297, 0x3299), (0x3030, 0x3030))


def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


@lru_cache(maxsize=65536)
def _wb_class(cp: int) -> int:
    """Word-break property class of a codepoint (UAX#29 subset)."""
    if cp == 0x000D:
        return CR
    if cp == 0x000A:
        return LF
    if cp in (0x000B, 0x000C, 0x0085, 0x2028, 0x2029):
        return NEWLINE
    if cp == 0x200D:
        return ZWJ
    if cp == 0x0027:
        return SINGLE_QUOTE
    if cp == 0x0022:
        return DOUBLE_QUOTE
    if cp in _MIDLETTER:
        return MIDLETTER
    if cp in _MIDNUM:
        return MIDNUM
    if cp in _MIDNUMLET:
        return MIDNUMLET
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return RI
    if cp == 0xFE0F or cp == 0x200C:  # variation selector-16, ZWNJ
        return EXTEND
    ch = chr(cp)
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me") or 0x1F3FB <= cp <= 0x1F3FF:  # skin tones
        return EXTEND
    if cat == "Cf":
        return FORMAT
    if cat == "Pc" or cp == 0x202F:  # connector punctuation: _ etc.
        return EXTENDNUMLET
    if cat == "Zs" and cp not in (0x00A0, 0x2007, 0x202F):
        return WSEGSPACE
    if _in_ranges(cp, _KATAKANA_RANGES):
        return KATAKANA
    if _HIRAGANA_RANGE[0] <= cp <= _HIRAGANA_RANGE[1]:
        return HIRAGANA
    if _in_ranges(cp, _IDEO_RANGES):
        return IDEOGRAPHIC
    if _in_ranges(cp, _HANGUL_RANGES):
        return HANGUL
    if cat == "Nd":
        return NUMERIC
    if 0x0590 <= cp <= 0x05FF:
        return HEBREW_LETTER
    if cat.startswith("L"):
        return ALETTER
    if _in_ranges(cp, _EXT_PICT_RANGES):
        return EXT_PICT
    return OTHER


# Hangul syllables/jamo carry the ALetter word-break property in UAX#29
# (sequences stay together via WB5); the token TYPE stays <HANGUL>.
_AHLETTER = (ALETTER, HEBREW_LETTER, HANGUL)
_MIDNUMLETQ = (MIDNUMLET, SINGLE_QUOTE)
_IGNORE = (EXTEND, FORMAT, ZWJ)

# token types (StandardTokenizer.java:43-77)
TYPE_ALPHANUM = "<ALPHANUM>"
TYPE_NUM = "<NUM>"
TYPE_IDEOGRAPHIC = "<IDEOGRAPHIC>"
TYPE_HIRAGANA = "<HIRAGANA>"
TYPE_KATAKANA = "<KATAKANA>"
TYPE_HANGUL = "<HANGUL>"
TYPE_EMOJI = "<EMOJI>"


class Token:
    __slots__ = ("term", "position", "start", "end", "type")

    def __init__(self, term: str, position: int, start: int, end: int, type_: str):
        self.term = term
        self.position = position
        self.start = start
        self.end = end
        self.type = type_

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.term!r}, pos={self.position}, type={self.type})"


def _boundaries(cps: list[int], cls: list[int]) -> list[int]:
    """Word-boundary positions (indices where a break occurs), per UAX#29
    rules WB1..WB999 with Extend/Format/ZWJ ignoring (WB4)."""
    n = len(cps)
    if n == 0:
        return [0]
    breaks = [0] * (n + 1)
    breaks[0] = breaks[n] = 1

    # base[i]: index of the nearest preceding non-ignored char before i (or -1)
    def advance_skip(i: int) -> int:
        """next non-ignored index > i, or n"""
        j = i + 1
        while j < n and cls[j] in _IGNORE:
            j += 1
        return j

    prev_base: list[int] = [-1] * n
    last = -1
    for i in range(n):
        prev_base[i] = last
        if cls[i] not in _IGNORE:
            last = i

    ri_count = 0  # consecutive regional indicators ending at current base
    for i in range(1, n):
        l_cls = cls[i - 1]
        r_cls = cls[i]

        # WB3: CR x LF
        if l_cls == CR and r_cls == LF:
            continue
        # WB3a/3b: break around newlines
        if l_cls in (NEWLINE, CR, LF) or r_cls in (NEWLINE, CR, LF):
            breaks[i] = 1
            ri_count = 0
            continue
        # WB3c: ZWJ x Extended_Pictographic
        if l_cls == ZWJ and r_cls == EXT_PICT:
            continue
        # WB3d: WSegSpace x WSegSpace
        if l_cls == WSEGSPACE and r_cls == WSEGSPACE:
            continue
        # WB4: X (Extend|Format|ZWJ)* -> treat as X: never break before ignorables
        if r_cls in _IGNORE:
            continue
        # effective left class: nearest non-ignored char
        li = i - 1
        if cls[li] in _IGNORE:
            li = prev_base[i - 1]
            if li < 0:
                breaks[i] = 1
                continue
        lc = cls[li]
        rc = r_cls

        if lc == RI:
            # count run of RIs ending at li
            cnt = 0
            j = li
            while j >= 0:
                if cls[j] == RI:
                    cnt += 1
                    j = prev_base[j]
                elif cls[j] in _IGNORE:
                    j = prev_base[j]
                else:
                    break
            ri_count = cnt
        else:
            ri_count = 0

        def next_base_cls(k: int) -> int:
            j = advance_skip(k)
            return cls[j] if j < n else OTHER

        no_break = False
        if lc in _AHLETTER and rc in _AHLETTER:
            no_break = True  # WB5
        elif lc in _AHLETTER and (rc == MIDLETTER or rc in _MIDNUMLETQ):
            no_break = next_base_cls(i) in _AHLETTER  # WB6
        elif (lc == MIDLETTER or lc in _MIDNUMLETQ) and rc in _AHLETTER:
            # WB7: AHLetter (MidLetter|MidNumLetQ) x AHLetter
            j = prev_base[li]
            no_break = j >= 0 and cls[j] in _AHLETTER
        elif lc == HEBREW_LETTER and rc == SINGLE_QUOTE:
            no_break = True  # WB7a
        elif lc == HEBREW_LETTER and rc == DOUBLE_QUOTE:
            no_break = next_base_cls(i) == HEBREW_LETTER  # WB7b
        elif lc == DOUBLE_QUOTE and rc == HEBREW_LETTER:
            j = prev_base[li]
            no_break = j >= 0 and cls[j] == HEBREW_LETTER  # WB7c
        elif lc == NUMERIC and rc == NUMERIC:
            no_break = True  # WB8
        elif lc in _AHLETTER and rc == NUMERIC:
            no_break = True  # WB9
        elif lc == NUMERIC and rc in _AHLETTER:
            no_break = True  # WB10
        elif (lc == MIDNUM or lc in _MIDNUMLETQ) and rc == NUMERIC:
            j = prev_base[li]
            no_break = j >= 0 and cls[j] == NUMERIC  # WB11
        elif lc == NUMERIC and (rc == MIDNUM or rc in _MIDNUMLETQ):
            no_break = next_base_cls(i) == NUMERIC  # WB12
        elif lc == KATAKANA and rc == KATAKANA:
            no_break = True  # WB13
        elif lc in (*_AHLETTER, NUMERIC, KATAKANA, EXTENDNUMLET) and rc == EXTENDNUMLET:
            no_break = True  # WB13a
        elif lc == EXTENDNUMLET and rc in (*_AHLETTER, NUMERIC, KATAKANA):
            no_break = True  # WB13b
        elif lc == RI and rc == RI:
            no_break = (ri_count % 2) == 1  # WB15/WB16: pair them up
        # WB999: otherwise break
        breaks[i] = 0 if no_break else 1
    return [i for i in range(n + 1) if breaks[i]]


def _segment_type(seg_cls: list[int]) -> str | None:
    """Token type of a segment, or None if it is not a token
    (rule->type mapping of StandardTokenizerImpl.jflex:208-252)."""
    s = set(seg_cls)
    if IDEOGRAPHIC in s:
        return TYPE_IDEOGRAPHIC
    if HIRAGANA in s:
        return TYPE_HIRAGANA
    if HANGUL in s:
        return TYPE_HANGUL
    if EXT_PICT in s or RI in s:
        return TYPE_EMOJI
    if NUMERIC in s and not (s & set(_AHLETTER)):
        return TYPE_NUM
    if s & set(_AHLETTER):
        return TYPE_ALPHANUM
    if KATAKANA in s:
        return TYPE_KATAKANA
    return None


# Java Character.toLowerCase(int) is per-codepoint; Python str.lower() does
# full (possibly 1->N) case mapping. Divergent codepoints get an explicit map.
_SIMPLE_LOWER_OVERRIDES = {0x0130: "i"}  # LATIN CAPITAL I WITH DOT ABOVE


def _lowercase(term: str) -> str:
    # ASCII fast path: str.lower() == per-codepoint Character.toLowerCase
    # for the ASCII range (no multi-char expansions there)
    if term.isascii():
        return term.lower()
    out = []
    for ch in term:
        cp = ord(ch)
        if cp in _SIMPLE_LOWER_OVERRIDES:
            out.append(_SIMPLE_LOWER_OVERRIDES[cp])
            continue
        low = ch.lower()
        out.append(low if len(low) == 1 else ch)
    return "".join(out)


# ASCII fast path: on pure-ASCII text the UAX#29 rules collapse exactly to
# this regex. ASCII word-break classes: ALetter=[A-Za-z], Numeric=[0-9],
# ExtendNumLet=[_], MidNumLet=[.], SingleQuote=['], MidNum=[,;] — no Extend/
# Format/ZWJ/RI/CJK exist below 0x80. WB5/9/10/13a/13b fuse [A-Za-z0-9_]
# runs; WB6+WB7 admit an interior [.'] between letters; WB11+WB12 admit an
# interior [.,;'] between digits; everything else breaks (WB999).
# Equivalence to the DFA path is enforced by a differential test.
_ASCII_RE = re.compile(
    r"(?:[A-Za-z0-9_]|(?<=[A-Za-z])[.'](?=[A-Za-z])|(?<=[0-9])[.,;'](?=[0-9]))+"
)
_HAS_ALPHA = re.compile(r"[A-Za-z]")
_HAS_DIGIT = re.compile(r"[0-9]")


def _tokenize_ascii(text: str, max_token_length: int) -> list[Token]:
    tokens: list[Token] = []
    position = -1
    skipped = 0
    for m in _ASCII_RE.finditer(text):
        seg = m.group()
        if _HAS_ALPHA.search(seg):
            ttype = TYPE_ALPHANUM
        elif _HAS_DIGIT.search(seg):
            ttype = TYPE_NUM
        else:
            continue  # underscores-only run: ExtendNumLet alone is no token
        if len(seg) > max_token_length:
            skipped += 1
            continue
        position += 1 + skipped
        skipped = 0
        tokens.append(Token(seg, position, m.start(), m.end(), ttype))
    return tokens


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[Token]:
    """StandardTokenizer: UAX#29 segments that carry a token type; segments
    longer than max_token_length are skipped but still advance the position."""
    if text.isascii():
        return _tokenize_ascii(text, max_token_length)
    cps = [ord(c) for c in text]
    cls = [_wb_class(c) for c in cps]
    bounds = _boundaries(cps, cls)
    tokens: list[Token] = []
    position = -1
    skipped = 0
    for a, b in zip(bounds, bounds[1:]):
        seg_cls = cls[a:b]
        ttype = _segment_type(seg_cls)
        if ttype is None:
            continue
        # CJK single-char emission: the JFlex grammar emits IDEOGRAPHIC and
        # HIRAGANA one char at a time (script runs don't merge in UAX#29:
        # each ideograph is its own segment already), so nothing special here.
        if b - a > max_token_length:
            skipped += 1
            continue
        position += 1 + skipped
        skipped = 0
        tokens.append(Token(text[a:b], position, a, b, ttype))
    return tokens


_HAS_ALNUM = re.compile(r"[A-Za-z0-9]")


def analyze_terms_positions(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int]]:
    """Bulk analyze: ``([t.term ...], [t.position ...])`` of :func:`analyze`,
    without building Token objects — the index-build hot path (2M+ tokens per
    segment group make per-token objects the dominant allocator load).

    ASCII texts lowercase ONCE up front (C-speed ``str.lower``; ASCII word
    boundaries are case-insensitive so tokenize∘lower ≡ lower∘tokenize
    there) and read terms straight off the regex matches. Non-ASCII texts
    fall back to the full DFA chain. Differentially tested against
    :func:`analyze`."""
    if not text:
        return [], []
    if not text.isascii():
        toks = analyze(text, stopwords=stopwords, max_token_length=max_token_length)
        return [t.term for t in toks], [t.position for t in toks]
    terms: list[str] = []
    positions: list[int] = []
    position = -1
    skipped = 0
    sw = stopwords if stopwords else None
    for m in _ASCII_RE.finditer(text.lower()):
        seg = m.group()
        if "_" in seg and not _HAS_ALNUM.search(seg):
            continue  # ExtendNumLet-only run is no token
        if len(seg) > max_token_length:
            skipped += 1  # skipped-but-position-counted (StandardTokenizer.java:152-175)
            continue
        position += 1 + skipped
        skipped = 0
        if sw is not None and seg in sw:
            continue  # StopFilter: drop, keep the position increment
        terms.append(seg)
        positions.append(position)
    return terms, positions


def analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """Full chain: tokenize -> lowercase -> stop filter.

    Stop filtering preserves position increments (FilteringTokenFilter
    semantics): surviving tokens keep their pre-filter positions.
    StandardAnalyzer semantics = ``stopwords=None`` (empty set).
    """
    out: list[Token] = []
    for tok in tokenize(text, max_token_length):
        term = _lowercase(tok.term)
        if stopwords and term in stopwords:
            continue
        out.append(Token(term, tok.position, tok.start, tok.end, tok.type))
    return out
