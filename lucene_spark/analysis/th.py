"""Thai analysis (ThaiAnalyzer analog with a rule-based segmenter).

Behavioral reference: analysis/common/src/java/org/apache/lucene/
analysis/th/ThaiAnalyzer.java:42 (createComponents: ThaiTokenizer →
LowerCaseFilter → DecimalDigitFilter → StopFilter) and
th/ThaiTokenizer.java:36 (SegmentingTokenizerBase over the JDK's
dictionary-based Thai BreakIterator; non-Thai runs tokenize like
standard text).

The JDK BreakIterator's Thai dictionary is DATA this repo does not ship.
The documented fallback is a MAXIMAL-MATCHING segmenter over a
user-supplied wordlist (the standard one-word-per-line format of the
public libthai / ICU dictionary sources — pass ``wordlist=`` /
``thai_wordlist(lines)``), the classical longest-match algorithm for
Thai (Poowarawan 1986, the same family the JDK dictionary iterator
implements). A small built-in demo wordlist exercises the mechanism and
is the test fixture; consecutive characters with no dictionary match
group into one unknown token (keeping unknown spans searchable, the
same grouping rule as the CJK/lattice unknown classes).

DecimalDigitFilter folds Thai digits ๐-๙ (U+0E50-U+0E59) to ASCII
0-9 (analysis/common/.../core/DecimalDigitFilter.java). ThaiAnalyzer's
default stopword file is data (not shipped); pass ``stopwords=``.
"""

from __future__ import annotations

import re

from .tokenizer import MAX_TOKEN_LENGTH, Token, analyze

__all__ = [
    "thai_analyze",
    "thai_terms_positions",
    "thai_wordlist",
    "DEMO_WORDLIST",
]

_THAI_RE = re.compile(r"[฀-๿]+")

# demo lexicon (common Thai words, hand-picked — the test fixture; real
# deployments mount a full wordlist via ``wordlist=``)
DEMO_WORDLIST = frozenset({
    "เศรษฐกิจ",      # economy
    "หนังสือพิมพ์",   # newspaper
    "หนังสือ",        # book
    "พิมพ์",          # print
    "มหาวิทยาลัย",    # university
    "สนามบิน",       # airport
    "สนาม",          # field
    "บิน",            # fly
    "เทคโนโลยี",     # technology
    "ทำงาน",         # work
    "ทำ",            # do
    "งาน",           # task
    "ภาษา",          # language
    "ไทย",           # Thai
    "คน",            # person
    "และ",           # and
    "ที่",            # at/that
    "ใน",            # in
})


def thai_wordlist(lines) -> frozenset[str]:
    """Load a user-supplied wordlist (one word per line, ``#`` comments —
    the public libthai/ICU dictionary-source format)."""
    out = set()
    for raw in lines:
        w = raw.strip()
        if w and not w.startswith("#"):
            out.add(w)
    return frozenset(out)


def _segment_thai(run: str, words: frozenset[str], max_len: int) -> list[str]:
    """Greedy longest-match over one Thai-script run; unmatched chars
    group into one unknown token until the next dictionary match."""
    out: list[str] = []
    unk: list[str] = []
    i, n = 0, len(run)
    while i < n:
        best = 0
        cap = min(max_len, n - i)
        for ln in range(cap, 0, -1):
            if run[i: i + ln] in words:
                best = ln
                break
        if best:
            if unk:
                out.append("".join(unk))
                unk = []
            out.append(run[i: i + best])
            i += best
        else:
            unk.append(run[i])
            i += 1
    if unk:
        out.append("".join(unk))
    return out


_TH_DIGITS = str.maketrans({chr(0x0E50 + d): str(d) for d in range(10)})


def thai_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    wordlist: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """Full ThaiAnalyzer chain over one document: Thai-script runs segment
    by maximal matching over ``wordlist`` (default: the demo lexicon);
    everything between them runs the standard chain (ThaiTokenizer's
    non-Thai clause). Dropped stopwords advance the position (StopFilter
    gap semantics)."""
    if not text:
        return []
    words = wordlist if wordlist is not None else DEMO_WORDLIST
    # cap the longest-match probe at the longest dictionary entry — the
    # per-position scan is O(run·cap) membership tests, and real
    # wordlists are far shorter than MAX_TOKEN_LENGTH=255
    max_probe = min(max_token_length,
                    max(map(len, words)) if words else 1)
    out: list[Token] = []
    pos = -1
    last = 0

    def _emit_other(seg: str, base: int) -> None:
        nonlocal pos
        for t in analyze(seg, stopwords=None,
                         max_token_length=max_token_length):
            pos += 1
            term = t.term.translate(_TH_DIGITS)
            if stopwords and term in stopwords:
                continue
            out.append(Token(term, pos, base + t.start, base + t.end, t.type))

    for m in _THAI_RE.finditer(text):
        if m.start() > last:
            _emit_other(text[last: m.start()], last)
        off = m.start()
        for piece in _segment_thai(m.group(), words, max_probe):
            pos += 1
            term = piece.lower().translate(_TH_DIGITS)
            if stopwords and term in stopwords:
                off += len(piece)
                continue
            if len(term) <= max_token_length:
                out.append(
                    Token(term, pos, off, off + len(piece), "<THAI>")
                )
            off += len(piece)
        last = m.end()
    if last < len(text):
        _emit_other(text[last:], last)
    return out


def thai_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = thai_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
