"""CJK analysis chain: StandardTokenizer → lowercase → CJK bigrams → stop.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
cjk/CJKAnalyzer.java:38 (createComponents: StandardTokenizer,
CJKWidthFilter, LowerCaseFilter, CJKBigramFilter, StopFilter) and
cjk/CJKBigramFilter.java:40-90 — overlapping bigrams over ADJACENT
single-character CJK tokens. The StandardTokenizer already emits Han
(IDEOGRAPHIC) and Hiragana codepoints as single-character tokens, so the
bigram filter here joins runs of consecutive-position single-char tokens of
those types:

- a run of n (n ≥ 2) adjacent CJK chars → n-1 overlapping bigrams, each at
  the position of its first character (the flattened posIncrement=1 form
  Lucene indexes);
- a LONE CJK char (run of 1) → emitted as a unigram, Lucene's
  outputUnigrams-for-singletons fallback (HanUnigramQuery shape);
- non-CJK tokens (ALPHANUM, NUM, KATAKANA runs, HANGUL runs) pass through
  with positions renumbered to stay dense.

Width folding (CJKWidthFilter: full-width ASCII → half-width, half-width
katakana → full-width) is applied to the raw text up front via NFKC on the
affected ranges.
"""

from __future__ import annotations

import unicodedata

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import (
    TYPE_HIRAGANA,
    TYPE_IDEOGRAPHIC,
    Token,
    analyze as _standard_analyze,
)

__all__ = ["cjk_analyze", "cjk_terms_positions", "cjk_width_fold"]

_BIGRAM_TYPES = (TYPE_IDEOGRAPHIC, TYPE_HIRAGANA)
_TYPE_BIGRAM = "<DOUBLE>"  # CJKBigramFilter's DOUBLE_TYPE


def cjk_width_fold(text: str) -> str:
    """CJKWidthFilter analog: NFKC-fold only the full-width/half-width
    forms block (U+FF00-FFEF) so ＦＵＬＬ→full and ﾊﾝｶｸ→ハンカク without
    touching anything else."""
    if not any("＀" <= ch <= "￯" for ch in text):
        return text
    return "".join(
        unicodedata.normalize("NFKC", ch) if "＀" <= ch <= "￯" else ch
        for ch in text
    )


def cjk_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    base = _standard_analyze(
        cjk_width_fold(text), stopwords=None, max_token_length=max_token_length
    )
    out: list[Token] = []
    pos = 0
    i = 0
    n = len(base)
    while i < n:
        t = base[i]
        if t.type in _BIGRAM_TYPES and len(t.term) == 1:
            # collect the run of adjacent single-char CJK tokens
            j = i
            while (
                j + 1 < n
                and base[j + 1].type in _BIGRAM_TYPES
                and len(base[j + 1].term) == 1
                and base[j + 1].position == base[j].position + 1
            ):
                j += 1
            run = base[i : j + 1]
            if len(run) == 1:
                term = run[0].term
                # StopFilter semantics: a dropped token still advances the
                # position (gap preserved for phrase/interval queries)
                if not (stopwords and term in stopwords):
                    out.append(
                        Token(term, pos, run[0].start, run[0].end, run[0].type)
                    )
                pos += 1
            else:
                for a, b in zip(run, run[1:]):
                    term = a.term + b.term
                    if not (stopwords and term in stopwords):
                        out.append(Token(term, pos, a.start, b.end, _TYPE_BIGRAM))
                    pos += 1
            i = j + 1
        else:
            if not (stopwords and t.term in stopwords):
                out.append(Token(t.term, pos, t.start, t.end, t.type))
            pos += 1
            i += 1
    return out


def cjk_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = cjk_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
