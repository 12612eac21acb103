"""ShingleFilter: word n-grams over the token stream with filler tokens
for position holes (analysis/common/src/java/org/apache/lucene/analysis/
shingle/ShingleFilter.java).

Model (verified against TestShingleFilter.java BI_GRAM_* fixtures,
including the WITH_HOLES vectors at :83-128): the filter sees a *virtual*
stream over positions 0..last_real_position where stop-filtered holes hold
the filler token "_" (DEFAULT_FILLER_TOKEN, :45). For every window of k
consecutive virtual positions (k in [min_size, max_size]) that lies within
the stream extent and contains at least one real token, it emits the
sep-joined window at the window-start position; real tokens are also
emitted as unigrams (outputUnigrams default, :84), ordered
unigram-then-growing-shingles per position (BI_GRAM_TOKENS fixture order).

Norm semantics downstream: Lucene's discountOverlaps field length counts
tokens with posIncr >= 1 — exactly the count of DISTINCT positions carrying
output tokens (hole-start shingles like "_ sentence" occupy their own
position and DO count: BI_GRAM_POSITION_INCREMENTS_WITH_HOLES). The
builder and PyIndex both compute doc length as distinct output positions.

Offsets: the reference stretches shingle offsets across filler spans; here
they span first-to-last REAL component (offsets are not indexed, only
term+position are).
"""

from __future__ import annotations

from .tokenizer import MAX_TOKEN_LENGTH, Token, analyze

__all__ = ["shingle_tokens", "shingle_analyze", "shingle_terms_positions"]

FILLER = "_"
SEP = " "


def shingle_tokens(
    tokens: list[Token],
    min_size: int = 2,
    max_size: int = 2,
    output_unigrams: bool = True,
    filler: str = FILLER,
    sep: str = SEP,
) -> list[Token]:
    if min_size < 2 or max_size < min_size:
        raise ValueError("need 2 <= min_size <= max_size")
    if not tokens:
        return []
    by_pos = {t.position: t for t in tokens}
    last = tokens[-1].position
    out: list[Token] = []
    for p in range(0, last + 1):
        t = by_pos.get(p)
        if output_unigrams and t is not None:
            out.append(t)
        for k in range(min_size, max_size + 1):
            if p + k - 1 > last:
                break
            window = [by_pos.get(q) for q in range(p, p + k)]
            reals = [w for w in window if w is not None]
            if not reals:
                continue
            term = sep.join(
                filler if w is None else w.term for w in window
            )
            out.append(Token(term, p, reals[0].start, reals[-1].end, "shingle"))
    return out


def shingle_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """standard chain -> bigram shingles + unigrams (ShingleFilter
    defaults: DEFAULT_MIN/MAX_SHINGLE_SIZE = 2, ShingleFilter.java:48-51)."""
    return shingle_tokens(analyze(text, stopwords, max_token_length))


def shingle_terms_positions(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int]]:
    toks = shingle_analyze(text, stopwords, max_token_length)
    return [t.term for t in toks], [t.position for t in toks]
