"""Character n-gram token filters (analysis/common/src/java/org/apache/
lucene/analysis/ngram/NGramTokenFilter.java and EdgeNGramTokenFilter.java).

Emission order per source token = start ascending, gram length ascending
(the curPos/curGramSize loop, NGramTokenFilter.java:98-147); every gram of
a token shares the token's position (first gram carries the accumulated
posIncr, the rest posIncr=0). Tokens shorter than min_gram emit nothing
(leaving a position hole) unless preserve_original; tokens longer than
max_gram additionally re-emit the original when preserve_original
(NGramTokenFilter.java:111-117, :136-143).

Field-length norms downstream count distinct output positions — i.e. one
per source token that produced output — matching Lucene's discountOverlaps
count of posIncr>=1 tokens.
"""

from __future__ import annotations

from .tokenizer import MAX_TOKEN_LENGTH, Token, analyze

__all__ = [
    "ngram_tokens",
    "edge_ngram_tokens",
    "ngram_analyze",
    "edge_ngram_analyze",
]


def _grams(term: str, min_gram: int, max_gram: int, edge: bool) -> list[str]:
    n = len(term)
    out: list[str] = []
    starts = (0,) if edge else range(n)
    for s in starts:
        for k in range(min_gram, max_gram + 1):
            if s + k > n:
                break
            out.append(term[s : s + k])
    return out


def _apply(
    tokens: list[Token],
    min_gram: int,
    max_gram: int,
    preserve_original: bool,
    edge: bool,
) -> list[Token]:
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    out: list[Token] = []
    for t in tokens:
        n = len(t.term)
        if preserve_original and n < min_gram:
            out.append(t)
            continue
        for g in _grams(t.term, min_gram, max_gram, edge):
            out.append(Token(g, t.position, t.start, t.end, "gram"))
        if preserve_original and n > max_gram:
            out.append(t)
    return out


def ngram_tokens(
    tokens: list[Token],
    min_gram: int,
    max_gram: int,
    preserve_original: bool = False,
) -> list[Token]:
    return _apply(tokens, min_gram, max_gram, preserve_original, edge=False)


def edge_ngram_tokens(
    tokens: list[Token],
    min_gram: int,
    max_gram: int,
    preserve_original: bool = False,
) -> list[Token]:
    return _apply(tokens, min_gram, max_gram, preserve_original, edge=True)


def ngram_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """standard chain -> trigrams (the common fuzzy-match index config)."""
    return ngram_tokens(analyze(text, stopwords, max_token_length), 3, 3)


def edge_ngram_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """standard chain -> edge grams 2..4 (the common autocomplete config)."""
    return edge_ngram_tokens(analyze(text, stopwords, max_token_length), 2, 4)
