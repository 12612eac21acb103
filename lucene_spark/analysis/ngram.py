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
    "ngram_tokenizer_tokens",
    "register_ngram_tokenizer",
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


def ngram_tokenizer_tokens(text: str, n: int = 2, lowercase: bool = True) -> list[Token]:
    """NGramTokenizer (analysis/ngram/NGramTokenizer.java:40) with a fixed
    gram size: character n-grams over the RAW char stream (every char is a
    token char, spaces included — the default isTokenChar) at CONSECUTIVE
    positions — gram i covers chars [i, i+n) at position i. This is the
    field shape NGramPhraseQuery optimizes ("ABCD" on a 2-gram field
    indexes AB/0 BC/1 CD/2). ``lowercase`` prepends the usual
    LowerCaseFilter step of the CJK/ngram chains."""
    if n < 1:
        raise ValueError("gram size must be >= 1")
    t = text.lower() if lowercase else text
    return [
        Token(t[i : i + n], i, i, i + n, "gram")
        for i in range(len(t) - n + 1)
    ]


def register_ngram_tokenizer(name: str, n: int = 2, lowercase: bool = True) -> None:
    """Register a fixed-size character n-gram TOKENIZER analyzer (full
    token-chain lane; sequential positions, so phrase queries over grams
    work — the NGramPhraseQuery field)."""
    from .custom import register_token_analyzer

    def analyze_fn(text, stopwords=None, max_token_length=MAX_TOKEN_LENGTH):
        return ngram_tokenizer_tokens(text, n, lowercase)

    register_token_analyzer(name, analyze_fn)
