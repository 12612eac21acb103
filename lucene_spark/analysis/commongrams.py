"""CommonGramsFilter: stacked word-pair tokens around common words — the
phrase-speed trick of indexing "the_quick" so phrases crossing stopwords
never need position lookups for the common term.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
commongrams/CommonGramsFilter.java:96-167 — a bigram token (SEPARATOR '_',
type "gram", positionIncrement 0, positionLength 2) is emitted for every
ADJACENT pair where the previous token was common OR the current token is
common (``lastWasCommon || isCommon() && buffer nonempty``); the gram
lands at the FIRST word's position (its posIncrement-0 stacks it on the
just-emitted previous token) and both unigrams are kept — CommonGrams runs
INSTEAD of StopFilter, not after it.

The common-words set plays the role Lucene's constructor ``commonWords``
does and is conventionally the stop list; the ``stopwords`` parameter here
IS that set (defaulting to ENGLISH_STOP_WORDS), and nothing is removed.

Norm semantics downstream: doc length counts DISTINCT output positions
(grams stack at posIncr 0), so lengths match the plain standard chain.
"""

from __future__ import annotations

from ..constants import ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "common_grams_tokens",
    "common_grams_analyze",
    "common_grams_terms_positions",
]

SEPARATOR = "_"  # CommonGramsFilter.SEPARATOR


def common_grams_tokens(
    tokens: list[Token], common_words: frozenset[str]
) -> list[Token]:
    out: list[Token] = []
    prev: Token | None = None
    prev_was_common = False
    for t in tokens:
        cur_common = t.term in common_words
        if prev is not None and (prev_was_common or cur_common):
            out.append(
                Token(
                    prev.term + SEPARATOR + t.term,
                    prev.position,
                    prev.start,
                    t.end,
                    "gram",
                )
            )
        out.append(t)
        prev, prev_was_common = t, cur_common
    return out


def common_grams_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """standard chain (NO stop removal) -> unigrams + common-word bigrams;
    ``stopwords`` is the commonWords set (ENGLISH_STOP_WORDS default)."""
    common = stopwords if stopwords is not None else ENGLISH_STOP_WORDS
    toks = _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    )
    return common_grams_tokens(toks, common)


def common_grams_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = common_grams_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
