"""User-registered analyzers — the Analyzer extension point, plus the
KeywordMarker / StemmerOverride building blocks.

Behavioral references:
- org.apache.lucene.analysis.Analyzer (the subclass-to-extend contract):
  any per-term chain registered here becomes a first-class analyzer name
  usable by ``build_index(analyzer=...)`` and ``Searcher(analyzer=...)``,
  running on the vectorized vocabulary-remap lane like the built-ins.
- analysis/miscellaneous/SetKeywordMarkerFilter.java: terms in the
  keyword set are marked and the downstream stemmer skips them.
- analysis/miscellaneous/StemmerOverrideFilter.java:43-60: a dictionary
  term → replacement applied BEFORE the stemmer; a hit also sets the
  keyword attribute so the stemmer leaves the replacement alone.

Registered chains must be pure per-term transforms
``fn(term, stopwords) -> str | None`` (None drops the token, keeping the
position gap) — the contract every built-in language chain follows.
"""

from __future__ import annotations

from typing import Callable

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "register_token_analyzer",
    "custom_token_entry",
    "register_term_analyzer",
    "custom_term_fn",
    "custom_analyze_fn",
    "custom_terms_positions_fn",
    "english_with_overrides",
]

_REGISTRY: dict[str, Callable] = {}
# full token-chain analyzers: name -> (analyze_fn(text, stopwords,
# max_token_length) -> list[Token], distinct_positions) — for stream
# filters that aren't per-term transforms (fingerprint, capture groups,
# token-count limits; see analysis/filters.py)
_TOKEN_REGISTRY: dict[str, tuple[Callable, bool]] = {}


def register_token_analyzer(
    name: str, analyze_fn: Callable, distinct_positions: bool = False
) -> None:
    """Register a FULL token-chain analyzer (list[Token] out). Use
    :func:`register_term_analyzer` for pure per-term chains — those run
    on the vectorized vocabulary-remap lane; token analyzers run the
    exact per-document lane. ``distinct_positions`` makes doc length
    count distinct positions (discountOverlaps) for chains that stack
    tokens at one position."""
    if not callable(analyze_fn):
        raise TypeError("analyze_fn must be callable")
    _TOKEN_REGISTRY[name] = (analyze_fn, bool(distinct_positions))


def custom_token_entry(name: str):
    return _TOKEN_REGISTRY.get(name)


def register_term_analyzer(name: str, term_fn: Callable) -> None:
    """Register ``term_fn(term, stopwords) -> str | None`` as analyzer
    ``name``. Re-registering the same name replaces the chain (idempotent
    setup code just re-registers)."""
    if not callable(term_fn):
        raise TypeError("term_fn must be callable")
    _REGISTRY[name] = term_fn


def custom_term_fn(name: str):
    return _REGISTRY.get(name)


def custom_analyze_fn(name: str):
    """Token-chain adapter for a registered per-term analyzer (the
    Token-object lane used by the oracle and query analysis); full
    token-chain registrations resolve directly."""
    tok = _TOKEN_REGISTRY.get(name)
    if tok is not None:
        return tok[0]
    term_fn = _REGISTRY.get(name)
    if term_fn is None:
        return None

    def analyze_fn(
        text: str,
        stopwords=None,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ) -> list[Token]:
        out: list[Token] = []
        for tok in _standard_analyze(
            text, stopwords=None, max_token_length=max_token_length
        ):
            t = term_fn(tok.term, stopwords)
            if t is None:
                continue
            out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
        return out

    return analyze_fn


def custom_terms_positions_fn(name: str):
    analyze_fn = custom_analyze_fn(name)
    if analyze_fn is None:
        return None

    def terms_positions(text: str, stopwords=None):
        toks = analyze_fn(text, stopwords)
        return [t.term for t in toks], [t.position for t in toks]

    return terms_positions


def english_with_overrides(
    overrides: dict[str, str] | None = None,
    keywords: frozenset[str] | set[str] | None = None,
) -> Callable:
    """The English chain with StemmerOverrideFilter + SetKeywordMarkerFilter
    inserted before the Porter stemmer (the canonical protected-terms
    setup): possessive strip → stop → override dict (hit = replaced AND
    protected) → keyword set (protected) → Porter. Overrides and keywords
    match the post-possessive, pre-stem surface form."""
    from .en import strip_possessive
    from .porter import porter_stem

    ov = dict(overrides or {})
    kw = frozenset(keywords or ())

    def term_fn(term: str, stopwords) -> str | None:
        t = strip_possessive(term)
        if stopwords and t in stopwords:
            return None
        hit = ov.get(t)
        if hit is not None:
            return hit  # StemmerOverrideFilter: replaced and keyword-marked
        if t in kw:
            return t  # SetKeywordMarkerFilter: stemmer skips
        return porter_stem(t)

    return term_fn
