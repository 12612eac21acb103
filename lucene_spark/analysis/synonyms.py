"""Index-time synonym expansion (analysis/common/src/java/org/apache/
lucene/analysis/synonym/SynonymGraphFilter.java, single-token rules).

A rule maps one analyzed term to one or more replacement/addition terms;
emitted synonyms stack at the source token's position (posIncr 0 — the
side-path of the synonym graph), so phrase/interval positions and the
discountOverlaps norm (distinct positions) are preserved. With
``keep_original=False`` the source token is replaced
(SynonymMap.Builder add(keepOrig) semantics).

Scope: single-token → single-token(s) rules only. Multi-word inputs and
outputs build a token *graph* (held positions + posLength) that the
flattened index form cannot represent faithfully — Lucene itself documents
that indexing a graph with multi-word synonyms is lossy
(SynonymGraphFilter class javadoc: "Lucene cannot yet index an arbitrary
graph") and applications flatten it; multi-word rules raise here instead
of silently flattening.

The chain applies AFTER the base analyzer's own term filters (rules are
keyed on fully analyzed terms), mirroring a filter appended to the end of
createComponents. The build path applies the same rules as a
vocabulary-level vectorized post-pass (vectorized._synonym_post).
"""

from __future__ import annotations

from .tokenizer import Token

__all__ = ["check_rules", "synonym_tokens"]


def check_rules(rules: dict) -> dict[str, tuple[str, ...]]:
    """Validate and normalize {term: synonym | [synonyms...]} rules."""
    out: dict[str, tuple[str, ...]] = {}
    for k, v in rules.items():
        alts = (v,) if isinstance(v, str) else tuple(v)
        if " " in k or any(" " in a for a in alts):
            raise ValueError(
                "multi-word synonym rules are not supported (graph tokens)"
            )
        out[k] = alts
    return out


def synonym_tokens(
    tokens: list[Token],
    rules: dict[str, tuple[str, ...]],
    keep_original: bool = True,
) -> list[Token]:
    out: list[Token] = []
    for t in tokens:
        alts = rules.get(t.term)
        if alts is None or keep_original:
            out.append(t)
        if alts:
            out.extend(
                Token(a, t.position, t.start, t.end, "SYNONYM") for a in alts
            )
    return out
