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

__all__ = ["check_rules", "synonym_tokens", "synonym_graph_paths"]


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


def synonym_graph_paths(
    terms: list[str],
    rules: dict,
    keep_original: bool = True,
    max_paths: int = 256,
) -> tuple[tuple[str, ...], ...]:
    """QUERY-side multi-word synonym graph (SynonymGraphFilter.java:41
    semantics at the QueryBuilder graph path): overlay {phrase: phrase(s)}
    rules on an analyzed term sequence and enumerate the accepted paths of
    the resulting token graph — the input for TermAutomatonQuery, which
    matches alternatives that consume DIFFERENT numbers of positions
    (exactly what the flattened index form cannot represent; this is why
    multi-word rules belong at query time).

    Matching follows SynonymMap's FST semantics: at each position the
    LONGEST rule input wins (greedy, non-overlapping); the original span
    stays as a path unless ``keep_original=False``. Rule inputs/outputs are
    space-separated ANALYZED terms."""
    norm: dict[tuple[str, ...], tuple[tuple[str, ...], ...]] = {}
    for k, v in rules.items():
        kt = tuple(str(k).split())
        alts = (v,) if isinstance(v, str) else tuple(v)
        outs = tuple(tuple(str(a).split()) for a in alts)
        if not kt or any(not o for o in outs):
            raise ValueError("empty phrase in synonym rule")
        norm[kt] = outs
    by_first: dict[str, list[tuple[tuple[str, ...], tuple]]] = {}
    for kt, outs in norm.items():
        by_first.setdefault(kt[0], []).append((kt, outs))

    memo: dict[int, list[tuple[str, ...]]] = {}

    def expand(i: int) -> list[tuple[str, ...]]:
        if i >= len(terms):
            return [()]
        if i in memo:
            return memo[i]
        match = None
        for kt, outs in by_first.get(terms[i], ()):
            if tuple(terms[i : i + len(kt)]) == kt and (
                match is None or len(kt) > len(match[0])
            ):
                match = (kt, outs)
        out: list[tuple[str, ...]] = []
        if match is not None:
            kt, outs = match
            rest = expand(i + len(kt))
            heads = ([kt] if keep_original else []) + list(outs)
            for h in heads:
                out.extend(h + s for s in rest)
        else:
            out.extend((terms[i],) + s for s in expand(i + 1))
        if len(out) > max_paths:
            raise ValueError(f"more than {max_paths} synonym-graph paths")
        memo[i] = out
        return out

    paths = tuple(dict.fromkeys(p for p in expand(0) if p))
    if not paths:
        raise ValueError("synonym graph produced no paths")
    return paths


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
