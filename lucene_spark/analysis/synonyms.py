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

__all__ = [
    "check_rules",
    "synonym_tokens",
    "synonym_graph_paths",
    "parse_solr_synonyms",
    "parse_wordnet_synonyms",
]


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


def _unescape(tok: str) -> str:
    out, i = [], 0
    while i < len(tok):
        if tok[i] == "\\" and i + 1 < len(tok):
            out.append(tok[i + 1])
            i += 2
        else:
            out.append(tok[i])
            i += 1
    return "".join(out)


def _split_escaped(text: str, sep: str) -> list[str]:
    """Split on ``sep`` honoring backslash escapes (SynonymMap rule
    syntax: ``\\,`` and ``\\ `` are literal characters)."""
    parts, cur, i = [], [], 0
    while i < len(text):
        ch = text[i]
        if ch == "\\" and i + 1 < len(text):
            cur.append(text[i : i + 2])
            i += 2
            continue
        if text.startswith(sep, i):
            parts.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _merge_rule(rules: dict, key: str, outs: tuple[str, ...]) -> None:
    prev = rules.get(key, ())
    merged = tuple(dict.fromkeys(tuple(prev) + outs))
    rules[key] = merged


def parse_solr_synonyms(text: str, expand: bool = True) -> dict:
    """Solr synonyms format (analysis/common/.../synonym/SolrSynonymParser
    .java:25-45 javadoc grammar):

    - blank lines and lines starting with ``#`` are ignored
    - ``a, b => c, d``: each input maps to every output
    - ``a, b, c`` (no ``=>``): with ``expand=True`` every term maps to all
      terms of the group (including itself, matching SynonymMap expand);
      with ``expand=False`` every term maps to the FIRST
    - ``\\,``, ``\\ `` and ``\\=>`` escape the separators

    Returns {input: (outputs...)} — single-word rules feed the index-time
    chain (``build_index(synonyms=...)``), multi-word rules the query-side
    graph (``synonym_graph_paths``). Multiple rules for one input merge
    (SynonymMap.Builder.add accumulates)."""
    rules: dict = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line.replace("\\=>", "\x00"):
            lhs, rhs = _split_escaped(line, "=>")[:2]
            inputs = [
                " ".join(_unescape(t).split())
                for t in _split_escaped(lhs, ",")
            ]
            outputs = tuple(
                " ".join(_unescape(t).split())
                for t in _split_escaped(rhs, ",")
            )
            outputs = tuple(o for o in outputs if o)
            for inp in inputs:
                if inp:
                    _merge_rule(rules, inp, outputs)
        else:
            group = [
                " ".join(_unescape(t).split())
                for t in _split_escaped(line, ",")
            ]
            group = [g for g in group if g]
            if len(group) < 2:
                continue
            for g in group:
                if expand:
                    _merge_rule(rules, g, tuple(group))
                else:
                    _merge_rule(rules, g, (group[0],))
    return rules


def parse_wordnet_synonyms(text: str, expand: bool = True) -> dict:
    """WordNet prolog format (analysis/common/.../synonym/WordnetSynonym-
    Parser.java: lines ``s(<synset>,<num>,'<word>',...).``): words sharing
    a synset id are synonyms. ``expand`` semantics as in
    :func:`parse_solr_synonyms`. Quoted words use ``''`` for a literal
    quote."""
    import re as _re

    synsets: dict[str, list[str]] = {}
    pat = _re.compile(r"^s\(\s*(\d+)\s*,\s*\d+\s*,\s*'((?:[^']|'')*)'")
    for raw in text.splitlines():
        line = raw.strip()
        if not line.startswith("s("):
            continue
        m = pat.match(line)
        if not m:
            raise ValueError(f"unparseable wordnet line: {line!r}")
        word = m.group(2).replace("''", "'")
        group = synsets.setdefault(m.group(1), [])
        if word not in group:
            group.append(word)
    rules: dict = {}
    for group in synsets.values():
        if len(group) < 2:
            continue
        for g in group:
            if expand:
                _merge_rule(rules, g, tuple(group))
            else:
                _merge_rule(rules, g, (group[0],))
    return rules
