"""Index-time synonym expansion (analysis/common/src/java/org/apache/
lucene/analysis/synonym/SynonymGraphFilter.java, single-token rules).

A rule maps one analyzed term to one or more replacement/addition terms;
emitted synonyms stack at the source token's position (posIncr 0 — the
side-path of the synonym graph), so phrase/interval positions and the
discountOverlaps norm (distinct positions) are preserved. With
``keep_original=False`` the source token is replaced
(SynonymMap.Builder add(keepOrig) semantics).

Single-token → single-token(s) rules run as the stacked fast path above.
Multi-word inputs/outputs build a token *graph* (held positions +
posLength); Lucene documents that indexing such a graph is lossy
(SynonymGraphFilter class javadoc: "Lucene cannot yet index an arbitrary
graph") and indexes it through FlattenGraphFilter — this module now ships
that exact chain (synonym_graph_stream → flatten_graph →
apply_synonym_graph, verified against both filters' reference test
vectors), and build_index routes multi-word rule sets through it
automatically. The historical check_rules default still rejects
multi-word rules so the single-token API keeps its contract; pass
allow_graph=True (build_index does) to accept them.

The chain applies AFTER the base analyzer's own term filters (rules are
keyed on fully analyzed terms), mirroring a filter appended to the end of
createComponents. The build path applies the same rules as a
vocabulary-level vectorized post-pass (vectorized._synonym_post).
"""

from __future__ import annotations

from .tokenizer import Token

__all__ = [
    "check_rules",
    "rules_need_graph",
    "synonym_tokens",
    "synonym_graph_paths",
    "synonym_graph_stream",
    "flatten_graph",
    "apply_synonym_graph",
    "parse_solr_synonyms",
    "parse_wordnet_synonyms",
]


def check_rules(rules: dict, allow_graph: bool = False) -> dict[str, tuple[str, ...]]:
    """Validate and normalize {term: synonym | [synonyms...]} rules.

    With ``allow_graph=False`` (the historical single-token chain),
    multi-word inputs/outputs raise. With ``allow_graph=True`` they are
    accepted and the build path routes the whole rule set through the
    Lucene-faithful index-time graph chain: SynonymGraphFilter →
    FlattenGraphFilter (see apply_synonym_graph) — lossy exactly the way
    the reference documents flattened-graph indexing to be."""
    out: dict[str, tuple[str, ...]] = {}
    for k, v in rules.items():
        alts = (v,) if isinstance(v, str) else tuple(v)
        if not allow_graph and (" " in k or any(" " in a for a in alts)):
            raise ValueError(
                "multi-word synonym rules need the graph chain "
                "(build_index routes them automatically when "
                "allow_graph=True)"
            )
        if not k.strip() or any(not a.strip() for a in alts):
            raise ValueError("empty phrase in synonym rule")
        out[k] = alts
    return out


def rules_need_graph(rules: dict) -> bool:
    """True when any input or output phrase is multi-word (the flattened
    single-token post-pass cannot represent it)."""
    for k, v in rules.items():
        alts = (v,) if isinstance(v, str) else tuple(v)
        if " " in str(k).strip() or any(" " in str(a).strip() for a in alts):
            return True
    return False


def _graph_matcher(rules: dict):
    """first-term → [(input_terms, output_phrases)] sorted longest-first
    (SynonymMap FST greedy-longest semantics)."""
    by_first: dict[str, list[tuple[tuple[str, ...], tuple]]] = {}
    for k, v in rules.items():
        kt = tuple(str(k).split())
        alts = (v,) if isinstance(v, str) else tuple(v)
        outs = tuple(tuple(str(a).split()) for a in alts)
        if not kt or any(not o for o in outs):
            raise ValueError("empty phrase in synonym rule")
        by_first.setdefault(kt[0], []).append((kt, outs))
    for lst in by_first.values():
        lst.sort(key=lambda e: -len(e[0]))
    return by_first


def synonym_graph_stream(
    tokens: list[Token],
    rules: dict,
    keep_original: bool = True,
) -> list[tuple]:
    """INDEX-side SynonymGraphFilter (synonym/SynonymGraphFilter.java:41):
    greedy longest match of rule inputs over consecutive STREAM tokens,
    emitting the token GRAPH as (term, from_node, to_node, src) tuples.

    Node allocation per match (the reference's captureState/buffering net
    effect, verified against TestSynonymGraphFilter's canned vectors):
    every alternative path — each output phrase, then the original tokens
    when kept — runs from the shared start node S to the shared end node
    E; a path of L tokens allocates L-1 fresh intermediate nodes
    sequentially; E = S + 1 + Σ(L_path - 1). Outputs are emitted before
    originals (testBasicKeepOrigOneOutput: "c a b" with a b→x gives
    c, x, a, b). Position holes BEFORE a token/match are preserved as
    skipped nodes; holes INSIDE a matched span are swallowed by the
    rewrite (part of the documented lossiness).

    ``src`` is the source Token for pass-through/original tokens, or a
    ("SYNONYM", start_offset, end_offset) triple spanning the whole match
    for generated tokens (SynonymGraphFilter sets the match's offsets)."""
    by_first = _graph_matcher(rules)
    graph: list[tuple] = []
    prev_pos = -1
    node = 0
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        inc = t.position - prev_pos
        start_node = node + (inc - 1)  # holes before the token kept
        match = None
        for kt, outs in by_first.get(t.term, ()):
            if len(kt) <= n - i and all(
                tokens[i + j].term == kt[j] for j in range(len(kt))
            ):
                match = (kt, outs)
                break  # longest-first order → greedy longest
        if match is None:
            graph.append((t.term, start_node, start_node + 1, t))
            prev_pos = t.position
            node = start_node + 1
            i += 1
            continue
        kt, outs = match
        originals = tokens[i : i + len(kt)]
        alts: list[tuple[list[str], bool]] = [
            (list(o), False) for o in outs
        ]
        if keep_original:
            alts.append(([tok.term for tok in originals], True))
        s_node = start_node
        e_node = s_node + 1 + sum(len(a) - 1 for a, _ in alts)
        nxt = s_node + 1
        last = originals[-1]
        syn_src = ("SYNONYM", originals[0].start, last.end)
        for terms, is_orig in alts:
            frm = s_node
            for j, term in enumerate(terms):
                if j == len(terms) - 1:
                    to = e_node
                else:
                    to = nxt
                    nxt += 1
                src = originals[j] if is_orig else syn_src
                graph.append((term, frm, to, src))
                frm = to
        prev_pos = last.position
        node = e_node
        i += len(kt)
    return graph


def flatten_graph(graph: list[tuple]) -> list[tuple]:
    """FlattenGraphFilter (core/FlattenGraphFilter.java:52-...): map the
    graph's input nodes onto a single linear chain of output nodes so
    every path touches every node. The mapping, derived from the filter's
    freeze/emit machinery and verified verbatim against
    TestFlattenGraphFilter's vectors (already-flat, WTF1/WTF2,
    non-greedy synonyms, simple hole, hole-under-syn, strangely-numbered
    nodes, two long parallel paths):

      out(0) = 0; tokens in stream order, token (from → to):
        from unassigned (a hole): out(from) = out(p) + (from - p) for the
          nearest assigned node p <= from (hole recovery — holes keep
          their width);
        out(to) = max(out(to), out(from) + 1)  (output nodes only ever
          move right as more tokens arrive — the RollingBuffer freeze);

    emitted position = out(from), emitted positionLength =
    out(to) - out(from) under the FINAL mapping, tokens re-grouped by
    output position (stable within — the filter buffers per output node).

    Returns (term, out_position, out_length, src) sorted by output
    position."""
    from bisect import bisect_right, insort

    out_map = {0: 0}
    assigned = [0]
    rows = []
    for term, f, t, src in graph:
        if f not in out_map:
            p = assigned[bisect_right(assigned, f) - 1]
            out_map[f] = out_map[p] + (f - p)
            insort(assigned, f)
        of = out_map[f]
        cur = out_map.get(t)
        if cur is None:
            out_map[t] = of + 1
            insort(assigned, t)
        elif of + 1 > cur:
            out_map[t] = of + 1
        rows.append((term, f, t, src))
    flat = [
        (term, out_map[f], out_map[t] - out_map[f], src)
        for term, f, t, src in rows
    ]
    flat.sort(key=lambda r: r[1])  # stable: emission order within a node
    return flat


def apply_synonym_graph(
    tokens: list[Token],
    rules: dict,
    keep_original: bool = True,
) -> list[Token]:
    """Index-time multi-word synonyms exactly as the reference indexes
    them: SynonymGraphFilter → FlattenGraphFilter (the class javadoc's
    documented-lossy flattening — e.g. with rule "ml => machine learning"
    a token following "ml" ends up 2 positions later, so the phrase
    "ml <next>" stops matching adjacently; see tests). Token positions are
    the flattened output positions; generated tokens carry type SYNONYM
    and the matched span's offsets."""
    if not tokens:
        return tokens
    by_first = _graph_matcher(rules)
    if not any(t.term in by_first for t in tokens):
        return tokens
    out: list[Token] = []
    for term, pos, _plen, src in flatten_graph(
        synonym_graph_stream(tokens, rules, keep_original)
    ):
        if isinstance(src, Token):
            out.append(Token(term, pos, src.start, src.end, src.type))
        else:
            _tag, s, e = src
            out.append(Token(term, pos, s, e, "SYNONYM"))
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
