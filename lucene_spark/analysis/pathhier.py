"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
path/PathHierarchyTokenizer.java:28-46 ("/something/something/else" →
"/something", "/something/something", "/something/something/else") and
ReversePathHierarchyTokenizer.java:33-52 (suffix form, for leading-wildcard-
free "ends-with" matching). Exact contract replayed from the reference test
vectors (TestPathHierarchyTokenizer / TestReversePathHierarchyTokenizer —
every case there is reproduced in tests/test_path_hierarchy.py):

- forward: one token per prefix ending just before each delimiter
  occurrence past index 0, plus the whole string; every token starts at
  offset 0 (offset E[skip-1] when skipping), has position increment 1,
  and has the delimiter replaced by ``replacement``;
- ``skip`` drops the first (forward) / last (reverse) ``skip`` path
  components; the skipped prefix keeps its real offsets out of the token;
- reverse: one token per suffix starting at 0 and after each delimiter;
  ``skip`` truncates the text at the delimiter boundary that removes the
  last ``skip`` components (keeping that trailing delimiter).

The tokenizer does not lowercase or stop-filter — paths are keyword-like
(the reference wires it bare in the factory). For webtext this is the URL
path/facet field: index url paths with ``path_hierarchy_analyzer()`` and
prefix-match whole hierarchies with plain TermQuery."""

from __future__ import annotations

from .tokenizer import Token

__all__ = [
    "path_hierarchy_tokens",
    "path_hierarchy_analyzer",
]


def path_hierarchy_tokens(
    text: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
    reverse: bool = False,
) -> list[Token]:
    if skip < 0:
        raise ValueError("skip cannot be negative")
    if len(delimiter) != 1 or (replacement is not None and len(replacement) != 1):
        raise ValueError("delimiter/replacement must be single chars")
    rep = delimiter if replacement is None else replacement
    n = len(text)
    if n == 0:
        return []
    d_pos = [i for i, c in enumerate(text) if c == delimiter]
    out: list[Token] = []
    if not reverse:
        ends = [i for i in d_pos if i > 0] + [n]
        if skip >= len(ends):
            return []
        start = 0 if skip == 0 else ends[skip - 1]
        for pos, e in enumerate(ends[skip:]):
            term = text[start:e].replace(delimiter, rep)
            out.append(Token(term, pos, start, e, "<PATH>"))
        return out
    # reverse: truncate the last `skip` components (keeping the boundary
    # delimiter), then emit every suffix of the truncated text
    bounds = [i + 1 for i in d_pos]
    if skip > 0:
        idx = -skip - 1 if text.endswith(delimiter) else -skip
        if -idx > len(bounds):
            return []
        text = text[: bounds[idx]]
        n = len(text)
        if n == 0:
            return []
        d_pos = [i for i in d_pos if i < n]
    starts = [0] + [i + 1 for i in d_pos if i + 1 < n]
    for pos, s in enumerate(dict.fromkeys(starts)):
        term = text[s:n].replace(delimiter, rep)
        out.append(Token(term, pos, s, n, "<PATH>"))
    return out


def path_hierarchy_analyzer(
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
    reverse: bool = False,
):
    """Analyzer callable (register with analysis/custom
    register_term_analyzer) — no lowercase/stop, keyword-like paths."""

    def analyze(
        text: str,
        stopwords=None,
        max_token_length: int = 1 << 20,
    ) -> list[Token]:
        return [
            t
            for t in path_hierarchy_tokens(
                text, delimiter, replacement, skip, reverse
            )
            if len(t.term) <= max_token_length
        ]

    return analyze
