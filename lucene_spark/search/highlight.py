"""Search-result highlighting: best-passage extraction with the
UnifiedHighlighter's scoring and formatting contracts
(highlighter/src/java/org/apache/lucene/search/uhighlight/).

- Passage scoring is PassageScorer.java verbatim (defaults k1=1.2, b=0.75,
  pivot=87): per passage, over its UNIQUE matched terms,
  ``Σ tf(freq_in_passage, passage_len) * weight(content_len, freq_in_doc)``
  scaled by ``norm(passage_start) = 1 + 1/ln(pivot + start)``; tf is the
  saturation ``f/(f + k1((1-b) + b·len/pivot))`` and weight approximates
  document count from content length:
  ``(k1+1)·ln(1 + (1 + content_len/pivot + 0.5)/(freq_in_doc + 0.5))``
  (PassageScorer.java:66-87, score :100-139).
- Formatting is DefaultPassageFormatter.java:62-97: top ``max_passages``
  passages by score, re-ordered by offset, joined with "... " when not
  adjacent, matches wrapped in pre/post tags with overlapping matches
  merged by the look-ahead rule.
- Passage boundaries: Lucene uses java.text.BreakIterator sentence rules
  (UnifiedHighlighter.getBreakIterator); here a regex sentence splitter
  ([.!?]+ followed by whitespace) approximates them — documented
  simplification, no ICU in this stack.
- Match terms: the flat term set of the rewritten/expanded query
  (collect_terms), matched against the analyzer's token offsets — the
  term-level default; phrase-aware match joining (PhraseHelper) is not
  replicated.
- No-match docs: the first ``max_no_highlight_passages`` sentences verbatim
  (FieldHighlighter.java:87-95), or None when that is 0.

Distribution shape: highlighting runs where the text lives. The DataFrame
entry point broadcasts the (tiny) top-k hit set against the source
documents table and snips inside an Arrow-batched mapInPandas — a map-only
stage over the source scan, no shuffle, no driver text processing; at
100 TB the cost is one pruned scan of the k matching rows' files.
"""

from __future__ import annotations

import math
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PassageScorer", "highlight_text", "highlight_hits", "highlight_docs"]

_SENT_RE = re.compile(r"[^.!?]*[.!?]+(?:\s+|$)|[^.!?]+$", re.S)


class PassageScorer:
    """PassageScorer.java formulas, float64 (the reference accumulates the
    per-passage sum in double and casts once at the end)."""

    def __init__(self, k1: float = 1.2, b: float = 0.75, pivot: float = 87.0):
        self.k1, self.b, self.pivot = k1, b, pivot

    def weight(self, content_length: int, freq_in_doc: int) -> float:
        num_docs = 1.0 + content_length / self.pivot
        return (self.k1 + 1.0) * math.log(
            1.0 + (num_docs + 0.5) / (freq_in_doc + 0.5)
        )

    def tf(self, freq: int, passage_len: int) -> float:
        norm = self.k1 * ((1.0 - self.b) + self.b * (passage_len / self.pivot))
        return freq / (freq + norm)

    def norm(self, passage_start: int) -> float:
        return 1.0 + 1.0 / math.log(self.pivot + passage_start)

    def score(
        self,
        per_term: dict[str, tuple[int, int]],  # term -> (freq_in_passage, freq_in_doc)
        passage_len: int,
        passage_start: int,
        content_length: int,
    ) -> float:
        s = 0.0
        for _t, (fp, fd) in sorted(per_term.items()):
            s += self.tf(fp, passage_len) * self.weight(content_length, fd)
        return s * self.norm(passage_start)


def _sentences(text: str) -> list[tuple[int, int]]:
    """[start, end) character spans of sentence-ish passages."""
    out = []
    for m in _SENT_RE.finditer(text):
        if m.group().strip():
            out.append((m.start(), m.end()))
    return out or ([(0, len(text))] if text else [])


def highlight_text(
    text: str,
    terms: set[str],
    analyzer,
    *,
    max_passages: int = 3,
    max_no_highlight_passages: int = 1,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    ellipsis: str = "... ",
    scorer: PassageScorer | None = None,
) -> str | None:
    """Best-passage snippet of ``text`` for the given matched ``terms``.

    ``analyzer`` is the (text, ...) -> list[Token] chain whose tokens carry
    char offsets; ``terms`` the flat term set of the expanded query."""
    sc = scorer or PassageScorer()
    toks = [t for t in analyzer(text) if t.term in terms]
    spans = _sentences(text)
    if not toks:
        if max_no_highlight_passages == 0:
            return None
        keep = spans[: max_no_highlight_passages if max_no_highlight_passages > 0 else max_passages]
        return "".join(text[s:e] for s, e in keep).rstrip() or None
    freq_in_doc: dict[str, int] = {}
    for t in toks:
        freq_in_doc[t.term] = freq_in_doc.get(t.term, 0) + 1
    # assign matches to passages (tokens sorted by offset; spans sorted)
    scored = []
    ti = 0
    for s, e in spans:
        matches = []
        while ti < len(toks) and toks[ti].start < e:
            if toks[ti].start >= s:
                matches.append(toks[ti])
            ti += 1
        if not matches:
            continue
        per_term: dict[str, tuple[int, int]] = {}
        for t in matches:
            fp, fd = per_term.get(t.term, (0, freq_in_doc[t.term]))
            per_term[t.term] = (fp + 1, fd)
        score = sc.score(per_term, e - s, s, len(text))
        scored.append((score, s, e, matches))
    if not scored:
        return None
    # top max_passages by score (ties by earlier start), then offset order
    scored.sort(key=lambda x: (-x[0], x[1]))
    chosen = sorted(scored[:max_passages], key=lambda x: x[1])
    # DefaultPassageFormatter.format
    parts: list[str] = []
    pos = 0
    first = True
    for _score, s, e, matches in chosen:
        if not first and s != pos:
            parts.append(ellipsis)
        first = False
        pos = s
        i = 0
        while i < len(matches):
            ms, me = matches[i].start, matches[i].end
            parts.append(text[pos:ms])
            while i + 1 < len(matches) and matches[i + 1].start < me:
                i += 1
                me = max(me, matches[i].end)
            me = min(me, e)
            parts.append(pre_tag + text[ms:me] + post_tag)
            pos = me
            i += 1
        parts.append(text[pos:max(pos, e)])
        pos = e
    return "".join(parts)


def highlight_docs(
    docs: DataFrame,
    terms: set[str],
    analyzer,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_passages: int = 3,
    **kw,
) -> DataFrame:
    """Highlight every row of ``docs`` for a fixed matched-term set — the
    searcher-less entry point (UnifiedHighlighter.highlightWithoutSearcher,
    uhighlight/UnifiedHighlighter.java:501): no hit list, no index; the
    caller supplies the expanded term set. A map-only Arrow-batched
    mapInPandas over the source scan — snippets are built where the text
    lives, no shuffle, no driver text processing."""
    tset = set(terms)
    mp = max_passages

    def snip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "snippet": [
                        highlight_text(
                            txt or "", tset, analyzer, max_passages=mp, **kw
                        )
                        for txt in pdf[text_col]
                    ],
                }
            )

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        snip, schema=f"{id_col} {id_type}, snippet string"
    )


def highlight_hits(
    searcher,
    query,
    docs: DataFrame,
    *,
    k: int = 10,
    text_col: str = "text",
    url_col: str = "url",
    max_passages: int = 3,
    **kw,
) -> DataFrame:
    """(url, score, snippet) for the top-k hits of ``query``: the hit list
    is broadcast against the source ``docs`` table and snippets are built
    in an Arrow-batched mapInPandas over the matching rows only."""
    from .query import collect_terms
    from ..index.builder import FIELD_SEP

    prepared = searcher._prepared(query)
    terms = {
        t.split(FIELD_SEP, 1)[1] if FIELD_SEP in t else t
        for t in collect_terms(prepared)
    }
    hits = searcher.search(query, k=k, with_url=True).select(url_col, "score")
    joined = docs.select(url_col, text_col).join(
        F.broadcast(hits), url_col
    )
    analyzer = searcher._analyzer
    mp = max_passages

    def snip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            snippets = [
                highlight_text(
                    txt or "", terms, analyzer, max_passages=mp, **kw
                )
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    url_col: pdf[url_col],
                    "score": pdf["score"],
                    "snippet": snippets,
                }
            )

    return joined.mapInPandas(
        snip, schema=f"{url_col} string, score float, snippet string"
    ).orderBy(F.desc("score"), F.asc(url_col))
