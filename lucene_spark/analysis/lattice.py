"""Shared Viterbi-lattice morphological segmentation core.

Behavioral reference: the algorithm of
core/src/java/org/apache/lucene/analysis/morph/Viterbi.java (forward
lattice construction + cheapest-path backtrace) as instantiated by
analysis/kuromoji/.../ja/JapaneseTokenizer.java and
analysis/nori/.../ko/KoreanTokenizer.java:

- a lattice node is added for every dictionary entry whose surface is a
  prefix of the text at the current position (plus user-dictionary
  entries, which carry UserMorphData.WORD_COST = -100000 so they always
  win — dict/UserMorphData.java:26);
- node arrival cost = min over nodes ENDING at the position of
  (node.cost + connection(node.right_id, word.left_id)) + word.cost
  (+ an optional mode penalty, ViterbiNBest.computePenalty);
- unknown words are generated from the character class of the current
  char (dict/CharacterDefinition.java): when the class has INVOKE set or
  no dictionary entry matched, unknown nodes are added — for a GROUP
  class the maximal run of same-class chars (capped), otherwise one
  candidate per length 1..cap over same-class chars (MeCab's LENGTH=n,
  e.g. char.def "KANJI 0 0 2" emits 1- and 2-char kanji candidates);
- EOS connects with connection(right_id, 0); the cheapest path is
  backtraced into segments.

This module is dictionary-agnostic: ja.py / ko.py supply small built-in
demo lexicons (the bundled MeCab dictionaries are data, not algorithm —
they are NOT shipped here) plus user-dictionary loading, and interpret
the per-entry ``attrs`` (POS, baseform, reading, compound segmentation).

The implementation differs from the reference in bookkeeping only: nodes
ending at a position are deduplicated per right_id keeping the min cost
(an exact lattice reduction — connection cost depends only on right_id),
where the reference keeps every node and prunes via backtrace.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

__all__ = [
    "DictEntry",
    "CharClass",
    "MorphDict",
    "Segment",
    "viterbi_segment",
    "nbest_words",
    "USER_WORD_COST",
    "USER_LEFT_ID",
    "USER_RIGHT_ID",
]

# dict/UserMorphData.java:26-28 — user entries always win
USER_WORD_COST = -100000
USER_LEFT_ID = 5
USER_RIGHT_ID = 5


@dataclass(frozen=True)
class DictEntry:
    """One dictionary word: surface + lattice ids/cost + language attrs.

    ``attrs`` carries per-language data the tokenizer interprets:
    ja: pos, base (baseform), reading; ko: pos, reading, segmentation
    (compound parts). ``segmentation`` (when not None) is a tuple of
    (surface, attrs) parts — kuromoji user-dictionary splits and nori
    compound decomposition both use it.
    """

    surface: str
    left_id: int
    right_id: int
    cost: int
    attrs: dict = field(default_factory=dict, hash=False, compare=False)
    segmentation: tuple | None = None


@dataclass(frozen=True)
class CharClass:
    """dict/CharacterDefinition.java class row: INVOKE = always generate
    an unknown word even when the dictionary matched; GROUP = the unknown
    surface is the maximal same-class run (else candidates of every
    length 1..cap — MeCab's LENGTH=n); ``cap`` = max grouped/candidate
    length; unknown-node lattice parameters.

    ``templates`` — ALL unk.def rows for this category as
    (left_id, right_id, cost, pos) tuples: kuromoji's
    UnknownDictionaryBuilder keeps every row and the lattice adds one
    unknown node per template so Viterbi picks the cheapest in context
    (ja/dict/UnknownDictionaryBuilder.java). Empty () = just the primary
    (left_id, right_id, cost, pos) single template."""

    name: str
    invoke: bool
    group: bool
    cap: int
    left_id: int
    right_id: int
    cost: int
    pos: str
    templates: tuple = ()

    @property
    def unk_templates(self) -> tuple:
        if self.templates:
            return self.templates
        return ((self.left_id, self.right_id, self.cost, self.pos),)


class MorphDict:
    """Prefix-lookup dictionary + connection-cost matrix + char classes."""

    def __init__(
        self,
        entries: Sequence[DictEntry],
        conn: dict[tuple[int, int], int] | None = None,
        classes: Sequence[CharClass] = (),
        classify: Callable[[str], str] | None = None,
        default_conn: int = 0,
    ):
        self._by_first: dict[str, list[DictEntry]] = {}
        for e in entries:
            self._by_first.setdefault(e.surface[0], []).append(e)
        for lst in self._by_first.values():
            lst.sort(key=lambda e: -len(e.surface))
        self._conn = conn or {}
        self._default_conn = default_conn
        self._classes = {c.name: c for c in classes}
        self._classify = classify or (lambda ch: "DEFAULT")

    def prefixes(self, text: str, pos: int) -> list[DictEntry]:
        out = []
        for e in self._by_first.get(text[pos], ()):
            if text.startswith(e.surface, pos):
                out.append(e)
        return out

    def connection(self, right_id: int, left_id: int) -> int:
        return self._conn.get((right_id, left_id), self._default_conn)

    def char_class(self, ch: str) -> CharClass:
        name = self._classify(ch)
        cc = self._classes.get(name)
        if cc is None:
            raise KeyError(f"no CharClass registered for {name!r}")
        return cc


@dataclass
class Segment:
    start: int
    end: int
    surface: str
    entry: DictEntry | None  # None => unknown word
    pos: str  # part-of-speech tag (unknown words get the class pos)


class _Node:
    __slots__ = ("cost", "right_id", "start", "seg", "back")

    def __init__(self, cost, right_id, start, seg, back):
        self.cost = cost
        self.right_id = right_id
        self.start = start
        self.seg = seg
        self.back = back


def viterbi_segment(
    text: str,
    mdict: MorphDict,
    user: MorphDict | None = None,
    penalty: Callable[[int, int], int] | None = None,
) -> list[Segment]:
    """Cheapest-path segmentation of ``text`` (one whitespace-free chunk).

    ``penalty(pos, length)`` is the search-mode surcharge
    (ja/ViterbiNBest.computePenalty); None = NORMAL mode.
    """
    n = len(text)
    if n == 0:
        return []
    # nodes ending at each position, deduped by right_id (min cost)
    ends: list[dict[int, _Node]] = [dict() for _ in range(n + 1)]
    bos = _Node(0, 0, -1, None, None)
    ends[0][0] = bos

    def _relax(pos: int, surface: str, entry: DictEntry | None, left_id: int,
               right_id: int, word_cost: int, seg_pos: str) -> None:
        frontier = ends[pos]
        best_prev, best_cost = None, None
        for nd in frontier.values():
            c = nd.cost + mdict.connection(nd.right_id, left_id)
            if best_cost is None or c < best_cost:
                best_prev, best_cost = nd, c
        cost = best_cost + word_cost
        if penalty is not None:
            cost += penalty(pos, len(surface))
        end = pos + len(surface)
        seg = Segment(pos, end, surface, entry, seg_pos)
        cur = ends[end].get(right_id)
        if cur is None or cost < cur.cost:
            ends[end][right_id] = _Node(cost, right_id, pos, seg, best_prev)

    for pos in range(n):
        if not ends[pos]:
            continue
        matched = False
        if user is not None:
            for e in user.prefixes(text, pos):
                matched = True
                _relax(pos, e.surface, e, e.left_id, e.right_id, e.cost,
                       e.attrs.get("pos", ""))
        for e in mdict.prefixes(text, pos):
            matched = True
            _relax(pos, e.surface, e, e.left_id, e.right_id, e.cost,
                   e.attrs.get("pos", ""))
        cc = mdict.char_class(text[pos])
        if cc.invoke or not matched:
            end = pos + 1
            while (
                end < n
                and end - pos < cc.cap
                and mdict.char_class(text[end]).name == cc.name
            ):
                end += 1
            if cc.group:
                spans = (end,)
            else:
                # MeCab LENGTH=n for non-group categories: unknown
                # candidates of EVERY length 1..n over same-class chars
                # (char.def "KANJI 0 0 2" emits the 2-char candidate too —
                # the round-3 documented simplification, now closed)
                spans = range(pos + 1, end + 1)
            # one node per unk.def template — Viterbi picks in context
            for e2 in spans:
                for (lid, rid, wcost, tpos) in cc.unk_templates:
                    _relax(pos, text[pos:e2], None, lid, rid, wcost, tpos)

    # EOS: cheapest node ending at n, including the connection to left_id 0
    tail = ends[n]
    if not tail:  # every path dead-ended (cannot happen: unknowns always fire)
        raise ValueError(f"lattice has no path over {text!r}")
    final = min(tail.values(), key=lambda nd: nd.cost + mdict.connection(nd.right_id, 0))
    segs: list[Segment] = []
    nd = final
    while nd is not None and nd.seg is not None:
        segs.append(nd.seg)
        nd = nd.back
    segs.reverse()
    return segs


def _candidate_words(text, mdict, user, penalty):
    """All lattice word candidates over ``text`` as Segment-shaped tuples
    (start, end, surface, entry, left_id, right_id, word_cost+penalty,
    pos) — the same generation rule as viterbi_segment (dictionary
    prefixes + user entries + unknown-class words)."""
    n = len(text)
    words = []
    for pos in range(n):
        matched = False
        if user is not None:
            for e in user.prefixes(text, pos):
                matched = True
                c = e.cost + (penalty(pos, len(e.surface)) if penalty else 0)
                words.append((pos, pos + len(e.surface), e.surface, e,
                              e.left_id, e.right_id, c,
                              e.attrs.get("pos", "")))
        for e in mdict.prefixes(text, pos):
            matched = True
            c = e.cost + (penalty(pos, len(e.surface)) if penalty else 0)
            words.append((pos, pos + len(e.surface), e.surface, e,
                          e.left_id, e.right_id, c, e.attrs.get("pos", "")))
        cc = mdict.char_class(text[pos])
        if cc.invoke or not matched:
            end = pos + 1
            while (end < n and end - pos < cc.cap
                   and mdict.char_class(text[end]).name == cc.name):
                end += 1
            if cc.group:
                spans = [text[pos:end]]
            else:
                # non-group LENGTH=n: candidates of every length 1..n
                spans = [text[pos:e2] for e2 in range(pos + 1, end + 1)]
            for surface in spans:
                for (lid, rid, wcost, tpos) in cc.unk_templates:
                    c = wcost + (penalty(pos, len(surface)) if penalty else 0)
                    words.append((pos, pos + len(surface), surface, None,
                                  lid, rid, c, tpos))
    return words


def nbest_words(
    text: str,
    mdict: MorphDict,
    nbest_cost: int,
    user: MorphDict | None = None,
    penalty: Callable[[int, int], int] | None = None,
) -> list[tuple[Segment, bool]]:
    """Words on any lattice path whose total cost is within
    ``nbest_cost`` of the cheapest (ja/ViterbiNBest.java backtraceNBest /
    JapaneseTokenizer.setNBestCost semantics): forward best-from-BOS and
    backward best-to-EOS per word node; a word is kept iff
    fwd(word) + bwd(word) <= best + nbest_cost. Returns
    [(Segment, on_best_path)] sorted by (start, end); exactly the
    viterbi_segment path is flagged on_best_path (cost ties break the
    same way: the dedup-by-right_id forward pass and this one share the
    min-reduction order)."""
    n = len(text)
    if n == 0:
        return []
    words = _candidate_words(text, mdict, user, penalty)
    INF = float("inf")
    # forward: cheapest arrival INCLUDING the word itself
    fwd = [INF] * len(words)
    ends: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    ends[0].append((0, 0.0))  # BOS: right_id 0, cost 0
    by_start: list[list[int]] = [[] for _ in range(n)]
    for wi, w in enumerate(words):
        by_start[w[0]].append(wi)
    for pos in range(n):
        if not ends[pos]:
            continue
        for wi in by_start[pos]:
            w = words[wi]
            best = min(
                (fv + mdict.connection(r, w[4]) for (r, fv) in ends[pos]),
                default=INF,
            )
            f = best + w[6]
            if f < fwd[wi]:
                fwd[wi] = f
                ends[w[1]].append((w[5], f))
    # compact ends: keep min per right_id (exact reduction, conn depends
    # only on right_id) — rebuild for the backward pass symmetric form
    # backward: cheapest continuation AFTER the word (EOS connects left 0)
    bwd = [INF] * len(words)
    starts: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    for pos in range(n, -1, -1):
        for wi in (by_start[pos] if pos < n else ()):
            w = words[wi]
            if fwd[wi] == INF:
                continue
            if w[1] == n:
                b = float(mdict.connection(w[5], 0))
            else:
                b = min(
                    (mdict.connection(w[5], l) + bv
                     for (l, bv) in starts[w[1]]),
                    default=INF,
                )
            bwd[wi] = b
            if b < INF:
                starts[pos].append((w[4], b + w[6]))
    total = [fwd[wi] + bwd[wi] for wi in range(len(words))]
    finite = [t for t in total if t < INF]
    if not finite:
        raise ValueError(f"lattice has no path over {text!r}")
    best_total = min(finite)
    best_path = viterbi_segment(text, mdict, user=user, penalty=penalty)
    best_spans = {(s.start, s.end, s.surface) for s in best_path}
    out: list[tuple[Segment, bool]] = []
    for wi, w in enumerate(words):
        if total[wi] <= best_total + nbest_cost:
            seg = Segment(w[0], w[1], w[2], w[3], w[7])
            out.append((seg, (w[0], w[1], w[2]) in best_spans))
    out.sort(key=lambda t: (t[0].start, t[0].end))
    return out
