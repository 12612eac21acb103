"""Span query family — the reference's ``queries/spans`` package as AST
nodes over the positional postings index.

Behavioral reference (all under queries/src/java/org/apache/lucene/queries/
spans/):

- ``SpanScorer.java:96-120`` — per doc, every enumerated span adds
  ``1 / (1 + width)`` to the sloppy freq; the doc scores
  ``SimScorer.score(freq, norm)`` with the weight built from ONE
  TermStates entry per distinct term (``SpanWeight.buildSimWeight`` —
  repeated terms contribute their idf once).
- ``TermSpans.java`` — a term occurrence at position p is the span
  [p, p+1) with width 0.
- ``NearSpansOrdered.java:47-105`` — one candidate per occurrence of the
  FIRST clause: each later clause advances to its first span whose start
  is >= the previous clause's end (``advancePosition``), the candidate
  width is the sum of the gaps (``matchWidth += start - prevEnd``), and
  the candidate matches iff width <= slop. Sub-span widths do NOT count.
- ``NearSpansUnordered.java:25-127`` — the advance-min sweep: every
  clause holds a current span, each step checks the window then advances
  the clause with the smallest (start, end); a state matches iff
  ``maxEndSeen - minStart - totalSpanLength <= slop`` where
  totalSpanLength sums the CURRENT spans' own lengths and maxEndSeen is
  the running max over every end seen this doc; width =
  ``maxEndSeen - minStart``.
- ``SpanOrQuery.java`` — union of the clauses' spans, enumerated by
  (start, end) per doc (SpanPositionQueue order).
- ``SpanNotQuery.java:150-216`` — include spans drop when the first
  exclude span with ``end > start - pre`` has ``start - post < end``
  (the FilterSpans accept loop); with exclude ends non-decreasing this
  equals "no exclude span overlaps [start - pre, end + post)".
- ``SpanFirstQuery.java:38-44`` / ``SpanPositionRangeQuery.java:39-47``
  — keep spans with ``start >= range_start`` and ``end <= range_end``.
- ``SpanContainingQuery.java:93-110`` — big spans kept when the first
  little span with ``little.start >= big.start`` fits
  (``little.end <= big.end``); emits the BIG span.
- ``SpanWithinQuery.java:93-131`` — little spans kept when, after
  advancing big past ``big.end < little.end``, ``big.start <=
  little.start``; emits the LITTLE span.

Engine shape: each node enumerates its spans as flat numpy arrays
(docid, start, end, width, norm) sorted by (doc, start, end) — the same
vectorized no-per-doc-loop discipline as the intervals family
(segment._interval_enumerate); per-doc freq accumulates per distinct
width ascending, left-assoc float64, so an ANSI-SQL oracle reproduces
the float result bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "SpanTerm",
    "SpanNear",
    "SpanOr",
    "SpanNot",
    "SpanFirst",
    "SpanPositionRange",
    "SpanContaining",
    "SpanWithin",
    "FieldMaskedSpan",
    "PayloadFilteredTerm",
    "span_payload_check",
    "span_terms",
    "is_span",
]


@dataclass(frozen=True)
class SpanTerm:
    """TermSpans: one span [p, p+1) per position, width 0."""

    term: str


@dataclass(frozen=True)
class SpanNear:
    """NearSpansOrdered / NearSpansUnordered over sub-span clauses."""

    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def __post_init__(self):
        if len(self.clauses) < 2:
            raise ValueError("SpanNear needs >= 2 clauses")
        if self.slop < 0:
            raise ValueError("slop must be >= 0")
        for c in self.clauses:
            if not is_span(c):
                raise TypeError(f"not a span clause: {c!r}")


@dataclass(frozen=True)
class SpanOr:
    """Union of the clauses' spans (SpanOrQuery)."""

    clauses: tuple

    def __post_init__(self):
        if not self.clauses:
            raise ValueError("SpanOr needs >= 1 clause")
        for c in self.clauses:
            if not is_span(c):
                raise TypeError(f"not a span clause: {c!r}")


@dataclass(frozen=True)
class SpanNot:
    """Include spans with no exclude span within pre/post (SpanNotQuery);
    ``pre``/``post`` extend the forbidden window before/after the include
    span exactly as the reference's accept loop does."""

    include: object
    exclude: object
    pre: int = 0
    post: int = 0

    def __post_init__(self):
        if not (is_span(self.include) and is_span(self.exclude)):
            raise TypeError("SpanNot needs span include/exclude")


@dataclass(frozen=True)
class SpanPositionRange:
    """Keep spans with start >= ``start`` and end <= ``end``
    (SpanPositionRangeQuery.acceptPosition)."""

    match: object
    start: int = 0
    end: int = 2**31 - 1

    def __post_init__(self):
        if not is_span(self.match):
            raise TypeError("SpanPositionRange needs a span match")


def SpanFirst(match, end: int) -> SpanPositionRange:
    """SpanFirstQuery = SpanPositionRangeQuery(match, 0, end)."""
    return SpanPositionRange(match, 0, end)


@dataclass(frozen=True)
class SpanContaining:
    """Big spans that contain a little span; emits the big span
    (SpanContainingQuery)."""

    big: object
    little: object

    def __post_init__(self):
        if not (is_span(self.big) and is_span(self.little)):
            raise TypeError("SpanContaining needs span big/little")


@dataclass(frozen=True)
class SpanWithin:
    """Little spans inside a big span; emits the little span
    (SpanWithinQuery)."""

    big: object
    little: object

    def __post_init__(self):
        if not (is_span(self.big) and is_span(self.little)):
            raise TypeError("SpanWithin needs span big/little")


_PAYLOAD_OPS = ("eq", "gt", "gte", "lt", "lte")  # MatchOperation.java


@dataclass(frozen=True)
class PayloadFilteredTerm:
    """One clause of a rewritten SpanPayloadCheckQuery: TermSpans whose
    positions are pre-filtered by the payload predicate (value <op>
    stored payload). Positions without a stored payload never match
    (SpanPayloadCheckQuery's payloadToMatch semantics). Produced by
    :func:`span_payload_check`; usable standalone too."""

    term: str
    value: int
    op: str = "eq"

    def __post_init__(self):
        if self.op not in _PAYLOAD_OPS:
            raise ValueError(f"unknown payload match op {self.op!r}")


def span_payload_check(match, payloads, op: str = "eq"):
    """SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery.java:53
    + MatchOperation): keep only spans whose matched positions carry the
    given payloads — payload i checked at clause i's position. ``match``
    is a SpanTerm (1 payload) or an ORDERED SpanNear of SpanTerms (one
    payload per clause; the reference collects payloads in clause order
    via PayloadSpanCollector). Rewrites to the same span tree with each
    term clause payload-filtered, which is equivalent for this shape —
    each clause contributes exactly one position per match, in clause
    order — and lets every downstream span combinator (and scorer stats)
    apply unchanged."""
    payloads = tuple(int(p) for p in payloads)
    if isinstance(match, SpanTerm):
        if len(payloads) != 1:
            raise ValueError("SpanTerm needs exactly 1 payload to check")
        return PayloadFilteredTerm(match.term, payloads[0], op)
    if isinstance(match, SpanNear):
        if not match.in_order:
            raise ValueError(
                "span_payload_check needs an ordered SpanNear (the "
                "reference collects payloads in clause order)"
            )
        if not all(isinstance(c, SpanTerm) for c in match.clauses):
            raise ValueError("span_payload_check clauses must be SpanTerms")
        if len(payloads) != len(match.clauses):
            raise ValueError(
                f"{len(match.clauses)} clauses need {len(match.clauses)} "
                f"payloads, got {len(payloads)}"
            )
        return SpanNear(
            tuple(
                PayloadFilteredTerm(c.term, p, op)
                for c, p in zip(match.clauses, payloads)
            ),
            slop=match.slop,
            in_order=True,
        )
    raise TypeError(f"span_payload_check cannot wrap {match!r}")


@dataclass(frozen=True)
class FieldMaskedSpan:
    """FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.java:67):
    lets a span clause over ANOTHER field participate in a composite span
    (SpanNear/SpanOr across fields) by lying about its field — getField()
    returns the mask, while createWeight delegates entirely to the masked
    query, so evaluation uses the masked clause's own postings and
    positions unchanged. Meaningful when the fields' positions are
    parallel (the denormalized-children pattern in the reference javadoc).
    In this engine a clause's field lives in its term namespace
    (``field␟term``), so the mask is purely declarative: it satisfies the
    composite's same-field contract and contributes nothing else — scoring
    uses the real terms' stats, with collection stats from the first
    sorted term's field, exactly the reference's caveat."""

    clause: object
    field: str

    def __post_init__(self):
        if not is_span(self.clause):
            raise TypeError(f"not a span clause: {self.clause!r}")


_SPAN_TYPES = (
    SpanTerm,
    SpanNear,
    SpanOr,
    SpanNot,
    SpanPositionRange,
    SpanContaining,
    SpanWithin,
    FieldMaskedSpan,
    PayloadFilteredTerm,
)


def is_span(q) -> bool:
    return isinstance(q, _SPAN_TYPES)


def span_terms(q) -> set[str]:
    """Every term under the span tree — SpanWeight.extractTermStates
    gathers one TermStates per distinct term (a Map), so the weight's idf
    sums each term once; SpanNotQuery's exclude side contributes NO term
    states (extractTermStates forwards only includeWeight,
    SpanNotQuery.java:144-147) but its postings are still read."""
    if isinstance(q, SpanTerm):
        return {q.term}
    if isinstance(q, PayloadFilteredTerm):
        return {q.term}
    if isinstance(q, FieldMaskedSpan):
        return span_terms(q.clause)
    if isinstance(q, (SpanNear, SpanOr)):
        out: set[str] = set()
        for c in q.clauses:
            out |= span_terms(c)
        return out
    if isinstance(q, SpanNot):
        return span_terms(q.include)
    if isinstance(q, SpanPositionRange):
        return span_terms(q.match)
    if isinstance(q, (SpanContaining, SpanWithin)):
        return span_terms(q.big) | span_terms(q.little)
    raise TypeError(f"not a span query: {q!r}")


def span_all_terms(q) -> set[str]:
    """Every term whose postings the evaluation reads — includes SpanNot's
    exclude side (needed for the term-stats/prefetch job even though it
    never scores)."""
    if isinstance(q, SpanNot):
        return span_all_terms(q.include) | span_all_terms(q.exclude)
    if isinstance(q, SpanTerm):
        return {q.term}
    if isinstance(q, PayloadFilteredTerm):
        return {q.term}
    if isinstance(q, FieldMaskedSpan):
        return span_all_terms(q.clause)
    if isinstance(q, (SpanNear, SpanOr)):
        out: set[str] = set()
        for c in q.clauses:
            out |= span_all_terms(c)
        return out
    if isinstance(q, SpanPositionRange):
        return span_all_terms(q.match)
    if isinstance(q, (SpanContaining, SpanWithin)):
        return span_all_terms(q.big) | span_all_terms(q.little)
    raise TypeError(f"not a span query: {q!r}")
