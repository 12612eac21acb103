"""Brute-force pure-python reference index + exhaustive BM25 top-k.

This is the golden oracle every Spark-side milestone is tested against
(FIXTURES.md §3): dict-based postings, SmallFloat norms, float32 BM25 in
Lucene's exact expression order, exhaustive scoring, tie-break score DESC
then docid ASC (lucene/core/src/java/org/apache/lucene/search/HitQueue.java:76-82).
No Spark, no pruning — intentionally naive.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..analysis.tokenizer import analyze
from ..functions.bm25 import Bm25Scorer
from ..functions.smallfloat import int_to_byte4

__all__ = ["PyIndex", "topk_sort"]


def topk_sort(hits: list[tuple[int, float]], k: int) -> list[tuple[int, float]]:
    """score DESC, docid ASC; top k."""
    return sorted(hits, key=lambda h: (-h[1], h[0]))[:k]


@dataclass
class PyIndex:
    stopwords: frozenset[str] | None = None
    # (text, stopwords) -> list[Token]; None = the standard chain
    analyzer: object = None
    # term -> list[(docid, freq, positions)]
    postings: dict[str, list[tuple[int, int, list[int]]]] = field(
        default_factory=lambda: defaultdict(list)
    )
    norms: dict[int, int] = field(default_factory=dict)       # docid -> norm byte
    doc_lens: dict[int, int] = field(default_factory=dict)    # docid -> field length
    doc_count: int = 0
    sum_ttf: int = 0

    def add(self, docid: int, text: str) -> None:
        an = self.analyzer if self.analyzer is not None else analyze
        toks = an(text, self.stopwords)
        per_term: dict[str, list[int]] = defaultdict(list)
        for t in toks:
            per_term[t.term].append(t.position)
        # discountOverlaps: posIncr==0 tokens don't count = one count per
        # DISTINCT position (shingle/ngram chains stack tokens per position)
        length = len({t.position for t in toks})
        for term, positions in sorted(per_term.items()):
            self.postings[term].append((docid, len(positions), positions))
        self.norms[docid] = int(int_to_byte4(length))
        self.doc_lens[docid] = length
        self.doc_count += 1
        self.sum_ttf += length

    # --- stats ---------------------------------------------------------
    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def total_term_freq(self, term: str) -> int:
        return sum(f for _, f, _ in self.postings.get(term, ()))

    def scorer(self, term: str, boost: float = 1.0) -> Bm25Scorer:
        return Bm25Scorer.create(
            self.doc_freq(term), self.doc_count, self.sum_ttf, boost=boost
        )

    # --- scoring -------------------------------------------------------
    def term_scores(
        self, term: str, boost: float = 1.0, df_override: int = 0
    ) -> dict[int, np.float32]:
        sc = Bm25Scorer.create(
            df_override or self.doc_freq(term),
            self.doc_count,
            self.sum_ttf,
            boost=boost,
        )
        out: dict[int, np.float32] = {}
        for docid, freq, _ in self.postings.get(term, ()):
            out[docid] = sc.score(
                np.array([freq]), np.array([self.norms[docid]])
            )[0]
        return out

    def search_or(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Disjunction: per-doc float32 sum of matching term scores
        (DisjunctionSumScorer semantics; float32 accumulation order =
        ascending term index then doc, matching our engine)."""
        acc: dict[int, np.float32] = {}
        for term in terms:
            for docid, s in self.term_scores(term).items():
                acc[docid] = np.float32(acc.get(docid, np.float32(0.0)) + s)
        return topk_sort([(d, float(s)) for d, s in acc.items()], k)

    def search_and(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Conjunction: docs containing ALL terms, scores summed."""
        if not terms:
            return []
        doc_sets = [set(d for d, _, _ in self.postings.get(t, ())) for t in terms]
        common = set.intersection(*doc_sets) if doc_sets else set()
        acc: dict[int, np.float32] = {d: np.float32(0.0) for d in common}
        for term in terms:
            scores = self.term_scores(term)
            for d in common:
                acc[d] = np.float32(acc[d] + scores[d])
        return topk_sort([(d, float(s)) for d, s in acc.items()], k)

    def search_and_not(
        self, must: list[str], must_not: list[str], k: int = 10
    ) -> list[tuple[int, float]]:
        hits = dict(self.search_and(must, k=self.doc_count or 1))
        excl: set[int] = set()
        for t in must_not:
            excl.update(d for d, _, _ in self.postings.get(t, ()))
        return topk_sort([(d, s) for d, s in hits.items() if d not in excl], k)

    def phrase_scores(self, phrase_terms: list[str]) -> dict[int, np.float32]:
        """Per-doc float32 phrase scores (ExactPhraseMatcher + summed idf)."""
        hits = self.search_phrase(phrase_terms, k=max(self.doc_count, 1))
        return {d: np.float32(s) for d, s in hits}

    def synonym_scores(self, terms: tuple, boost: float = 1.0) -> dict[int, np.float32]:
        """Blended stats: df = max over terms; per-doc freq = Σ freqs
        (SynonymQuery.java:54 + SynonymScorer.freq)."""
        df = max((self.doc_freq(t) for t in terms), default=0)
        sc = Bm25Scorer.create(df, self.doc_count, self.sum_ttf, boost=boost)
        freqs: dict[int, int] = defaultdict(int)
        for t in terms:
            for docid, f, _ in self.postings.get(t, ()):
                freqs[docid] += f
        return {
            d: sc.score(np.array([f]), np.array([self.norms[d]]))[0]
            for d, f in freqs.items()
        }

    def sloppy_phrase_scores(
        self, phrase_terms: list[str], slop: int, boost: float = 1.0
    ) -> dict[int, np.float32]:
        """Sloppy phrase: adjusted positions, window ≤ slop, per-match weight
        1/(1+matchLength), min-advance sweep (SloppyPhraseMatcher.java:53,
        PhraseScorer.java:86-88) — mirrors segment._sloppy_phrase_match."""
        plists = [
            {d: pos for d, _, pos in self.postings.get(t, ())} for t in phrase_terms
        ]
        common = set(plists[0])
        for p in plists[1:]:
            common &= set(p)
        idf_sum = np.float32(
            sum(float(self.scorer(t).weight) for t in phrase_terms)
        )
        cache = Bm25Scorer.create(1, self.doc_count, self.sum_ttf).cache
        sc = Bm25Scorer(weight=np.float32(np.float32(boost) * idf_sum), cache=cache)
        # repeat groups: one token occurrence cannot fill two slots of the
        # same term (SloppyPhraseMatcher "with repeats")
        groups: dict[str, list[int]] = {}
        for slot, t in enumerate(phrase_terms):
            groups.setdefault(t, []).append(slot)
        out: dict[int, np.float32] = {}
        for d in common:
            lists = [sorted(p - i for p in plists[i][d]) for i in range(len(plists))]
            idx = [0] * len(lists)

            def bump(idx=idx, lists=lists) -> bool:
                changed = True
                while changed:
                    changed = False
                    for slots in groups.values():
                        if len(slots) < 2:
                            continue
                        taken: set[int] = set()
                        for sl in slots:
                            raw = lists[sl][idx[sl]] + sl
                            while raw in taken:
                                idx[sl] += 1
                                if idx[sl] >= len(lists[sl]):
                                    return False
                                raw = lists[sl][idx[sl]] + sl
                                changed = True
                            taken.add(raw)
                return True

            if not bump():
                continue
            counts = [0] * (slop + 1)
            while True:
                cur = [lists[i][idx[i]] for i in range(len(lists))]
                lo, hi = min(cur), max(cur)
                if hi - lo <= slop:
                    counts[hi - lo] += 1
                mi = cur.index(lo)
                idx[mi] += 1
                if idx[mi] >= len(lists[mi]) or not bump():
                    break
            # freq accumulated by match length, ascending, left-assoc double
            # — the deterministic order shared with segment.py and the SQL
            # oracle gate
            freq = 0.0
            for length_l in range(slop + 1):
                freq += counts[length_l] * (1.0 / (1 + length_l))
            if freq > 0:
                out[d] = sc.score(
                    np.array([freq]), np.array([self.norms[d]])
                )[0]
        return out

    def _leaf_occurrences(self, leaf) -> dict[int, list[tuple[int, int]]]:
        """doc -> sorted (start, end) occurrences of one interval leaf:
        a term (width 1) or an exact phrase (Intervals.phrase, width L).
        Back-compat shim over :meth:`_leaf_occurrences_info`."""
        return self._leaf_occurrences_info(
            (tuple(leaf), tuple(range(len(leaf))), len(leaf), 0)
        )

    def _leaf_occurrences_info(self, info) -> dict[int, list[tuple[int, int]]]:
        """doc -> sorted (start, end) occurrences of one normalized slot
        alternative (search/query.interval_leaf_info record): terms at
        their relative raw offsets; the interval start is first-position −
        ``before`` clipped at 0 and the width is ``extent`` except on
        clipped occurrences (ExtendedIntervalIterator semantics)."""
        terms, rel, extent, before = info
        if len(terms) == 1 and extent == 1:
            out: dict[int, list[tuple[int, int]]] = {}
            for d, _, pos in self.postings.get(terms[0], ()):
                out.setdefault(d, []).extend((p, p) for p in pos)
            return {d: sorted(v) for d, v in out.items()}
        per_term = []
        docs: set[int] | None = None
        for t in terms:
            m = {d: set(pos) for d, _, pos in self.postings.get(t, ())}
            per_term.append(m)
            docs = set(m) if docs is None else docs & set(m)
        out2: dict[int, list[tuple[int, int]]] = {}
        for d in docs or ():
            occ = [
                (max(0, p - before), p - before + extent - 1)
                for p in sorted(per_term[0][d])
                if all(p + rel[i] in per_term[i][d] for i in range(1, len(terms)))
            ]
            if occ:
                out2[d] = sorted(occ)
        return out2

    def _interval_minimal(self, q) -> dict[int, list[tuple[int, int]]]:
        """doc -> minimal intervals of an IntervalNear after its
        max_gaps/max_width filters — brute-force enumeration with an
        EXPLICIT containment-antichain minimality filter (not the engine's
        keep-max-start-per-end dedup, so a shared monotonicity bug cannot
        pass both sides)."""
        slots = q.slot_infos
        exts = q.slot_extents
        ext_total = sum(exts)
        slot_occ: list[dict[int, list[tuple[int, int]]]] = []
        for alts in slots:
            merged: dict[int, set[tuple[int, int]]] = {}
            for info in alts:
                for d, occ in self._leaf_occurrences_info(info).items():
                    merged.setdefault(d, set()).update(occ)
            slot_occ.append({d: sorted(v) for d, v in merged.items()})
        common = set(slot_occ[0]) if slot_occ else set()
        for p in slot_occ[1:]:
            common &= set(p)
        out: dict[int, list[tuple[int, int]]] = {}
        for d in sorted(common):
            lists = [slot_occ[i][d] for i in range(len(slots))]
            # (s, e) -> Σ actual sub widths along the chain that produced
            # it (clipped occurrences at doc start have width < extent —
            # ExtendedIntervalIterator semantics; the reference's gaps()
            # subtracts the CLIPPED widths, OrderedIntervalsSource.java:
            # 165-169). First chain in greedy order wins on duplicates.
            wmap: dict[tuple[int, int], int] = {}
            cands: list[tuple[int, int]] = []
            if q.ordered:
                # each leaf must START strictly after the previous leaf's
                # END (OrderedIntervalsSource over interval leaves)
                for s, e0 in lists[0]:
                    cur_end, ok = e0, True
                    wsum = e0 - s + 1
                    for lst in lists[1:]:
                        nxt = next(
                            ((s2, e2) for (s2, e2) in lst if s2 > cur_end),
                            None,
                        )
                        if nxt is None:
                            ok = False
                            break
                        cur_end = nxt[1]
                        wsum += nxt[1] - nxt[0] + 1
                    if ok:
                        cands.append((s, cur_end))
                        wmap.setdefault((s, cur_end), wsum)
            else:
                # span = [start, max over slots of (first own occurrence
                # with start >= s) end] for every occurrence start; the
                # j-th copy of a repeated slot takes its (j+1)-th
                # occurrence at/after s (RepeatingIntervalsSource
                # consecutive windows — equal slots never share one
                # occurrence)
                dup = q.slot_dup_ranks
                starts = sorted({s for lst in lists for (s, _e) in lst})
                for s in starts:
                    e, ok, wsum = s, True, 0
                    for j, lst in zip(dup, lists):
                        at = [(s2, e2) for (s2, e2) in lst if s2 >= s]
                        if len(at) <= j:
                            ok = False
                            break
                        e = max(e, at[j][1])
                        wsum += at[j][1] - at[j][0] + 1
                    if ok:
                        cands.append((s, e))
                        wmap.setdefault((s, e), wsum)
            cset = set(cands)
            ivs = []
            for s, e in cset:
                if any(
                    s2 >= s and e2 <= e and (s2, e2) != (s, e)
                    for (s2, e2) in cset
                ):
                    continue
                w = e - s + 1
                if q.max_gaps >= 0 and (w - wmap[(s, e)]) > q.max_gaps:
                    continue
                if q.max_width >= 0 and w > q.max_width:
                    continue
                ivs.append((s, e))
            if ivs:
                out[d] = sorted(ivs)
        return out

    def _interval_saturate(
        self, per_doc: dict[int, list[tuple[int, int]]],
        ext_total: int, pivot: float, boost: float,
    ) -> dict[int, np.float32]:
        """Sloppy freq 1/max(w - minExtent + 1, 1) per interval, grouped
        per distinct width ascending left-assoc double
        (IntervalScorer.java:60-68), then the saturation function
        boost * (1 - pivot/(pivot + freq)) in float32
        (IntervalScoreFunction.java:66-74)."""
        out: dict[int, np.float32] = {}
        for d, ivs in per_doc.items():
            counts: dict[int, int] = defaultdict(int)
            for s, e in ivs:
                counts[e - s + 1] += 1
            freq = 0.0
            for w in sorted(counts):
                freq += counts[w] * (1.0 / max(w - ext_total + 1, 1))
            if freq > 0:
                f = np.float32(freq)
                p32 = np.float32(pivot)
                out[d] = np.float32(
                    np.float32(boost) * (np.float32(1.0) - p32 / (p32 + f))
                )
        return out

    def interval_scores(self, q) -> dict[int, np.float32]:
        """IntervalQuery oracle (queries/intervals) — see _interval_minimal
        for enumeration independence from the engine."""
        return self._interval_saturate(
            self._interval_minimal(q), q.min_extent, q.pivot, q.boost
        )

    def _interval_atleast(self, q) -> dict[int, list[tuple[int, int, int]]]:
        """doc -> (start, end, gaps) stream EMITTED by the reference's
        MinimumShouldMatchIntervalIterator (queries/intervals/
        MinimumShouldMatchIntervalsSource.java:155-331), replayed with
        explicit SORTED-LIST queues over each sub-source's brute-force
        minimal enumeration (_interval_minimal) — a from-scratch
        transliteration, structurally independent of the engine's
        vectorized candidate pass + heap replay. Non-minimal emissions and
        the advance-loop's early give-up on an exhausted sub-iterator
        (:221-231) are preserved; queue ties break by sub-source index."""
        from bisect import insort

        m = q.min_match
        nears = list(q.sub_nears)
        if m == len(nears):
            # Intervals.java:567-570 rewrites min_match==n to
            # unordered(sources) for ALL source kinds, and unordered
            # dedups EQUAL sources into RepeatingIntervalsSource
            # (consecutive windows; Rep.width() sums copy widths) — the
            # same emulation as the engine, recomputed independently here.
            groups: list[list] = []  # [source, count]
            for nr in nears:
                for g in groups:
                    if g[0] == nr:
                        g[1] += 1
                        break
                else:
                    groups.append([nr, 1])
            subs = []
            for nr, c in groups:
                per_doc = self._interval_minimal(nr)
                if c > 1:
                    rep: dict[int, list[tuple[int, int, int]]] = {}
                    for doc, occ in per_doc.items():
                        wins = [
                            (
                                occ[i][0],
                                occ[i + c - 1][1],
                                sum(
                                    e2 - s2 + 1
                                    for (s2, e2) in occ[i: i + c]
                                ),
                            )
                            for i in range(len(occ) - c + 1)
                        ]
                        if wins:
                            rep[doc] = wins
                    subs.append(rep)
                else:
                    subs.append(per_doc)
            m = len(groups)
        else:
            subs = [self._interval_minimal(n) for n in nears]
        out: dict[int, list[tuple[int, int, int]]] = {}
        for d in sorted({doc for s in subs for doc in s}):
            # occurrences normalized to (start, end, width) triples; width
            # differs from end−start+1 only on merged Repeating windows
            present = [
                [
                    (t[0], t[1], t[2] if len(t) > 2 else t[1] - t[0] + 1)
                    for t in s[d]
                ]
                for s in subs
                if d in s
            ]
            if len(present) < m:
                continue
            pos = [0] * len(present)
            cur: list = [None] * len(present)

            def nxt(i: int) -> bool:
                if pos[i] >= len(present[i]):
                    cur[i] = None
                    return False
                cur[i] = present[i][pos[i]]
                pos[i] += 1
                return True

            bg: list = []  # ordered (end asc, start desc, i, width)
            px: list = []  # ordered (start asc, end desc, i, width)
            for i in range(len(present)):
                if nxt(i):
                    insort(bg, (cur[i][1], -cur[i][0], i, cur[i][2]))
            q_end = -1
            for _ in range(m):
                if not bg:
                    break
                e, ns, i, w = bg.pop(0)
                insort(px, (-ns, -e, i, w))
                q_end = max(q_end, e)
            start = end = -1
            emitted: list[tuple[int, int, int]] = []
            while True:
                while len(px) == m and px[0][0] == start:
                    _s, _ne, i, _w = px.pop(0)
                    if nxt(i):
                        insort(bg, (cur[i][1], -cur[i][0], i, cur[i][2]))
                        e, ns, j, w = bg.pop(0)
                        insort(px, (-ns, -e, j, w))
                        q_end = max(q_end, e)
                if len(px) < m:
                    break
                while True:
                    start = px[0][0]
                    end = q_end
                    slop = (end - start + 1) - sum(
                        w2 for (_s2, _ne2, _i2, w2) in px
                    )
                    if -px[0][1] == end:
                        break
                    _s, _ne, i, _w = px.pop(0)
                    if nxt(i):
                        insort(bg, (cur[i][1], -cur[i][0], i, cur[i][2]))
                    if bg:
                        e, ns, j, w = bg.pop(0)
                        insort(px, (-ns, -e, j, w))
                        q_end = max(q_end, e)
                    if not (len(px) == m and end == q_end):
                        break
                emitted.append((start, end, slop))
            kept = [
                (s, e)
                for (s, e, sl) in emitted
                if (q.max_gaps < 0 or sl <= q.max_gaps)
                and (q.max_width < 0 or e - s + 1 <= q.max_width)
            ]
            if kept:
                out[d] = kept
        return out

    def interval_atleast_scores(self, q) -> dict[int, np.float32]:
        """Intervals.atLeast oracle: saturation over the emitted widths,
        minExtent = sum of the min_match smallest sub minExtents."""
        return self._interval_saturate(
            self._interval_atleast(q), q.min_extent, q.pivot, q.boost
        )

    def _interval_or(self, q) -> dict[int, list[tuple[int, int]]]:
        """Intervals.or over whole sources: union of the subsources'
        enumerations with an explicit containment-antichain pass across
        sources (DisjunctionIntervalsSource minimal convention)."""
        merged: dict[int, set[tuple[int, int]]] = {}
        for s in q.sources:
            for d, ivs in self._interval_enum_side(s).items():
                merged.setdefault(d, set()).update(ivs)
        out: dict[int, list[tuple[int, int]]] = {}
        for d, cset in merged.items():
            kept = [
                (s0, e0)
                for (s0, e0) in cset
                if not any(
                    s2 >= s0 and e2 <= e0 and (s2, e2) != (s0, e0)
                    for (s2, e2) in cset
                )
            ]
            if kept:
                out[d] = sorted(kept)
        return out

    def interval_or_scores(self, q) -> dict[int, np.float32]:
        return self._interval_saturate(
            self._interval_or(q), q.min_extent, q.pivot, q.boost
        )

    def _interval_enum_side(self, side) -> dict[int, list[tuple[int, int]]]:
        from ..search.query import IntervalAtLeast, IntervalFilter, IntervalOr

        if isinstance(side, IntervalAtLeast):
            return self._interval_atleast(side)
        if isinstance(side, IntervalOr):
            return self._interval_or(side)
        if isinstance(side, IntervalFilter):
            return self._interval_filtered(side)
        return self._interval_minimal(side)

    def _interval_filtered(self, q) -> dict[int, list[tuple[int, int]]]:
        """Surviving source intervals of a containment filter: explicit
        O(|A|·|B|) relation test per doc over both sides' enumerations."""
        a = self._interval_enum_side(q.source)
        b = self._interval_enum_side(q.reference)
        negate = q.kind.startswith("not_")
        kept: dict[int, list[tuple[int, int]]] = {}
        for d, ivs in a.items():
            refs = b.get(d, [])
            sel = []
            for s, e in ivs:
                if q.kind.endswith("containing"):
                    rel = any(s2 >= s and e2 <= e for (s2, e2) in refs)
                else:
                    rel = any(s2 <= s and e2 >= e for (s2, e2) in refs)
                if rel != negate:
                    sel.append((s, e))
            if sel:
                kept[d] = sel
        return kept

    def interval_filter_scores(self, q) -> dict[int, np.float32]:
        """Containment-filtered interval oracle (Intervals.containing /
        notContaining / containedBy / notContainedBy)."""
        return self._interval_saturate(
            self._interval_filtered(q), q.source.min_extent, q.pivot, q.boost
        )

    def expand_multiterm(self, q, max_terms: int = 128):
        """Mirror of Searcher.expand_multiterm over the in-memory term dict:
        df-desc then term-asc ranking with the same cap, so engine and oracle
        expand to identical SHOULD sets."""
        import re as _re

        from ..search.fuzzy import fuzzy_similarity, osa_distance
        from ..search.query import (
            BooleanQuery,
            ConstantScoreQuery,
            DisjunctionMaxQuery,
            FuzzyQuery,
            MatchNoDocsQuery,
            PrefixQuery,
            RegexpQuery,
            TermQuery,
            TermRangeQuery,
            WildcardQuery,
        )

        def pick(pred) -> list[str]:
            cands = [(t, self.doc_freq(t)) for t in self.postings if pred(t)]
            cands.sort(key=lambda p: (-p[1], p[0]))
            return [t for t, _ in cands[:max_terms]]

        if isinstance(q, PrefixQuery):
            terms = pick(lambda t: t.startswith(q.prefix))
        elif isinstance(q, WildcardQuery):
            from ..search.query import wildcard_to_regex

            _lit, rx = wildcard_to_regex(q.pattern)
            crx = _re.compile(rx)
            terms = pick(lambda t: crx.match(t) is not None)
        elif isinstance(q, RegexpQuery):
            crx = _re.compile("^" + q.pattern.strip("^$") + "$")
            terms = pick(lambda t: crx.match(t) is not None)
        elif isinstance(q, TermRangeQuery):
            def in_range(t: str) -> bool:
                if q.lower is not None:
                    if t < q.lower or (t == q.lower and not q.include_lower):
                        return False
                if q.upper is not None:
                    if t > q.upper or (t == q.upper and not q.include_upper):
                        return False
                return True

            terms = pick(in_range)
        elif isinstance(q, FuzzyQuery):
            pl = min(q.prefix_length, len(q.term))
            band = (len(q.term) - q.max_edits, len(q.term) + q.max_edits)
            matched = []
            for t in self.postings:
                if pl and not t.startswith(q.term[:pl]):
                    continue
                if not (band[0] <= len(t) <= band[1]):
                    continue
                e = osa_distance(q.term, t, q.max_edits)
                if e <= q.max_edits:
                    matched.append((t, e, self.doc_freq(t)))
            if not matched:
                return MatchNoDocsQuery()
            matched.sort(
                key=lambda m: (-fuzzy_similarity(m[1], m[0], q.term), -m[2], m[0])
            )
            matched = matched[:max_terms]
            blended_df = max(df for _t, _e, df in matched)
            return BooleanQuery(
                should=tuple(
                    TermQuery(
                        t,
                        boost=q.boost * fuzzy_similarity(e, t, q.term),
                        df_override=blended_df,
                    )
                    for t, e, _df in matched
                )
            )
        elif type(q).__name__ == "PhrasePrefixQuery":
            from ..search.query import MultiPhraseQuery

            exp = pick(lambda t: t.startswith(q.prefix))[
                : min(max_terms, q.max_expansions)
            ]
            if not exp:
                return MatchNoDocsQuery()
            slots = tuple((t,) for t in q.terms) + (tuple(sorted(exp)),)
            return MultiPhraseQuery(slots=slots, boost=q.boost)
        elif isinstance(q, BooleanQuery):
            return BooleanQuery(
                must=tuple(self.expand_multiterm(c, max_terms) for c in q.must),
                should=tuple(self.expand_multiterm(c, max_terms) for c in q.should),
                must_not=tuple(self.expand_multiterm(c, max_terms) for c in q.must_not),
                min_should_match=q.min_should_match,
            )
        elif isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                disjuncts=tuple(
                    self.expand_multiterm(c, max_terms) for c in q.disjuncts
                ),
                tie_breaker=q.tie_breaker,
            )
        elif isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(
                query=self.expand_multiterm(q.query, max_terms), boost=q.boost
            )
        else:
            return q
        if not terms:
            return MatchNoDocsQuery()
        return BooleanQuery(should=tuple(TermQuery(t, q.boost) for t in terms))

    def multi_phrase_scores(self, slots: tuple, boost: float = 1.0) -> dict[int, np.float32]:
        """MultiPhraseQuery: per slot the union of alternatives' positions,
        adjacency match, weight = summed idf over ALL involved terms
        (MultiPhraseQuery.java:53 scoring)."""
        # per slot: doc -> set of positions (union over alternatives)
        slot_pos: list[dict[int, set]] = []
        for slot in slots:
            acc: dict[int, set] = defaultdict(set)
            for t in slot:
                for d, _f, pos in self.postings.get(t, ()):
                    acc[d].update(pos)
            slot_pos.append(acc)
        common = set(slot_pos[0])
        for sp in slot_pos[1:]:
            common &= set(sp)
        all_terms = [t for slot in slots for t in slot]
        idf_sum = np.float32(sum(float(self.scorer(t).weight) for t in all_terms))
        cache = Bm25Scorer.create(1, self.doc_count, self.sum_ttf).cache
        sc = Bm25Scorer(weight=np.float32(np.float32(boost) * idf_sum), cache=cache)
        out: dict[int, np.float32] = {}
        for d in common:
            freq = sum(
                1
                for p0 in slot_pos[0][d]
                if all((p0 + i) in slot_pos[i][d] for i in range(1, len(slots)))
            )
            if freq > 0:
                out[d] = sc.score(np.array([freq]), np.array([self.norms[d]]))[0]
        return out

    def block_join_scores(self, q) -> dict[int, np.float32]:
        """ToParentBlockJoinQuery oracle: child scores grouped under the
        first parent docid at/after each child (ParentApproximation),
        combined per ScoreMode with a double accumulator in child-docid
        order (Score.java:296-341), boost-scaled (except none -> 0)."""
        import bisect

        parents = sorted(self.matching_docs(q.parents))
        child = self.eval_query(q.child)
        per: dict[int, list[float]] = defaultdict(list)
        for d in sorted(child):
            j = bisect.bisect_left(parents, d)
            if j < len(parents):
                per[parents[j]].append(float(child[d]))
        out: dict[int, np.float32] = {}
        for p, scores in per.items():
            if q.score_mode == "none":
                out[p] = np.float32(0.0)
                continue
            acc = scores[0]
            for s in scores[1:]:
                if q.score_mode in ("total", "avg"):
                    acc += s
                elif q.score_mode == "max":
                    acc = max(acc, s)
                else:
                    acc = min(acc, s)
            if q.score_mode == "avg":
                acc /= len(scores)
            out[p] = np.float32(acc * q.boost)
        return out

    def child_join_scores(self, q) -> dict[int, np.float32]:
        """ToChildBlockJoinQuery oracle: every docid strictly between the
        previous parent and a matching parent scores the parent's score."""
        import bisect

        parents = sorted(self.matching_docs(q.parents))
        pset = set(parents)
        out: dict[int, np.float32] = {}
        for p, s in self.eval_query(q.parent).items():
            if p not in pset:
                continue
            j = bisect.bisect_left(parents, p)
            prev = parents[j - 1] if j > 0 else -1
            for c in range(prev + 1, p):
                if c in self.norms:  # existing doc
                    out[c] = np.float32(float(s) * q.boost)
        return out

    # --- span family (queries/spans) — direct iterative port ------------

    def _span_doc_spans(self, q, docid: int) -> list[tuple[int, int, int]]:
        """Enumerated (start, end, width) spans of ``q`` in one doc — the
        reference algorithms run literally (pointer loops and the
        advance-min priority queue), per spans.py's file citations."""
        import heapq

        from ..search.spans import (
            SpanContaining,
            SpanNear,
            SpanNot,
            SpanOr,
            SpanPositionRange,
            SpanTerm,
            SpanWithin,
        )

        if isinstance(q, SpanTerm):
            for d, _, pos in self.postings.get(q.term, ()):
                if d == docid:
                    return [(p, p + 1, 0) for p in sorted(pos)]
            return []
        if isinstance(q, SpanOr):
            allsp = []
            for ci, c in enumerate(q.clauses):
                for s, e, w in self._span_doc_spans(c, docid):
                    allsp.append((s, e, ci, w))
            allsp.sort()
            return [(s, e, w) for s, e, _ci, w in allsp]
        if isinstance(q, SpanNear):
            subs = [self._span_doc_spans(c, docid) for c in q.clauses]
            if any(not s for s in subs):
                return []
            out = []
            if q.in_order:
                # NearSpansOrdered.stretchToOrder / advancePosition
                ptr = [0] * len(subs)
                for s0, e0, _w0 in subs[0]:
                    prev_end, width, ok = e0, 0, True
                    for t in range(1, len(subs)):
                        lst = subs[t]
                        while ptr[t] < len(lst) and lst[ptr[t]][0] < prev_end:
                            ptr[t] += 1
                        if ptr[t] >= len(lst):
                            return out  # oneExhaustedInCurrentDoc
                        st, et, _wt = lst[ptr[t]]
                        width += st - prev_end
                        prev_end = et
                    if ok and width <= q.slop:
                        out.append((s0, prev_end, width))
                return out
            # NearSpansUnordered: advance-min PQ sweep
            heap = []  # (start, end, clause, next_idx)
            total_len, max_end = 0, -1
            for ci, lst in enumerate(subs):
                s, e, _w = lst[0]
                heapq.heappush(heap, (s, e, ci, 1))
                total_len += e - s
                max_end = max(max_end, e)
            while True:
                s, e, ci, nxt = heap[0]
                if max_end - s - total_len <= q.slop:
                    out.append((s, max_end, max_end - s))
                if nxt >= len(subs[ci]):
                    return out
                heapq.heapreplace(
                    heap, (subs[ci][nxt][0], subs[ci][nxt][1], ci, nxt + 1)
                )
                total_len += (subs[ci][nxt][1] - subs[ci][nxt][0]) - (e - s)
                max_end = max(max_end, subs[ci][nxt][1])
        if isinstance(q, SpanPositionRange):
            out = []
            for s, e, w in self._span_doc_spans(q.match, docid):
                if s >= q.end:
                    break  # NO_MORE_IN_CURRENT_DOC
                if s >= q.start and e <= q.end:
                    out.append((s, e, w))
            return out
        if isinstance(q, SpanNot):
            inc = self._span_doc_spans(q.include, docid)
            exc = self._span_doc_spans(q.exclude, docid)
            if not exc:
                return inc
            out, j = [], 0
            for s, e, w in inc:
                while j < len(exc) and exc[j][1] <= s - q.pre:
                    j += 1
                if j >= len(exc) or exc[j][0] - q.post >= e:
                    out.append((s, e, w))
            return out
        if isinstance(q, (SpanContaining, SpanWithin)):
            big = self._span_doc_spans(q.big, docid)
            lit = self._span_doc_spans(q.little, docid)
            if not big or not lit:
                return []
            out = []
            if isinstance(q, SpanContaining):
                j = 0
                for bs, be, bw in big:
                    while j < len(lit) and lit[j][0] < bs:
                        j += 1
                    if j >= len(lit):
                        break
                    if be >= lit[j][1]:
                        out.append((bs, be, bw))
                return out
            j = 0
            for ls, le, lw in lit:
                while j < len(big) and big[j][1] < le:
                    j += 1
                if j >= len(big):
                    break
                if big[j][0] <= ls:
                    out.append((ls, le, lw))
            return out
        raise TypeError(f"not a span query: {q!r}")

    def span_scores(self, q) -> dict[int, np.float32]:
        """SpanScorer: freq = Σ 1/(1+width) over enumerated spans
        (accumulated per distinct width ascending, left-assoc double —
        the deterministic grouping shared with segment.py and the SQL
        gate), scored with idf summed over sorted DISTINCT terms
        (SpanWeight.buildSimWeight's one-entry-per-term Map)."""
        from ..search.spans import span_all_terms, span_terms

        terms = sorted(span_terms(q))
        idf_sum = np.float32(sum(float(self.scorer(t).weight) for t in terms))
        cache = Bm25Scorer.create(1, self.doc_count, self.sum_ttf).cache
        sc = Bm25Scorer(weight=idf_sum, cache=cache)
        docs: set[int] = set()
        for t in span_all_terms(q):
            docs.update(d for d, _, _ in self.postings.get(t, ()))
        out: dict[int, np.float32] = {}
        for d in sorted(docs):
            spans = self._span_doc_spans(q, d)
            if not spans:
                continue
            by_w: dict[int, int] = defaultdict(int)
            for _s, _e, w in spans:
                by_w[w] += 1
            freq = 0.0
            for w in sorted(by_w):
                freq += by_w[w] * (1.0 / (1.0 + w))
            out[d] = sc.score(np.array([freq]), np.array([self.norms[d]]))[0]
        return out

    def matching_docs(self, q) -> set[int]:
        from ..search.query import ConstantScoreQuery, TermInSetQuery

        if isinstance(q, TermInSetQuery):
            out: set[int] = set()
            for t in q.terms:
                out.update(d for d, _, _ in self.postings.get(t, ()))
            return out
        if isinstance(q, ConstantScoreQuery):
            return self.matching_docs(q.query)
        return set(self.eval_query(q))

    def eval_query(self, q) -> dict[int, np.float32]:
        """Evaluate a parsed query AST (search/query.py nodes) exhaustively.

        Float32 accumulation order = ascending clause index then doc — the
        same contract the engine follows, so scores are bit-comparable.
        """
        from ..search.query import (
            BooleanQuery,
            ConstantScoreQuery,
            DisjunctionMaxQuery,
            MatchAllDocsQuery,
            MatchNoDocsQuery,
            PhraseQuery,
            SynonymQuery,
            TermInSetQuery,
            TermQuery,
        )

        if isinstance(q, TermQuery):
            return self.term_scores(q.term, boost=q.boost, df_override=q.df_override)
        if isinstance(q, PhraseQuery):
            if q.slop > 0:
                return self.sloppy_phrase_scores(list(q.terms), q.slop, q.boost)
            return {
                d: np.float32(s)
                for d, s in self.search_phrase(
                    list(q.terms), k=max(self.doc_count, 1), boost=q.boost
                )
            }
        if isinstance(q, SynonymQuery):
            return self.synonym_scores(q.terms, q.boost)
        from ..search.query import IntervalFilter, IntervalNear, MultiPhraseQuery
        from ..search.query import ToParentBlockJoinQuery

        from ..search.spans import is_span

        if is_span(q):
            return self.span_scores(q)
        if isinstance(q, IntervalNear):
            return self.interval_scores(q)
        if isinstance(q, IntervalFilter):
            return self.interval_filter_scores(q)
        from ..search.query import IntervalAtLeast, IntervalOr

        if isinstance(q, IntervalAtLeast):
            return self.interval_atleast_scores(q)
        if isinstance(q, IntervalOr):
            return self.interval_or_scores(q)
        if isinstance(q, ToParentBlockJoinQuery):
            return self.block_join_scores(q)
        from ..search.query import ToChildBlockJoinQuery

        if isinstance(q, ToChildBlockJoinQuery):
            return self.child_join_scores(q)

        if isinstance(q, MultiPhraseQuery):
            return self.multi_phrase_scores(q.slots, q.boost)
        if isinstance(q, TermInSetQuery):
            return {d: np.float32(q.boost) for d in self.matching_docs(q)}
        if isinstance(q, ConstantScoreQuery):
            return {d: np.float32(q.boost) for d in self.matching_docs(q.query)}
        if isinstance(q, DisjunctionMaxQuery):
            per: dict[int, list[float]] = defaultdict(list)
            for c in q.disjuncts:
                for d, s in self.eval_query(c).items():
                    per[d].append(float(s))
            return {
                d: np.float32(
                    max(ss) + q.tie_breaker * (sum(ss) - max(ss))
                )
                for d, ss in per.items()
            }
        if isinstance(q, MatchAllDocsQuery):
            return {d: np.float32(q.boost) for d in self.norms}
        if isinstance(q, MatchNoDocsQuery):
            return {}
        if isinstance(q, BooleanQuery):
            acc: dict[int, np.float32]
            if q.must:
                evaluated = [self.eval_query(c) for c in q.must]
                common = set(evaluated[0])
                for e in evaluated[1:]:
                    common &= set(e)
                acc = {d: np.float32(0.0) for d in sorted(common)}
                for e in evaluated:
                    for d in acc:
                        acc[d] = np.float32(acc[d] + e[d])
                n_should: dict[int, int] = defaultdict(int)
                for c in q.should:
                    e = self.eval_query(c)
                    for d in acc:
                        if d in e:
                            acc[d] = np.float32(acc[d] + e[d])
                            n_should[d] += 1
                if q.min_should_match > 0:
                    acc = {
                        d: s
                        for d, s in acc.items()
                        if n_should[d] >= q.min_should_match
                    }
            else:
                acc = {}
                counts: dict[int, int] = defaultdict(int)
                for c in q.should:
                    for d, s in self.eval_query(c).items():
                        acc[d] = np.float32(acc.get(d, np.float32(0.0)) + s)
                        counts[d] += 1
                if q.min_should_match > 1:
                    acc = {
                        d: s for d, s in acc.items() if counts[d] >= q.min_should_match
                    }
            for c in q.must_not:
                for d in self.eval_query(c):
                    acc.pop(d, None)
            return acc
        raise TypeError(f"unsupported query node {type(q)}")

    def search_query(self, q, k: int = 10) -> list[tuple[int, float]]:
        from ..search.query import rewrite

        q = rewrite(self.expand_multiterm(q))
        return topk_sort(
            [(d, float(s)) for d, s in self.eval_query(q).items()], k
        )

    def search_phrase(
        self, phrase_terms: list[str], k: int = 10, boost: float = 1.0
    ) -> list[tuple[int, float]]:
        """Exact phrase: freq = number of phrase occurrences, scored with
        summed idf (BM25Similarity.idfExplain over the terms,
        BM25Similarity.java:160-169) — ExactPhraseMatcher semantics."""
        if not phrase_terms:
            return []
        plists = [
            {d: pos for d, _, pos in self.postings.get(t, ())} for t in phrase_terms
        ]
        common = set(plists[0])
        for p in plists[1:]:
            common &= set(p)
        # summed idf: accumulate each term's float32 idf into a double,
        # then cast back to float32 (BM25Similarity.idfExplain :161-168)
        idf_sum = np.float32(
            sum(float(self.scorer(t).weight) for t in phrase_terms)
        )
        cache = Bm25Scorer.create(1, self.doc_count, self.sum_ttf).cache
        sc = Bm25Scorer(weight=np.float32(np.float32(boost) * idf_sum), cache=cache)
        hits = []
        for d in common:
            first = np.array(plists[0][d])
            freq = 0
            for p0 in first:
                if all((p0 + i) in plists[i][d] for i in range(1, len(phrase_terms))):
                    freq += 1
            if freq > 0:
                s = sc.score(np.array([freq]), np.array([self.norms[d]]))[0]
                hits.append((d, float(s)))
        return topk_sort(hits, k)
