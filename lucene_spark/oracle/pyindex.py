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
    # term -> list[(docid, freq, positions)]
    postings: dict[str, list[tuple[int, int, list[int]]]] = field(
        default_factory=lambda: defaultdict(list)
    )
    norms: dict[int, int] = field(default_factory=dict)       # docid -> norm byte
    doc_lens: dict[int, int] = field(default_factory=dict)    # docid -> field length
    doc_count: int = 0
    sum_ttf: int = 0

    def add(self, docid: int, text: str) -> None:
        toks = analyze(text, stopwords=self.stopwords)
        per_term: dict[str, list[int]] = defaultdict(list)
        for t in toks:
            per_term[t.term].append(t.position)
        length = len(toks)  # discountOverlaps: posIncr==0 tokens don't count
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
    def term_scores(self, term: str) -> dict[int, np.float32]:
        sc = self.scorer(term)
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

    def eval_query(self, q) -> dict[int, np.float32]:
        """Evaluate a parsed query AST (search/query.py nodes) exhaustively.

        Float32 accumulation order = ascending clause index then doc — the
        same contract the engine follows, so scores are bit-comparable.
        """
        from ..search.query import (
            BooleanQuery,
            MatchAllDocsQuery,
            MatchNoDocsQuery,
            PhraseQuery,
            TermQuery,
        )

        if isinstance(q, TermQuery):
            return self.term_scores(q.term)
        if isinstance(q, PhraseQuery):
            return self.phrase_scores(list(q.terms))
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
                for c in q.should:
                    e = self.eval_query(c)
                    for d in acc:
                        if d in e:
                            acc[d] = np.float32(acc[d] + e[d])
            else:
                acc = {}
                for c in q.should:
                    for d, s in self.eval_query(c).items():
                        acc[d] = np.float32(acc.get(d, np.float32(0.0)) + s)
            for c in q.must_not:
                for d in self.eval_query(c):
                    acc.pop(d, None)
            return acc
        raise TypeError(f"unsupported query node {type(q)}")

    def search_query(self, q, k: int = 10) -> list[tuple[int, float]]:
        return topk_sort(
            [(d, float(s)) for d, s in self.eval_query(q).items()], k
        )

    def search_phrase(self, phrase_terms: list[str], k: int = 10) -> list[tuple[int, float]]:
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
        sc = Bm25Scorer(weight=idf_sum, cache=cache)
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
