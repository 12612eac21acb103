"""Fuzzy-term expansion support.

Lucene enumerates fuzzy candidates with a Levenshtein automaton over the
term dictionary (search/FuzzyTermsEnum.java, util/automaton/
LevenshteinAutomata.java, transpositions=true by default —
FuzzyQuery.java:52). The Spark-first equivalent: push a cheap superset
predicate (shared prefix + length band — both are automaton invariants)
into the term_dict parquet scan, then verify the survivors with a banded
edit-distance DP on the driver. Candidate sets after pushdown are
planning-sized (one term's neighborhood), never postings-sized.

Distance = optimal string alignment (Damerau-Levenshtein with adjacent
transposition counted as one edit, no substring re-edit) — matches the
automaton's transpositions=true behavior for max_edits ≤ 2, the only
values FuzzyQuery accepts (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE).
"""

from __future__ import annotations

__all__ = ["osa_distance", "fuzzy_similarity"]


def osa_distance(a: str, b: str, max_edits: int, transpositions: bool = True) -> int:
    """Banded OSA edit distance; returns max_edits+1 when the distance
    exceeds max_edits (early bail on the band). ``transpositions=False``
    degrades to plain Levenshtein (FuzzyQuery's transpositions=false mode,
    spell/LevenshteinDistance.java metric)."""
    la, lb = len(a), len(b)
    bail = max_edits + 1
    if abs(la - lb) > max_edits:
        return bail
    if a == b:
        return 0
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - max_edits)
        hi = min(lb, i + max_edits)
        if lo > 1:
            cur[lo - 1] = bail
        best = bail
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpositions
                and prev2 is not None
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            best = min(best, v)
        if hi < lb:
            cur[hi + 1 :] = [bail] * (lb - hi)
        if best > max_edits:
            return bail
        prev2, prev = prev, cur
    return min(prev[lb], bail)


def fuzzy_similarity(edits: int, term: str, target: str) -> float:
    """Per-candidate boost = 1 - edits/min(len(term), len(target))
    (FuzzyTermsEnum boost attribute semantics); exact match boosts 1.0."""
    if edits == 0:
        return 1.0
    m = min(len(term), len(target))
    return 1.0 - edits / m if m else 0.0
