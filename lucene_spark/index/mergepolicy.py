"""Tiered merge planning over the segment manifest.

Driver-side re-expression of TieredMergePolicy (reference:
lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:85-90):
segments are log-bucketed by size; when a tier holds more than
``segments_per_tier`` segments, the smallest run of up to
``max_merge_at_once`` adjacent (doc_base-contiguous) segments is planned as
one merge, bounded by ``max_merged_docs`` (the 5GB max-merged-segment analog
expressed in docs — the engine's segment cost is doc-proportional). Like
ConcurrentMergeScheduler, execution happens in separate Spark jobs
(merge.merge_segments); the policy only PLANS.

Contiguity: our docids are globalized via per-segment doc_base, so merging
only doc_base-adjacent segments keeps every docid stable — the same reason
Lucene's DocIDMerger remaps monotonically (index/DocIDMerger.java:32-45).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["MergePlan", "TieredMergePolicy"]


@dataclass(frozen=True)
class MergePlan:
    """One planned merge: the segment_ids to combine (doc_base-contiguous,
    ascending) and their total docs."""

    segment_ids: tuple[int, ...]
    total_docs: int


class TieredMergePolicy:
    def __init__(
        self,
        *,
        segments_per_tier: int = 10,      # TieredMergePolicy default
        max_merge_at_once: int = 10,
        max_merged_docs: int = 50_000_000,  # ~5GB at ~100 bytes/doc postings
        floor_docs: int = 10_000,           # 16MB-floor analog
    ):
        self.segments_per_tier = segments_per_tier
        self.max_merge_at_once = max_merge_at_once
        self.max_merged_docs = max_merged_docs
        self.floor_docs = floor_docs

    def _tier(self, n_docs: int) -> int:
        return int(math.log10(max(n_docs, self.floor_docs) / self.floor_docs)) if (
            n_docs > self.floor_docs
        ) else 0

    def find_merges(self, manifest_rows: list[dict]) -> list[MergePlan]:
        """Plan merges over manifest rows (needs segment_id, n_docs,
        doc_base). Returns non-overlapping plans, smallest tiers first."""
        segs = sorted(
            (
                {
                    "segment_id": int(r["segment_id"]),
                    "n_docs": int(r["n_docs"]),
                    "doc_base": int(r["doc_base"]),
                }
                for r in manifest_rows
            ),
            key=lambda r: r["doc_base"],
        )
        by_tier: dict[int, list[dict]] = {}
        for s in segs:
            by_tier.setdefault(self._tier(s["n_docs"]), []).append(s)
        plans: list[MergePlan] = []
        used: set[int] = set()
        for tier in sorted(by_tier):
            members = by_tier[tier]
            if len(members) <= self.segments_per_tier:
                continue
            # take doc_base-adjacent runs among this tier's members
            run: list[dict] = []
            run_docs = 0
            idx = {s["segment_id"] for s in members}
            for s in segs:
                eligible = (
                    s["segment_id"] in idx
                    and s["segment_id"] not in used
                    and run_docs + s["n_docs"] <= self.max_merged_docs
                    and len(run) < self.max_merge_at_once
                )
                if eligible:
                    run.append(s)
                    run_docs += s["n_docs"]
                else:
                    if len(run) >= 2:
                        plans.append(
                            MergePlan(
                                tuple(x["segment_id"] for x in run), run_docs
                            )
                        )
                        used.update(x["segment_id"] for x in run)
                    run, run_docs = [], 0
                    if s["segment_id"] in idx and s["segment_id"] not in used:
                        run, run_docs = [s], s["n_docs"]
            if len(run) >= 2:
                plans.append(MergePlan(tuple(x["segment_id"] for x in run), run_docs))
                used.update(x["segment_id"] for x in run)
        return plans
