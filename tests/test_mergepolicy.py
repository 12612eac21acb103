"""TieredMergePolicy planning (driver-side, no Spark)."""

from lucene_spark.index.mergepolicy import TieredMergePolicy


def _manifest(sizes):
    rows, base = [], 0
    for i, n in enumerate(sizes):
        rows.append({"segment_id": i, "n_docs": n, "doc_base": base})
        base += n
    return rows


def test_no_merge_below_tier_threshold():
    p = TieredMergePolicy(segments_per_tier=10)
    assert p.find_merges(_manifest([5000] * 10)) == []


def test_merges_smallest_tier_contiguously():
    p = TieredMergePolicy(segments_per_tier=4, max_merge_at_once=8)
    plans = p.find_merges(_manifest([1000] * 12))
    assert plans, "12 small segments over tier limit of 4 must merge"
    for plan in plans:
        ids = list(plan.segment_ids)
        assert ids == sorted(ids)
        # doc_base-contiguous run
        assert ids == list(range(ids[0], ids[0] + len(ids)))
        assert len(ids) <= 8
        assert plan.total_docs == 1000 * len(ids)
    # plans don't overlap
    all_ids = [s for pl in plans for s in pl.segment_ids]
    assert len(all_ids) == len(set(all_ids))


def test_max_merged_docs_bounds_runs():
    p = TieredMergePolicy(
        segments_per_tier=2, max_merge_at_once=100, max_merged_docs=2500,
        floor_docs=10_000,
    )
    plans = p.find_merges(_manifest([1000] * 10))
    assert plans
    for plan in plans:
        assert plan.total_docs <= 2500


def test_mixed_tiers_only_over_threshold():
    # 3 big segments (tier>0) + 12 tiny ones: only the tiny tier merges
    p = TieredMergePolicy(segments_per_tier=4, floor_docs=1000)
    rows = _manifest([500_000] * 3 + [800] * 12)
    plans = p.find_merges(rows)
    assert plans
    merged = {s for pl in plans for s in pl.segment_ids}
    assert merged <= set(range(3, 15))
