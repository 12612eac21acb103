"""Index sorting (IndexWriterConfig.setIndexSort / index/Sorter.java):
docids within a segment are assigned by (doc_len DESC, url ASC), so
top-k-by-length queries early-terminate per segment
(TopFieldCollector.java canEarlyTerminate)."""

import pytest

from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.search import Searcher

STOP = ENGLISH_STOP_WORDS


@pytest.fixture(scope="module")
def sorted_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_sorted"))
    rows = generate_webtext(240)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )
    build_index(
        spark, df, d, num_segments=4, stopwords=STOP, index_sort="doc_len"
    )
    return d


@pytest.fixture(scope="module")
def s(spark, sorted_index):
    return Searcher(spark, sorted_index, stopwords=STOP)


def test_meta_records_sort(s):
    assert s.index_sort == "doc_len"


def test_docid_order_is_sort_order(s):
    """Within every segment, ascending docid ⇒ non-increasing doc_len,
    ties broken by ascending url (insertion order)."""
    rows = (
        s.reader.docmap.select("segment_id", "docid", "doc_len", "url")
        .orderBy("segment_id", "docid")
        .collect()
    )
    by_seg: dict[int, list] = {}
    for r in rows:
        by_seg.setdefault(r["segment_id"], []).append((r["doc_len"], r["url"]))
    assert len(by_seg) == 4
    for seg, vals in by_seg.items():
        keyed = [(-dl, u) for dl, u in vals]
        assert keyed == sorted(keyed), f"segment {seg} not index-sorted"


def test_early_terminated_topk_matches_bruteforce(s, spark, sorted_index):
    hits = s.search_all(s.parse("w0001")).select("docid").collect()
    match_ids = {r["docid"] for r in hits}
    dm = {
        r["docid"]: (r["doc_len"], r["url"])
        for r in s._docmap_global().select("docid", "doc_len", "url").collect()
    }
    expected = sorted(
        ((dm[d][0], dm[d][1], d) for d in match_ids),
        key=lambda t: (-t[0], t[1]),
    )[:15]
    got = s.search_sorted_by("w0001", sort_col="doc_len", ascending=False, k=15)
    got_rows = [(r["doc_len"], dm[r["docid"]][1], r["docid"]) for r in got.collect()]
    assert got_rows == expected


def test_sorted_path_plan_shrinks_join(s):
    """The early-terminated plan cuts per segment BEFORE the docmap join —
    the window filter (rn <= k) must appear below the join in the plan."""
    df = s.search_sorted_by("w0001", sort_col="doc_len", ascending=False, k=5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan.lower() or "_rn" in plan


def test_block_key_conflict(spark, tmp_path):
    df = spark.createDataFrame([("u", "t")], "url string, text string")
    with pytest.raises(ValueError):
        build_index(
            spark, df, str(tmp_path / "x"), num_segments=1,
            index_sort="doc_len", block_key="url",
        )
    with pytest.raises(ValueError):
        build_index(
            spark, df, str(tmp_path / "y"), num_segments=1, index_sort="nope"
        )


def test_merge_drops_sort_flag(spark, sorted_index, tmp_path):
    """A metadata-only merge concatenates docid ranges, so the merged index
    must not advertise index_sort (the searcher would early-terminate
    incorrectly)."""
    from lucene_spark.index.merge import merge_segments

    out = str(tmp_path / "merged")
    merge_segments(spark, sorted_index, out, target_segments=2)
    s2 = Searcher(spark, out, stopwords=STOP)
    assert s2.index_sort is None
    # and the fallback (non-early) sorted query still works on the merge
    rows = s2.search_sorted_by(
        "w0001", sort_col="doc_len", ascending=False, k=5
    ).collect()
    assert len(rows) == 5
    dls = [r["doc_len"] for r in rows]
    assert dls == sorted(dls, reverse=True)


def test_sorted_search_after_pages(s):
    """FieldDoc searchAfter: page 2 = the next k in (doc_len DESC, docid ASC)
    order strictly after page 1's last hit (non-early path contract)."""
    full = s.search_sorted_by(
        "w0001", sort_col="doc_len", ascending=False, k=20, after=(10**9, -1)
    ).collect()
    page1 = full[:8]
    anchor = (float(page1[-1]["doc_len"]), int(page1[-1]["docid"]))
    page2 = s.search_sorted_by(
        "w0001", sort_col="doc_len", ascending=False, k=8, after=anchor
    ).collect()
    got = [(r["docid"], r["doc_len"]) for r in page2]
    exp = [(r["docid"], r["doc_len"]) for r in full[8:16]]
    assert got == exp


def test_count_with_relation(s):
    q = s.parse("w0001")
    exact = s.count(q)
    assert s.count_with_relation(q, total_hits_threshold=10**9) == (
        exact, "EQUAL_TO"
    )
    if exact > 1:
        v, rel = s.count_with_relation(q, total_hits_threshold=1)
        assert (v, rel) == (1, "GREATER_THAN_OR_EQUAL_TO")
