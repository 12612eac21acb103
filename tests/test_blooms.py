"""Per-segment term Bloom filters (index/blooms.py) — segment-skip pruning
with BloomFilteringPostingsFormat semantics: pruning never changes results,
staleness degrades to no-pruning."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.index.blooms import (
    bloom_candidate_segments,
    load_term_blooms,
    write_term_blooms,
)
from lucene_spark.index.reader import IndexReader
from lucene_spark.search import Searcher

STOP = ENGLISH_STOP_WORDS
NSEG = 6


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloom_idx"))
    # 400 fixture docs + one marker doc holding a unique primary-key-ish
    # term (the BloomFilteringPostingsFormat target workload)
    rows = generate_webtext(400)
    rows.append({"url": "https://marker.example/1", "text": "uniqmarkerterm w0001"})
    build_index(spark, _df(spark, rows), d, num_segments=NSEG, stopwords=STOP)
    info = write_term_blooms(spark, d)
    assert info["segments"] == NSEG
    return d


def test_rare_term_prunes_segments(spark, idx):
    reader = IndexReader(spark, idx)
    live = [int(r["segment_id"]) for r in reader.manifest_rows]
    blooms = load_term_blooms(spark, idx, reader.doc_counts)
    assert set(blooms) == set(live) and len(live) == NSEG
    cand = bloom_candidate_segments(blooms, live, ["uniqmarkerterm"])
    assert cand is not None and 1 <= len(cand) < NSEG
    # a term in (almost) every doc keeps every segment -> None (skip filter)
    assert bloom_candidate_segments(blooms, live, ["w0001"]) is None
    # unioned terms: the hot term dominates
    assert bloom_candidate_segments(blooms, live, ["uniqmarkerterm", "w0001"]) is None


def test_results_identical_with_and_without_blooms(spark, idx, tmp_path_factory):
    import shutil

    bare = str(tmp_path_factory.mktemp("bloom_bare")) + "/idx"
    shutil.copytree(idx, bare)
    shutil.rmtree(f"{bare}/term_blooms")

    for q in ["uniqmarkerterm", "w0001 AND NOT w0002", "w0003 OR uniqmarkerterm"]:
        with_b = Searcher(spark, idx, stopwords=STOP).search(q, k=20, with_url=True)
        no_b = Searcher(spark, bare, stopwords=STOP).search(q, k=20, with_url=True)
        a = [(r["url"], round(r["score"], 6)) for r in with_b.collect()]
        b = [(r["url"], round(r["score"], 6)) for r in no_b.collect()]
        assert a == b, q

    hits = Searcher(spark, idx, stopwords=STOP).search("uniqmarkerterm", k=5)
    assert hits.count() == 1


def test_stale_blooms_degrade_to_no_pruning(spark, idx, tmp_path_factory):
    import shutil

    d = str(tmp_path_factory.mktemp("bloom_stale")) + "/idx"
    shutil.copytree(idx, d)
    # append a new doc with a brand-new term WITHOUT refreshing blooms
    rows = [{"url": "https://late.example/1", "text": "latearrivalterm w0002"}]
    build_index(spark, _df(spark, rows), d, num_segments=1, stopwords=STOP, append=True)

    reader = IndexReader(spark, d)
    live = [int(r["segment_id"]) for r in reader.manifest_rows]
    assert len(live) == NSEG + 1
    blooms = load_term_blooms(spark, d, reader.doc_counts)
    # the appended segment has no (valid) bloom row -> always a candidate
    appended = set(live) - set(blooms)
    assert len(appended) == 1
    cand = bloom_candidate_segments(blooms, live, ["latearrivalterm"])
    assert cand is not None and appended <= set(cand)
    hits = Searcher(spark, d, stopwords=STOP).search("latearrivalterm", k=5)
    assert hits.count() == 1
    # refresh picks the new segment up and keeps pruning the rest
    write_term_blooms(spark, d)
    reader2 = IndexReader(spark, d)
    blooms2 = load_term_blooms(spark, d, reader2.doc_counts)
    assert set(blooms2) == set(live)
    cand2 = bloom_candidate_segments(blooms2, live, ["latearrivalterm"])
    assert cand2 is not None and len(cand2) < len(live)


def test_partition_filter_reaches_plan(spark, idx):
    s = Searcher(spark, idx, stopwords=STOP)
    blocks = s._postings_blocks(["uniqmarkerterm"], need_positions=False)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "segment_id" in plan
    # the pruned scan reads fewer than NSEG segment partitions
    reader = IndexReader(spark, idx)
    cand = bloom_candidate_segments(
        reader.term_blooms,
        [int(r["segment_id"]) for r in reader.manifest_rows],
        ["uniqmarkerterm"],
    )
    segs = {int(r["segment_id"]) for r in blocks.select("segment_id").distinct().collect()}
    assert segs <= set(cand)
