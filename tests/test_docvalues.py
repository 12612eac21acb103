"""Numeric doc-values: build-time storage + sort (SortField.Type.DOUBLE).

Reference behavior: document/NumericDocValuesField.java + SortField over
numeric doc-values; missing values sort last (Lucene's missing-value
default used here in both directions). The DuckDB-oracle gate row
(sort_by_docvalue) lives in test_gate.py.
"""

import pytest

from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.search.searcher import Searcher


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(300)


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dvidx"))
    rows = [
        # every 7th doc has NO rank value (missing doc-value)
        (r["url"], r["text"], None if i % 7 == 0 else float((i * 13) % 101))
        for i, r in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, "url string, text string, rank double")
    build_index(
        spark, df, d, num_segments=3, analyzer="simple",
        doc_values={"rank": "rank"},
    )
    return d


def _expected(corpus, term, ascending, k):
    from lucene_spark.analysis.simple import simple_terms_positions

    matches = []
    for i, r in enumerate(corpus):
        terms, _ = simple_terms_positions(r["text"], None)
        if term in terms:
            rank = None if i % 7 == 0 else float((i * 13) % 101)
            matches.append((r["url"], rank))
    present = [m for m in matches if m[1] is not None]
    missing = [m for m in matches if m[1] is None]
    present.sort(key=lambda t: (t[1] if ascending else -t[1], t[0]))
    return present, missing


def test_sort_desc_with_missing_last(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    out = s.search_sorted_by("w0001", sort_col="dv:rank", ascending=False, k=500)
    dm = s._docmap_global().select("docid", "url")
    got = [
        (r["url"], r["dv_rank"])
        for r in out.join(dm, "docid")
        .orderBy("dv_rank", ascending=False)
        .collect()
    ]
    present, missing = _expected(corpus, "w0001", ascending=False, k=500)
    assert len(got) == len(present) + len(missing)
    got_vals = [v for _u, v in got if v is not None]
    assert got_vals == [v for _u, v in present]
    # missing values all trail
    tail = got[len(present):]
    assert all(v is None for _u, v in tail)


def test_sort_asc_nulls_last(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    rows = s.search_sorted_by(
        "w0002", sort_col="dv:rank", ascending=True, k=10
    ).collect()
    vals = [r["dv_rank"] for r in rows]
    assert all(v is not None for v in vals)
    assert vals == sorted(vals)


def test_dv_survives_merge(spark, corpus, index_dir, tmp_path):
    from lucene_spark.index.merge import merge_segments

    out = str(tmp_path / "merged")
    merge_segments(spark, index_dir, out, target_segments=1)
    s = Searcher(spark, out, analyzer="simple", mode="double")
    a = s.search_sorted_by("w0001", sort_col="dv:rank", k=10).collect()
    s0 = Searcher(spark, index_dir, analyzer="simple", mode="double")
    b = s0.search_sorted_by("w0001", sort_col="dv:rank", k=10).collect()
    assert [r["dv_rank"] for r in a] == [r["dv_rank"] for r in b]


def test_meta_records_doc_values(index_dir):
    import json, os

    with open(os.path.join(index_dir, "index_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["doc_values"] == ["rank"]


def test_index_sorted_by_docvalue_early_terminates(spark, corpus, index_dir, tmp_path):
    """index_sort='dv:rank' (setIndexSort with a numeric SortField): docid
    order within each segment IS (rank DESC, url ASC), and sorted top-k
    through the early-termination path matches the exhaustive path of an
    UNSORTED index over the same docs."""
    d = str(tmp_path / "dvsorted")
    rows = [
        (r["url"], r["text"], None if i % 7 == 0 else float((i * 13) % 101))
        for i, r in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, "url string, text string, rank double")
    build_index(
        spark, df, d, num_segments=3, analyzer="simple",
        doc_values={"rank": "rank"}, index_sort="dv:rank",
    )
    s = Searcher(spark, d, analyzer="simple", mode="double")
    assert s.index_sort == "dv:rank"
    # docid order == value order within each segment
    dm = s.reader.docmap.orderBy("segment_id", "docid").collect()
    by_seg: dict = {}
    for r in dm:
        by_seg.setdefault(r["segment_id"], []).append(
            (r["dv"] or {}).get("rank")
        )
    for seg, vals in by_seg.items():
        present = [v for v in vals if v is not None]
        assert present == sorted(present, reverse=True), f"segment {seg}"
        # missing values trail
        first_none = next((i for i, v in enumerate(vals) if v is None), len(vals))
        assert all(v is None for v in vals[first_none:])
    got = s.search_sorted_by("w0001", sort_col="dv:rank", k=10).collect()
    # reference: the UNSORTED module-fixture index over the same docs takes
    # the exhaustive path — values must agree
    ref = (
        Searcher(spark, index_dir, analyzer="simple", mode="double")
        .search_sorted_by("w0001", sort_col="dv:rank", k=10)
        .collect()
    )
    assert [r["dv_rank"] for r in got] == [r["dv_rank"] for r in ref]


def test_index_sort_dv_requires_doc_value(spark, corpus, tmp_path):
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:20]], "url string, text string"
    )
    with pytest.raises(ValueError, match="needs doc_values"):
        build_index(
            spark, df, str(tmp_path / "bad2"), num_segments=1,
            analyzer="simple", index_sort="dv:rank",
        )


def test_index_without_dv_reads_null(spark, corpus, tmp_path):
    d = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:60]], "url string, text string"
    )
    build_index(spark, df, d, num_segments=1, analyzer="simple")
    s = Searcher(spark, d, analyzer="simple", mode="double")
    rows = s.search_sorted_by("w0001", sort_col="dv:rank", k=5).collect()
    assert all(r["dv_rank"] is None for r in rows)


def test_distance_feature_combines_and_skips_missing(spark, corpus, index_dir):
    """DistanceFeatureQuery as the SHOULD clause: score = query score +
    weight*pivot/(pivot+|dv-origin|); docs with no doc-value get no
    feature contribution (LongDistanceFeatureQuery's dv-iterator skip)."""
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    base = {
        r["docid"]: r["score"] for r in s.search_all("w0001").collect()
    }
    dm = {
        r["docid"]: r["url"]
        for r in s._docmap_global().select("docid", "url").collect()
    }
    url_rank = {
        r["url"]: (None if i % 7 == 0 else float((i * 13) % 101))
        for i, r in enumerate(corpus)
    }
    exp = {}
    for d, sc in base.items():
        rank = url_rank[dm[d]]
        feat = 0.0 if rank is None else 3.0 * (20.0 / (20.0 + abs(rank - 50.0)))
        exp[d] = sc + feat
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["docid"], r["score"])
        for r in s.distance_feature(
            "w0001", "rank", origin=50.0, pivot=20.0, weight=3.0, k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (gd, gs), (ed, es) in zip(got, top):
        assert gs == pytest.approx(es, abs=1e-9)
    with pytest.raises(ValueError):
        s.distance_feature("w0001", "rank", origin=0.0, pivot=0.0)
