"""IndexWriter.addIndexes(Directory...) analog (index/addindexes.py):
absorbed segments score identically to a single build, deletes and
docValues updates follow the segment rename, incompatible metas raise."""

import pytest

from lucene_spark.index import build_index
from lucene_spark.index.addindexes import add_indexes
from lucene_spark.search import Searcher


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_combined_equals_single_build(spark, tmp_path):
    all_rows = [(f"doc://{i}", f"w{i % 3} common text") for i in range(12)]
    dst, src, ref = (
        str(tmp_path / "dst"), str(tmp_path / "src"), str(tmp_path / "ref")
    )
    build_index(spark, _docs(spark, all_rows[:6]), dst, num_segments=2,
                analyzer="simple", stopwords=None)
    build_index(spark, _docs(spark, all_rows[6:]), src, num_segments=2,
                analyzer="simple", stopwords=None)
    out = add_indexes(spark, dst, [src])
    assert out["added_segments"] == 2
    assert out["n_docs_total"] == 12
    build_index(spark, _docs(spark, all_rows), ref, num_segments=1,
                analyzer="simple", stopwords=None)
    sa = Searcher(spark, dst, analyzer="simple", mode="double")
    sb = Searcher(spark, ref, analyzer="simple", mode="double")
    for q in ["common", "w0", "w1 OR w2", '"common text"']:
        got = sorted(
            (r["url"], round(r["score"], 6))
            for r in sa.search(q, k=20, with_url=True).collect()
        )
        exp = sorted(
            (r["url"], round(r["score"], 6))
            for r in sb.search(q, k=20, with_url=True).collect()
        )
        assert got == exp, q


def test_deletes_follow_the_rename(spark, tmp_path):
    from lucene_spark.index.deletes import add_deletes_by_url

    dst, src = str(tmp_path / "dst"), str(tmp_path / "src")
    build_index(spark, _docs(spark, [("doc://0", "alpha"), ("doc://1", "alpha")]),
                dst, num_segments=1, analyzer="simple", stopwords=None)
    build_index(spark, _docs(spark, [("doc://2", "alpha"), ("doc://3", "alpha")]),
                src, num_segments=1, analyzer="simple", stopwords=None)
    add_deletes_by_url(
        spark, src, spark.createDataFrame([("doc://3",)], "url string")
    )
    add_indexes(spark, dst, [src])
    s = Searcher(spark, dst, analyzer="simple", mode="double")
    got = {r["url"] for r in s.search("alpha", k=10, with_url=True).collect()}
    assert got == {"doc://0", "doc://1", "doc://2"}  # doc://3 stays deleted


def test_incompatible_meta_raises(spark, tmp_path):
    dst, src = str(tmp_path / "dst"), str(tmp_path / "src")
    build_index(spark, _docs(spark, [("doc://0", "alpha")]), dst,
                num_segments=1, analyzer="simple", stopwords=None)
    df = spark.createDataFrame(
        [("doc://1", "beta", "t")], "url string, text string, title string"
    )
    build_index(spark, df, src, num_segments=1, analyzer="simple",
                stopwords=None, fields={"text": "text", "title": "title"})
    with pytest.raises(ValueError, match="incompatible index_meta"):
        add_indexes(spark, dst, [src])
