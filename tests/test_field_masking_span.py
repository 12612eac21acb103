"""FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.java:67):
the mask delegates evaluation entirely to the masked clause, so on a
single field it is a no-op; across fields with parallel positions it
joins positions from different fields (the denormalized-children
pattern). The exact-score cross-field gate is test_gate.py's
``span_field_masking`` row."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import build_index
from lucene_spark.index.builder import FIELD_SEP
from lucene_spark.search import Searcher
from lucene_spark.search.spans import FieldMaskedSpan, SpanNear, SpanTerm

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata parquet not present",
)


def test_mask_requires_span():
    with pytest.raises(TypeError):
        FieldMaskedSpan("not a span", "title")


def test_mask_is_identity_on_single_field(spark, tmp_path):
    idx = str(tmp_path / "fm_idx")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(150)
        .select(
            F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
            "text",
        )
    )
    build_index(spark, docs, idx, num_segments=2, analyzer="simple",
                stopwords=None, index_positions=True)
    s = Searcher(spark, idx, mode="double")
    plain = SpanNear((SpanTerm("data"), SpanTerm("stream")), slop=3)
    masked = SpanNear(
        (SpanTerm("data"), FieldMaskedSpan(SpanTerm("stream"), "text")),
        slop=3,
    )
    got_p = [(r["url"], round(r["score"], 6))
             for r in s.search(plain, k=50, with_url=True).collect()]
    got_m = [(r["url"], round(r["score"], 6))
             for r in s.search(masked, k=50, with_url=True).collect()]
    assert got_p == got_m and got_p


def test_cross_field_parallel_positions(spark, tmp_path):
    # two position-parallel fields (the denormalized-children javadoc
    # pattern): ordered near slop=0 requires mask(last:jones) at exactly
    # pos(first:james) + 1 — doc 1 aligns (jones@1), doc 2 does not
    # (jones@0), so masking joins positions ACROSS the two fields.
    idx = str(tmp_path / "fm_idx2")
    docs = spark.createDataFrame(
        [
            ("doc://1", "james x", "y jones"),
            ("doc://2", "james sally", "jones smith"),
        ],
        "url string, first string, last string",
    )
    build_index(
        spark, docs, idx, num_segments=1, analyzer="simple", stopwords=None,
        index_positions=True, fields={"first": "first", "last": "last"},
    )
    s = Searcher(spark, idx, mode="double")
    q = SpanNear(
        (
            SpanTerm("first" + FIELD_SEP + "james"),
            FieldMaskedSpan(SpanTerm("last" + FIELD_SEP + "jones"), "first"),
        ),
        slop=0,
    )
    urls = {r["url"] for r in s.search(q, k=10, with_url=True).collect()}
    assert urls == {"doc://1"}
