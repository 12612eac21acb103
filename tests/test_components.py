"""connected_components (hash-min label propagation): path graphs that
need multiple propagation rounds, multi-component graphs, and the
cluster-contract invariants (every edge internal, component = min member)."""

import pytest

from lucene_spark.pipeline.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_path_graph_needs_propagation(spark):
    # 0-1-2-3-4-5: diameter 5, min label must travel the whole path
    got = _cc(spark, [(i, i + 1) for i in range(5)])
    assert got == {i: 0 for i in range(6)}


def test_two_components_and_reversed_edges(spark):
    got = _cc(spark, [(3, 1), (2, 1), (10, 20), (30, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 20: 10, 30: 10}


def test_invariants_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(60, 2))
        if a != b
    ]
    got = _cc(spark, pairs)
    # every edge is internal to one component
    for a, b in pairs:
        assert got[a] == got[b], (a, b, got)
    # each component's label is its minimum member
    comps: dict[int, list[int]] = {}
    for n, c in got.items():
        comps.setdefault(c, []).append(n)
    for c, members in comps.items():
        assert c == min(members)


def test_read_webtext_adapter(spark, tmp_path):
    """Input adapter: path and catalog-table forms, schema validation,
    binary html -> string normalization (BASELINE input_hint shape)."""
    import datetime

    from lucene_spark.io import read_webtext

    rows = [
        ("http://a", datetime.datetime(2026, 1, 1), b"<p>hi</p>", "hi", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    p = str(tmp_path / "webtext.parquet")
    df.write.parquet(p)
    got = read_webtext(spark, p)
    assert dict(got.dtypes)["html"] == "string"
    assert got.collect()[0]["html"] == "<p>hi</p>"
    # catalog-table form
    df.createOrReplaceTempView("webtext_tmp")
    got2 = read_webtext(spark, "webtext_tmp")
    assert got2.count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="required columns"):
        read_webtext(spark, p, require=("url", "nope"))


def test_term_in_filter_escapes(spark):
    # multi-field \x1f keys, quotes, backslashes and plain terms all
    # resolve through the single parsed SQL IN expression
    from lucene_spark.index.reader import term_in_filter

    rows = [("body\x1fhello",), ("plain",), ("a'b\\c",), ("miss",)]
    df = spark.createDataFrame(rows, "term string")
    got = sorted(
        r["term"] for r in df.filter(
            term_in_filter("term", ["body\x1fhello", "plain", "a'b\\c"])
        ).collect()
    )
    assert got == sorted(["body\x1fhello", "plain", "a'b\\c"])
