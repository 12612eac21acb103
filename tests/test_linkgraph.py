"""Link graph + anchor text pipeline (pipeline/linkgraph.py). The DuckDB
oracle gate rows (link_graph_hosts, anchor_docs) live in test_gate.py."""

import pytest

from lucene_spark.pipeline.linkgraph import (
    _parse_links,
    anchor_documents,
    extract_links,
    host_graph,
)


def test_parse_links_resolution_and_filters():
    html = (
        '<html><body>'
        '<a href="https://other.example/x">Abs <b>Link</b></a>'
        '<a href="/rel/path">relative</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#frag">frag</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="y.html">sibling</a>'
        "</body></html>"
    )
    got = _parse_links("https://host.example/dir/page.html", html)
    assert got == [
        ("https://other.example/x", "Abs Link"),
        ("https://host.example/rel/path", "relative"),
        ("https://host.example/dir/y.html", "sibling"),
    ]


def test_parse_links_bytes_and_malformed():
    # bytes input + unclosed anchor: no crash, parsed prefix kept
    got = _parse_links(
        "https://h.example/", b'<a href="/a">one</a><a href="/b">two'
    )
    assert ("https://h.example/a", "one") in got


def test_parse_links_whitespace_collapse():
    got = _parse_links(
        "https://h.example/", '<a href="/a">  lots \n of   space </a>'
    )
    assert got == [("https://h.example/a", "lots of space")]


@pytest.fixture(scope="module")
def links(spark):
    rows = [
        (
            "https://a.example/p/1",
            '<a href="https://b.example/x">alpha beta</a>'
            '<a href="/local">home</a>',
        ),
        (
            "https://a.example/p/2",
            '<a href="https://b.example/x">gamma</a>',
        ),
    ]
    docs = spark.createDataFrame(rows, "url string, html string")
    return extract_links(docs)


def test_extract_and_host_graph(spark, links):
    hg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert hg == {
        ("a.example", "b.example"): 2,
        ("a.example", "a.example"): 1,
    }


def test_anchor_documents_and_search(spark, links, tmp_path):
    docs = {r["url"]: r["text"] for r in anchor_documents(links).collect()}
    # two incoming anchors on the shared target, sorted then joined
    assert docs["https://b.example/x"] == "alpha beta gamma"
    assert docs["https://a.example/local"] == "home"
    # the anchor corpus is a first-class index input: search by what
    # OTHER pages call a url
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import Searcher

    d = str(tmp_path / "anchoridx")
    build_index(
        spark, anchor_documents(links), d, num_segments=1, analyzer="simple"
    )
    s = Searcher(spark, d, analyzer="simple")
    hits = s.search("gamma", k=5, with_url=True).collect()
    assert [r["url"] for r in hits] == ["https://b.example/x"]
