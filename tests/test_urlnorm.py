"""canonical_url edge cases vs expected strings."""

from lucene_spark.pipeline.urlnorm import canonicalize_urls, url_dup_groups


CASES = [
    (0, "HTTP://Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
        "http://example.com/a/b?a=2&z=1"),
    (1, "https://example.com:8443/a", "https://example.com:8443/a"),  # non-default port kept
    (2, "https://example.com:443/", "https://example.com"),           # default port + bare slash
    (3, "http://example.com/x?fbclid=abc&gclid=1", "http://example.com/x"),
    (4, "http://example.com/x?", "http://example.com/x"),             # empty query
    (5, "http://example.com", "http://example.com"),                  # no path at all
    (6, "http://example.com/a//", "http://example.com/a"),            # multi trailing slash
    (7, "http://example.com/a?b=2&a=1&b=1", "http://example.com/a?a=1&b=1&b=2"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in CASES], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["canon_url"] for r in canonicalize_urls(df).collect()
    }
    for i, _, want in CASES:
        assert got[i] == want, (i, got[i], want)


def test_url_dup_groups(spark):
    df = spark.createDataFrame(
        [
            (0, "HTTPS://A.com/x?utm_source=1"),
            (1, "https://a.COM:443/x/"),
            (2, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    rows = url_dup_groups(df).collect()
    assert len(rows) == 1
    assert rows[0]["canon_url"] == "https://a.com/x"
    assert rows[0]["n_docs"] == 2 and rows[0]["keep_id"] == 0
