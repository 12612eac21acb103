"""Web link graph + anchor text — the webtext signals a crawl-scale search
or training-data pipeline derives from raw HTML.

Not a Lucene operator: this is the corpus-construction side the reference
leaves to the user (its benchmark content sources consume pre-extracted
docs). Three classic operations, each a standard web-search building block:

- ``extract_links``: (src_url, dst_url, anchor_text) edges parsed from the
  raw HTML with the same html.parser machinery as the extraction chain
  (analysis/html_extract.py); relative hrefs resolve against the page url
  (RFC 3986 join via urllib.parse.urljoin), javascript:/mailto:/fragment
  hrefs drop, anchor text is whitespace-collapsed. Map-only Arrow batches
  — at 100 TB this is one pass over the html column, no shuffle.
- ``host_graph``: (src_host, dst_host, n_links) rollup — ONE map-side-
  combinable groupBy; the host-level degree distribution that feeds crawl
  prioritization and spam heuristics.
- ``anchor_documents``: per target url, every incoming anchor text merged
  into one synthetic document (order-normalized) — the classic anchor
  field (Brin & Page 1998 §2.2): index it with ``build_index`` and
  queries match pages by what OTHER pages call them. One groupBy on
  dst_url; anchor strings are tiny, so the shuffle carries a few bytes
  per edge.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urljoin, urlparse

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_links", "host_graph", "anchor_documents"]

_DROP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


class _AnchorParser(HTMLParser):
    """Collects (href, anchor_text) for every <a href=...>...</a>; nested
    anchors are not re-opened (the outermost wins, like browsers)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a" and self._href is None:
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href:
                self._href = href
                self._buf = []

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            text = " ".join("".join(self._buf).split())
            self.links.append((self._href, text))
            self._href = None
            self._buf = []


def _parse_links(src_url: str, html: str | bytes) -> list[tuple[str, str]]:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", "replace")
    p = _AnchorParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # truncated/mangled markup keeps whatever parsed so far
    out = []
    for href, text in p.links:
        h = href.strip()
        if not h or h.startswith("#"):
            continue
        if h.lower().startswith(_DROP_SCHEMES):
            continue
        out.append((urljoin(src_url or "", h), text))
    return out


def extract_links(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url, anchor) edge per <a href> in each page."""
    schema = "src_url string, dst_url string, anchor string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                for dst, text in _parse_links(u, h):
                    rows.append((u, dst, text))
            yield pd.DataFrame(
                rows, columns=["src_url", "dst_url", "anchor"]
            )

    return docs.select(url_col, html_col).mapInPandas(run, schema)


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — host-level edge weights."""
    host = lambda c: F.parse_url(F.col(c), F.lit("HOST"))  # noqa: E731
    return (
        links.select(
            host("src_url").alias("src_host"), host("dst_url").alias("dst_host")
        )
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def anchor_documents(links: DataFrame, min_len: int = 1) -> DataFrame:
    """One synthetic (url, text) doc per link TARGET: all incoming anchor
    texts, sorted for determinism, joined by spaces — ready for
    ``build_index`` as the anchor field."""
    return (
        links.filter(F.length(F.trim("anchor")) >= min_len)
        .groupBy(F.col("dst_url").alias("url"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.trim("anchor"))), " "
            ).alias("text")
        )
    )
