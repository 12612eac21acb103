"""HTML -> text extraction with the reference benchmark parser's rules.

Behavioral reference: lucene/benchmark/src/java/org/apache/lucene/benchmark/
byTask/feeds/DemoHTMLParser.java:36-180 —

- collect character data inside <body> only;
- suppress the contents of <style> and <script> (:179);
- emit '\\n' at the END of block elements (ENDLINE_ELEMENTS, :147-176):
  p h1..h6 div ul ol dl pre hr blockquote address fieldset table form
  noscript li dt dd noframes br tr select option;
- <img alt="x"> appends "[x]" to the body text (:82-90);
- title is the trimmed <title> character data (:141);
- <meta name|http-equiv content=...> captured as properties (:69-77).

Implemented from scratch on Python's stdlib HTMLParser.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["extract_text", "parse_html"]

ENDLINE_ELEMENTS = frozenset(
    """p h1 h2 h3 h4 h5 h6 div ul ol dl pre hr blockquote address fieldset
    table form noscript li dt dd noframes br tr select option""".split()
)

_SUPPRESS = frozenset({"style", "script"})


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.body_parts: list[str] = []
        self.title_parts: list[str] = []
        self.props: dict[str, str] = {}
        self.in_body = False
        self.in_title = False
        self.suppress_depth = 0

    def _on_tag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "body":
            self.in_body = True
        elif tag == "title":
            self.in_title = True
        elif tag == "meta":
            a = dict(attrs)
            name = a.get("name") or a.get("http-equiv")
            content = a.get("content")
            if name is not None and content is not None:
                self.props[name.lower()] = content
        elif tag == "img" and self.in_body and self.suppress_depth == 0:
            alt = dict(attrs).get("alt")
            if alt:
                self.body_parts.append(f"[{alt}]")

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in _SUPPRESS:
            self.suppress_depth += 1
        self._on_tag(tag, attrs)
        # void elements that never get an endtag still end the line
        if tag in ("br", "hr") and self.in_body:
            self.body_parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._on_tag(tag, attrs)
        if tag in ENDLINE_ELEMENTS and self.in_body:
            self.body_parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _SUPPRESS:
            self.suppress_depth = max(0, self.suppress_depth - 1)
        elif tag == "body":
            self.in_body = False
        elif tag == "title":
            self.in_title = False
        if tag in ENDLINE_ELEMENTS and tag not in ("br", "hr") and self.in_body:
            self.body_parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self.suppress_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
        elif self.in_body:
            self.body_parts.append(data)


def parse_html(html: str | bytes) -> tuple[str, str, dict[str, str]]:
    """Returns (title, body_text, meta_properties)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return "".join(p.title_parts).strip(), "".join(p.body_parts), p.props


def extract_text(html: str | bytes) -> str:
    """Body text per the DemoHTMLParser rules (the per-row invariant surface:
    byte-identical extracted text per url)."""
    return parse_html(html)[1]
