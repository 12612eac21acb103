"""HTML extraction golden tests + fixture byte-identity (FIXTURES.md §3.1)."""

from lucene_spark.analysis.html_extract import extract_text, parse_html
from lucene_spark.fixtures import generate_webtext


def test_block_elements_emit_newline_at_end():
    assert extract_text("<body><p>a</p><div>b</div>c</body>") == "a\nb\nc"
    assert extract_text("<body><ul><li>x</li><li>y</li></ul></body>") == "x\ny\n\n"


def test_script_and_style_suppressed():
    html = "<body>a<script>var x=1;</script>b<style>.c{}</style>c</body>"
    assert extract_text(html) == "abc"


def test_img_alt():
    assert extract_text('<body>a <img alt="pic"> b</body>') == "a [pic] b"
    assert extract_text("<body>a <img src='x'> b</body>") == "a  b"


def test_br_hr():
    assert extract_text("<body>a<br>b<hr>c</body>") == "a\nb\nc"


def test_title_trimmed_and_meta_props():
    title, _, props = parse_html(
        '<html><head><title>  T  </title><meta name="a" content="1">'
        '<meta http-equiv="refresh" content="2"></head><body>x</body></html>'
    )
    assert title == "T"
    assert props == {"a": "1", "refresh": "2"}


def test_outside_body_ignored():
    assert extract_text("<html><head>junk</head><body>x</body>tail</html>") == "x"


def test_entities():
    assert extract_text("<body>a &amp; b &lt;c&gt;</body>") == "a & b <c>"


def test_fixture_byte_identity():
    """The per-row invariant: extract_text(html) == text for every url."""
    for row in generate_webtext(300, seed=42):
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_fixture_deterministic():
    a = generate_webtext(50, seed=7)
    b = generate_webtext(50, seed=7)
    assert a == b
    c = generate_webtext(50, seed=8)
    assert a != c
