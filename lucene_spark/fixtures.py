"""Deterministic synthetic webtext corpus + reference query set (FIXTURES.md).

Everything derives from a single integer seed. Each row matches the
BASELINE.json input_hint schema:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

``html`` wraps the body tokens in block elements, a suppressed <script>
section and an <img alt=...>; ``text`` is the expected DemoHTMLParser-rule
extraction, constructed independently of the extractor so that
``extract_text(html) == text`` is a real byte-identity test.

Body text is Zipfian over a 10k-term vocabulary with 33 canonical stopwords
injected at high frequency (hot-term skew), plus a fixed set of edge-case
documents exercising tokenizer corners.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
STOPWORDS_33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

EDGE_CASE_BODIES = [
    "FooBAR MixedCase camelCase",
    "3.14 top-100 1,024 0x1F v2.0",
    "O'Neil's don't can't won't",
    ("z" * 300) + " visible after longtoken",
    "日本語のテスト ひらがな カタカナ",
    "emoji 🙂 test 🇺🇸 flags 👩‍🔬 zwj",
    "",  # empty body
    "the and of to in is it for",  # stopword-only body
]


def _vocab_term(i: int) -> str:
    return f"w{i:04d}"


def zipf_probs(n: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


def generate_webtext(
    n_docs: int, seed: int = 42, stopword_rate: float = 0.25, start_id: int = 0
) -> "list[dict]":
    """Generate n_docs rows (list of dicts) deterministically from seed.

    ``start_id`` offsets the absolute doc index so large corpora can be
    generated in parallel chunks (chunk k: start_id=k*chunk, seed=seed+k)
    with globally unique urls; edge-case docs appear only in the id range
    [0, len(EDGE_CASE_BODIES)).
    """
    rng = np.random.default_rng(seed)
    probs = zipf_probs()
    base_ts = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    langs = ["de", "fr", "ja"]
    rows: list[dict] = []
    for j in range(n_docs):
        i = start_id + j
        if i < len(EDGE_CASE_BODIES):
            body_tokens = EDGE_CASE_BODIES[i].split(" ") if EDGE_CASE_BODIES[i] else []
        else:
            n_tok = int(rng.integers(5, 301))
            terms = rng.choice(VOCAB_SIZE, size=n_tok, p=probs)
            body_tokens = [_vocab_term(t) for t in terms]
            # inject stopwords at high frequency -> hot-term skew
            n_stop = int(stopword_rate * n_tok)
            stop_pos = rng.integers(0, max(n_tok, 1), size=n_stop)
            stops = rng.choice(len(STOPWORDS_33), size=n_stop)
            for p, s in zip(stop_pos, stops):
                body_tokens[int(p)] = STOPWORDS_33[int(s)]
        url = f"https://site{i % 1000}.example/page/{i}"
        lang = "en" if (i % 20) < 19 else langs[i % len(langs)]
        html, text = _render_html(i, body_tokens)
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + _dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
    return rows


def _render_html(i: int, body_tokens: list[str]) -> tuple[str, str]:
    """Wrap tokens into HTML exercising the DemoHTMLParser rules, and build
    the expected extracted text for it (independently of the extractor)."""
    # split tokens into: first paragraph, a div, a list item, trailing text
    q = max(len(body_tokens) // 4, 1)
    p1, p2, p3, p4 = (
        body_tokens[:q],
        body_tokens[q : 2 * q],
        body_tokens[2 * q : 3 * q],
        body_tokens[3 * q :],
    )
    alt = f"altword{i}"
    html = (
        f"<html><head><title>T{i}</title>"
        f'<meta name="k{i % 7}" content="v{i}">'
        f"</head><body>"
        f"<p>{' '.join(p1)}</p>"
        f"<script>junk(); var x = 'suppressed';</script>"
        f"<style>.c {{ color: red }}</style>"
        f"<div>{' '.join(p2)}</div>"
        f"<ul><li>{' '.join(p3)}</li></ul>"
        f'<img alt="{alt}">'
        f"{' '.join(p4)}"
        f"</body></html>"
    )
    text = (
        f"{' '.join(p1)}\n"  # </p>
        f"{' '.join(p2)}\n"  # </div>
        f"{' '.join(p3)}\n\n"  # </li></ul>... (ul not ENDLINE? it IS: ul in list)
        f"[{alt}]"
        f"{' '.join(p4)}"
    )
    return html, text


# --- reference query set (FIXTURES.md §2) -----------------------------------

def reference_queries() -> list[tuple[str, str]]:
    """(query_id, query_string) modeled on benchmark/conf/query-terms.txt.

    Hot = Zipf head (w0000..), mid = w0100.., rare = deep tail. Grammar:
    terms, AND, OR, NOT, parens. k=10 everywhere.
    """
    hot = ["w0000", "w0001", "w0002", "w0004"]
    mid = ["w0100", "w0203", "w0350", "w0777"]
    rare = ["w8000", "w9100", "w9500", "w9999"]
    qs: list[tuple[str, str]] = []
    for j, t in enumerate(hot[:3] + mid[:3] + rare[:3] + ["the"]):
        qs.append((f"single_{j}", t))
    qs += [
        ("and_0", f"{hot[0]} AND {hot[1]}"),
        ("and_1", f"{hot[0]} AND {mid[0]}"),
        ("and_2", f"{hot[1]} AND {rare[0]}"),
        ("and_3", f"{mid[0]} AND {mid[1]} AND {hot[2]}"),
        ("and_4", f"{hot[2]} AND {hot[3]} AND {mid[2]}"),
        ("or_0", f"{hot[0]} OR {hot[1]}"),
        ("or_1", f"{mid[0]} OR {mid[1]}"),
        ("or_2", f"{rare[0]} OR {rare[1]}"),
        ("or_3", f"{hot[0]} OR {mid[1]} OR {rare[2]}"),
        ("or_4", f"{hot[1]} OR {hot[2]} OR {mid[2]} OR {mid[3]} OR {rare[3]}"),
        ("mixed_0", f"({hot[0]} OR {hot[1]}) AND {mid[0]}"),
        ("mixed_1", f"{hot[0]} AND NOT {hot[1]}"),
        ("mixed_2", f"({mid[0]} OR {rare[0]}) AND {hot[1]}"),
        ("phrase_0", f'"{hot[0]} {hot[1]}"'),
    ]
    return qs
