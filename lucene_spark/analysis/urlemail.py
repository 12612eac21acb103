"""UAX29URLEmailTokenizer analog — URLs and emails as single tokens.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
email/UAX29URLEmailTokenizer.java:38 ("splits words... URLs and email
addresses are also tokenized according to the relevant RFCs") — its JFlex
grammar (UAX29URLEmailTokenizerImpl.jflex) layers RFC 3986 URL and RFC
5321/5322 email productions over the UAX#29 word-break rules, emitting
<URL> / <EMAIL> token types.

Subset implemented here (documented, deterministic, oracle-reproducible):

- URL: an explicit ``http://`` / ``https://`` / ``ftp://`` scheme, or a
  scheme-less ``www.``-prefixed authority, followed by RFC 3986-ish
  characters up to whitespace or ``< > "``; trailing sentence punctuation
  ``.,;:!?')`` is not part of the URL (the JFlex grammar encodes the
  precise RFC productions; the strip is this subset's stand-in).
- EMAIL: dot-separated RFC 5322 ``atext`` local part ``@`` LDH domain
  labels with a >= 2-letter alphabetic top label.

Text outside recognized spans tokenizes through the standard UAX#29 chain
(tokenizer.py); a recognized span occupies exactly ONE position. The
analyzer composition (UAX29URLEmailAnalyzer.java:49-58) lowercases every
token — including URLs/emails — then stop-filters.
"""

from __future__ import annotations

import re

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, _lowercase, tokenize

__all__ = [
    "TYPE_URL",
    "TYPE_EMAIL",
    "url_email_tokenize",
    "url_email_analyze",
]

TYPE_URL = "<URL>"
TYPE_EMAIL = "<EMAIL>"

_ATEXT = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]"
_URL_PART = r"(?:(?:https?|ftp)://|www\.)[^\s<>\"]+"
_EMAIL_PART = (
    rf"{_ATEXT}+(?:\.{_ATEXT}+)*"
    r"@(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}"
)
# scheme/www matching is case-insensitive (the JFlex grammar spells the
# scheme productions with per-letter [hH][tT]... classes)
_SPAN_RE = re.compile(
    rf"(?P<url>{_URL_PART})|(?P<email>{_EMAIL_PART})", re.IGNORECASE
)
_TRAIL_PUNCT = ".,;:!?')"


def url_email_tokenize(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[Token]:
    """URL/email spans as single <URL>/<EMAIL> tokens; everything between
    them through the standard UAX#29 tokenizer. Over-long spans are
    skipped but still advance the position (StandardTokenizer's
    maxTokenLength contract)."""
    if not text:
        return []
    out: list[Token] = []
    pos = -1
    skipped = 0
    last = 0

    def emit_plain(lo: int, hi: int) -> None:
        nonlocal pos, skipped
        if hi <= lo:
            return
        prev_inner = -1
        for t in tokenize(text[lo:hi], max_token_length):
            pos += t.position - prev_inner + skipped
            skipped = 0
            prev_inner = t.position
            out.append(Token(t.term, pos, lo + t.start, lo + t.end, t.type))

    prefix_re = re.compile(r"^(?:https?://|ftp://|www\.)", re.IGNORECASE)
    for m in _SPAN_RE.finditer(text):
        seg = m.group().rstrip(_TRAIL_PUNCT)
        if m.lastgroup == "url":
            p = prefix_re.match(seg)
            if p is None or len(seg) == p.end():
                continue  # bare scheme/prefix after the strip: not a URL
        emit_plain(last, m.start())
        last = m.start() + len(seg)
        if len(seg) > max_token_length:
            skipped += 1
            continue
        pos += 1 + skipped
        skipped = 0
        ttype = TYPE_URL if m.lastgroup == "url" else TYPE_EMAIL
        out.append(Token(seg, pos, m.start(), last, ttype))
    emit_plain(last, len(text))
    return out


def url_email_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
) -> tuple[list[str], list[int]]:
    toks = url_email_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


def url_email_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """Tokenize -> lowercase (URLs/emails included, per the reference
    analyzer's LowerCaseFilter over the whole stream) -> stop filter."""
    out: list[Token] = []
    for t in url_email_tokenize(text, max_token_length):
        term = _lowercase(t.term)
        if stopwords and term in stopwords:
            continue
        out.append(Token(term, t.position, t.start, t.end, t.type))
    return out
