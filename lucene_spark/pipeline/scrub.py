"""PII scrubbing for training-data pipelines: detect and redact emails,
IPv4 addresses, and phone-like digit runs before pretraining. Map-only JVM
regex (no UDF, no shuffle) — scale-safe at 100 TB.

Patterns are deliberately restricted to constructs RE2 (DuckDB) and Java
regex (Spark) evaluate identically — no lookarounds, no backreferences,
explicit character classes — so the oracle gate is exact. Replacement is
ordered email -> ipv4 -> phone; the replacement tokens contain no digits,
so a later pattern can never match inside an earlier redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pii_scrub", "EMAIL_RE", "IPV4_RE", "PHONE_RE"]

EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# international-ish digit run: 8+ total digits with separators, anchored on
# digits at both ends (kept deliberately simple and lookaround-free)
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones, clean_md5): per-doc PII match
    counts (pre-redaction) and the md5 of the redacted text (emails ->
    <email>, IPv4 -> <ip>, phone runs -> <phone>). The md5 stands in for
    the full redacted text in the oracle compare; callers wanting the text
    use ``scrubbed_text``."""
    s = scrubbed_text(docs, id_col=id_col)
    return s.select(
        id_col,
        "n_emails",
        "n_ipv4",
        "n_phones",
        F.md5("clean_text").alias("clean_md5"),
    )


def scrubbed_text(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones, clean_text) — the redaction
    itself; see pii_scrub."""
    t = F.col("text")
    n_em = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
    clean1 = F.regexp_replace(t, EMAIL_RE, "<email>")
    clean2 = F.regexp_replace(clean1, IPV4_RE, "<ip>")
    # phones counted AFTER email/ip redaction so an IP's digit run is not
    # double-counted as a phone (redaction tokens contain no digits)
    n_ph = F.size(F.regexp_extract_all(clean2, F.lit(PHONE_RE), F.lit(0)))
    clean3 = F.regexp_replace(clean2, PHONE_RE, "<phone>")
    return docs.select(
        id_col,
        n_em.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4"),
        n_ph.cast("long").alias("n_phones"),
        clean3.alias("clean_text"),
    )


def c4_line_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning...", §2.2 — the public C4 recipe):

    - keep only lines ending in a terminal punctuation mark (period,
      exclamation mark, question mark, end quotation mark)
    - keep only lines with at least 3 words
    - drop any line containing the word "javascript" (case-insensitive)
    - drop the whole page when it has fewer than 5 sentences after
      cleaning, contains "lorem ipsum" (case-insensitive), or contains a
      curly bracket

    Output: (id, kept, n_lines_kept, n_sentences, clean_len, clean_md5).
    Map-only JVM built-ins (split → higher-order filter → array_join +
    regexp_count) — no UDF, no shuffle; every regex is RE2/Java-identical
    so the DuckDB oracle is exact. Sentence count approximates the paper's
    splitter as the count of terminal .!? characters in the cleaned text."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept_lines = F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= 3)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept_lines, "\n")
    n_sent = F.regexp_count(clean, F.lit("[.!?]"))
    kept = (
        (n_sent >= 5)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return docs.select(
        F.col(id_col),
        kept.cast("int").alias("kept"),
        F.size(kept_lines).alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
