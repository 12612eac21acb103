"""PII scrubbing and Gopher-style repetition filters: hand-computed
values plus Spark-vs-DuckDB regex agreement on adversarial strings (the
gate verifies the full corpus; these pin the edge semantics)."""

import duckdb
import pytest

from lucene_spark.pipeline.scrub import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_scrub,
    scrubbed_text,
)
from lucene_spark.pipeline.textstats import repetition_stats

ROWS = [
    (0, "write to bob.smith+x@sub.example.org or alice@ex.io today"),
    (1, "server at 10.0.0.1 and 192.168.255.3, call +1 (555) 010-7788"),
    (2, "no pii here at all"),
    (3, "ver 1.2.3.4.5 chain"),  # \b makes the first 4 octets match
    (4, "id 12345678 plain digit run"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r["doc_id"]: r for r in scrubbed_text(df).collect()}


def test_email_detection_and_redaction(scrubbed):
    r = scrubbed[0]
    assert r["n_emails"] == 2 and r["n_ipv4"] == 0 and r["n_phones"] == 0
    assert r["clean_text"] == "write to <email> or <email> today"


def test_ip_and_phone(scrubbed):
    r = scrubbed[1]
    assert r["n_emails"] == 0 and r["n_ipv4"] == 2 and r["n_phones"] == 1
    assert r["clean_text"] == "server at <ip> and <ip>, call <phone>"


def test_clean_doc_passthrough(scrubbed):
    r = scrubbed[2]
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (0, 0, 0)
    assert r["clean_text"] == ROWS[2][1]


def test_digit_run_is_phone_not_ip(scrubbed):
    # 8+ digit run with no separators still matches the phone pattern
    r = scrubbed[4]
    assert r["n_ipv4"] == 0 and r["n_phones"] == 1


def test_spark_matches_duckdb_on_adversarial_strings(spark):
    """The scale contract: Java regex (Spark) and RE2 (DuckDB) must agree
    on every pattern for strings built to probe the differences."""
    adversarial = [
        "a@b.co x@y.z",  # 1-char TLD rejected
        "trailing dot a@b.com.",
        "999.999.999.999 still shape-matches",
        "1.2.3.4.5.6",
        "+((  ))1234567 weird but anchored on digits",
        "-123 456 7890-",
        "nested a.b-c_d%e+f@g-h.ij",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(adversarial)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(adversarial):
        em, ip, c2, = con.execute(
            f"SELECT len(regexp_extract_all(?, '{EMAIL_RE}')),"
            f" len(regexp_extract_all(?, '{IPV4_RE}')),"
            f" regexp_replace(regexp_replace(?, '{EMAIL_RE}', '<email>', 'g'),"
            f" '{IPV4_RE}', '<ip>', 'g')",
            [t, t, t],
        ).fetchone()
        ph, md = con.execute(
            f"SELECT len(regexp_extract_all(?, '{PHONE_RE}')),"
            f" md5(regexp_replace(?, '{PHONE_RE}', '<phone>', 'g'))",
            [c2, c2],
        ).fetchone()
        r = got[i]
        assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (em, ip, ph), t
        assert r["clean_md5"] == md, t


def test_repetition_hand_values(spark):
    rows = [
        # 6 tokens: top word 'a'x3 (3/6), top bigram 'a b'x2 (2/5),
        # trigrams: [a b a, b a b, a b a, b a c] -> 'a b a'x2 dup -> 2/4
        (0, "a b a b a c"),
        (1, "x"),          # 1 token: bigram/trigram fracs NULL
        (2, "x y"),        # 2 tokens: trigram frac NULL
        (3, "w w w w"),    # all same: 4/4, 3/3, 2/2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["n_tokens"] == 6
    assert got[0]["frac_top_word"] == 0.5
    assert got[0]["frac_top_bigram"] == 0.4
    assert got[0]["frac_dup_trigrams"] == 0.5
    assert got[1]["frac_top_word"] == 1.0
    assert got[1]["frac_top_bigram"] is None
    assert got[1]["frac_dup_trigrams"] is None
    assert got[2]["frac_top_bigram"] == 1.0
    assert got[2]["frac_dup_trigrams"] is None
    assert got[3]["frac_top_word"] == 1.0
    assert got[3]["frac_top_bigram"] == 1.0
    assert got[3]["frac_dup_trigrams"] == 1.0
