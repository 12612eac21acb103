"""Miscellaneous/pattern token filters (analysis/filters.py)."""

import pytest

from lucene_spark.analysis.custom import custom_analyze_fn
from lucene_spark.analysis.filters import (
    fingerprint_filter,
    keep_word,
    length_filter,
    limit_token_count,
    pattern_capture,
    pattern_replace,
    register_filter_analyzer,
    scandinavian_fold_term,
    scandinavian_normalize_term,
    truncate_filter,
)
from lucene_spark.analysis.tokenizer import analyze


def run_chain(name, text, stopwords=None):
    fn = custom_analyze_fn(name)
    return [(t.term, t.position) for t in fn(text, stopwords)]


def test_keep_word_leaves_position_gaps():
    register_filter_analyzer("t_keep", term_filters=[keep_word({"alpha", "beta"})])
    assert run_chain("t_keep", "alpha junk beta junk alpha") == [
        ("alpha", 0), ("beta", 2), ("alpha", 4),
    ]


def test_length_and_truncate():
    register_filter_analyzer(
        "t_len", term_filters=[length_filter(3, 6), truncate_filter(4)]
    )
    assert run_chain("t_len", "ab abcd abcdefg abcdef") == [
        ("abcd", 1), ("abcd", 3),
    ]


def test_pattern_replace():
    register_filter_analyzer(
        "t_pr", term_filters=[pattern_replace(r"0+$", "")]
    )
    assert run_chain("t_pr", "data000 d0ta data") == [
        ("data", 0), ("d0ta", 1), ("data", 2),
    ]
    first_only = pattern_replace(r"o", "0", replace_all=False)
    assert first_only("foo") == "f0o"


def test_scandinavian_folding():
    # ScandinavianFoldingFilter javadoc examples: blåbærsyltetøj ->
    # blabarsyltetoj, räksmörgås -> raksmorgas
    assert scandinavian_fold_term("blåbærsyltetøj") == "blabarsyltetoj"
    assert scandinavian_fold_term("räksmörgås") == "raksmorgas"
    assert scandinavian_fold_term("bruksanvisning") == "bruksanvisning"
    assert scandinavian_fold_term("aal") == "al"
    assert scandinavian_fold_term("aoo") == "ao"  # squeeze then plain o


def test_scandinavian_normalization():
    # ScandinavianNormalizationFilter javadoc: blåbærsyltetøj ==
    # blåbärsyltetöj == blaabaarsyltetoej
    a = "blåbærsyltetøj"
    for v in ("blåbärsyltetöj", "blaabaersyltetoej", "blåbærsyltetøj"):
        assert scandinavian_normalize_term(v) == a, v
    assert scandinavian_normalize_term("aal") == "ål"
    assert scandinavian_normalize_term("oo") == "ø"


def test_limit_token_count():
    register_filter_analyzer("t_lim", stream_filters=[limit_token_count(3)])
    assert run_chain("t_lim", "a b c d e") == [("a", 0), ("b", 1), ("c", 2)]


def test_fingerprint():
    register_filter_analyzer("t_fp", stream_filters=[fingerprint_filter()])
    assert run_chain("t_fp", "the quick the fox quick") == [
        ("fox quick the", 0)
    ]
    register_filter_analyzer(
        "t_fp2", stream_filters=[fingerprint_filter(max_output_token_size=5)]
    )
    assert run_chain("t_fp2", "the quick fox") == []
    assert run_chain("t_fp", "") == []


def test_pattern_capture_replaces_first_and_stacks():
    # no preserve: first capture replaces the original, rest stack at the
    # same position
    register_filter_analyzer(
        "t_cap",
        stream_filters=[pattern_capture([r"([a-z]+)(\d+)"])],
        distinct_positions=True,
    )
    assert run_chain("t_cap", "abc123 plain") == [
        ("abc", 0), ("123", 0), ("plain", 1),
    ]


def test_pattern_capture_preserve_original():
    register_filter_analyzer(
        "t_cap2",
        stream_filters=[pattern_capture([r"(\d+)"], preserve_original=True)],
        distinct_positions=True,
    )
    assert run_chain("t_cap2", "abc123x45") == [
        ("abc123x45", 0), ("123", 0), ("45", 0),
    ]
    # whole-token capture is skipped when preserving (no duplicate)
    register_filter_analyzer(
        "t_cap3",
        stream_filters=[pattern_capture([r"(.+)"], preserve_original=True)],
        distinct_positions=True,
    )
    assert run_chain("t_cap3", "abc") == [("abc", 0)]


def test_pattern_capture_multi_pattern_min_start_order():
    register_filter_analyzer(
        "t_cap4",
        stream_filters=[
            pattern_capture([r"x(\d)", r"(q+)"], preserve_original=True)
        ],
        distinct_positions=True,
    )
    # captures enumerate by ascending start offset across patterns
    assert run_chain("t_cap4", "qqx7") == [("qqx7", 0), ("qq", 0), ("7", 0)]


def test_stream_chain_composition_order():
    register_filter_analyzer(
        "t_comp",
        term_filters=[truncate_filter(3)],
        stream_filters=[limit_token_count(2), fingerprint_filter("_")],
    )
    assert run_chain("t_comp", "zebra apple mango") == [("app_zeb", 0)]


def test_batch_lane_token_analyzer():
    from lucene_spark.analysis.vectorized import analyze_batch

    register_filter_analyzer("t_fp", stream_filters=[fingerprint_filter()])
    texts = ["the quick the fox", "b a", None]
    bt = analyze_batch(texts, stopwords=None, analyzer="t_fp")
    got = sorted(
        (int(d), int(p), bt.uniques[c])
        for d, p, c in zip(bt.docids, bt.positions, bt.codes)
    )
    assert got == [(0, 0, "fox quick the"), (1, 0, "a b")]
    assert list(bt.doc_lens) == [1, 1, 0]


def test_dictionary_compound_decomposes():
    from lucene_spark.analysis.filters import dictionary_compound

    register_filter_analyzer(
        "t_cmp",
        stream_filters=[
            dictionary_compound(["data", "stream", "soft", "ware"])
        ],
        distinct_positions=True,
    )
    # original kept first, subwords stacked at the same position
    assert run_chain("t_cmp", "datastream plain software") == [
        ("datastream", 0), ("data", 0), ("stream", 0),
        ("plain", 1),
        ("software", 2), ("soft", 2), ("ware", 2),
    ]


def test_dictionary_compound_min_word_and_longest():
    from lucene_spark.analysis.filters import dictionary_compound

    # below minWordSize: no decomposition (original passes through)
    register_filter_analyzer(
        "t_cmp2",
        stream_filters=[
            dictionary_compound(["da", "ta"], min_word_size=5)
        ],
        distinct_positions=True,
    )
    assert run_chain("t_cmp2", "data") == [("data", 0)]
    # only_longest_match keeps the longest dictionary hit per start
    register_filter_analyzer(
        "t_cmp3",
        stream_filters=[
            dictionary_compound(
                ["soft", "software", "ware"], only_longest_match=True
            )
        ],
        distinct_positions=True,
    )
    assert run_chain("t_cmp3", "softwareupdate") == [
        ("softwareupdate", 0), ("software", 0), ("ware", 0),
    ]


def test_reverse_string_and_leading_wildcard_shape():
    from lucene_spark.analysis.filters import register_filter_analyzer, reverse_string

    assert reverse_string("country") == "yrtnuoc"
    register_filter_analyzer("t_rev", term_filters=[reverse_string])
    assert run_chain("t_rev", "country road") == [
        ("yrtnuoc", 0), ("daor", 1),
    ]


def test_mapping_char_filter():
    from lucene_spark.analysis.filters import (
        mapping_char_filter,
        register_filter_analyzer,
    )

    m = mapping_char_filter({"ph": "f", "qu": "kw"})
    assert m("phone quiz") == "fone kwiz"
    # greedy longest match wins
    m2 = mapping_char_filter({"a": "x", "aa": "y"})
    assert m2("aaa") == "yx"
    register_filter_analyzer(
        "t_map", char_filters=[mapping_char_filter({"ph": "f"})]
    )
    # char filters run on the RAW text (before lowercasing), like the
    # reference's CharFilter-before-Tokenizer composition — mappings are
    # case-sensitive
    assert run_chain("t_map", "phone Foto") == [("fone", 0), ("foto", 1)]
    assert run_chain("t_map", "Phone") == [("phone", 0)]
