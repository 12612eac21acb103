"""Hunspell dictionary stemming: reference golden vectors (the
TestStemmer simple-dictionary behaviors), affix-rule feature coverage
(cross products, twofold suffixes, circumfix, NEEDAFFIX, case
variation, FLAG modes, AF aliases), the HunspellStemFilter token
contract, and an end-to-end indexed round-trip."""

import pytest

from lucene_spark.analysis.hunspell import (
    hunspell_stem_tokens,
    parse_dictionary,
    register_hunspell_analyzer,
)
from lucene_spark.analysis.tokenizer import tokenize

# The reference's simple test dictionary (hunspell/simple.aff|.dic in the
# Lucene test resources) — replayed as a behavioral spec: twofold suffix
# flag C, prefix B, multi-entry roots.
SIMPLE_AFF = """\
SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""

SIMPLE_DIC = """\
9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
db
"""


@pytest.fixture(scope="module")
def simple():
    return parse_dictionary(SIMPLE_AFF, SIMPLE_DIC)


# TestStemmer.java golden vectors (order-insensitive, multiset-equal)
@pytest.mark.parametrize(
    "word,stems",
    [
        ("ab", ["ab"]),
        ("abc", ["ab"]),
        ("apach", ["apach"]),
        ("apache", ["apach"]),
        ("foo", ["foo", "foo"]),  # two dictionary entries
        ("food", ["foo"]),
        ("foos", ["foo"]),
        ("lucen", ["lucen"]),
        ("lucene", ["lucen", "lucene"]),
        ("mahout", ["mahout"]),
        ("mahoute", ["mahout"]),
        ("moo", ["moo"]),
        ("mood", ["moo"]),
        ("olr", ["olr"]),
        ("solr", ["olr"]),
        # negatives
        ("abcd", []),
        ("abs", []),
        ("abe", []),
        ("sab", []),
        ("sapach", []),
        ("sapache", []),
        ("apachee", []),
        ("sfoo", []),
        ("sfoos", []),
        ("fooss", []),
        ("lucenee", []),
        ("solre", []),
        ("db", ["db"]),
    ],
)
def test_simple_golden(simple, word, stems):
    assert sorted(simple.stem(word)) == sorted(stems)


# Feature fixture: cross products, circumfix pairing, NEEDAFFIX,
# twofold suffixes, condition classes.
FEAT_AFF = """\
SET UTF-8
NEEDAFFIX z
CIRCUMFIX X

PFX P Y 1
PFX P 0 re/X .

PFX U Y 1
PFX U 0 un .

SFX S Y 3
SFX S y ies [^aeiou]y
SFX S 0 s [^sxy]
SFX S 0 es [sx]

SFX G Y 2
SFX G e ing e
SFX G 0 ing [^e]

SFX R Y 1
SFX R 0 ed/X .

SFX T Y 1
SFX T 0 ful/S .
"""

FEAT_DIC = """\
8
walk/SGUPR
try/S
bus/S
greet/zS
hope/T
bake/G
paris
London
"""


@pytest.fixture(scope="module")
def feat():
    return parse_dictionary(FEAT_AFF, FEAT_DIC)


def test_suffix_conditions(feat):
    assert feat.stem("walks") == ["walk"]
    assert feat.stem("tries") == ["try"]
    assert feat.stem("buses") == ["bus"]
    assert feat.stem("buss") == []  # [^sxy] condition rejects
    assert feat.stem("trys") == []  # y needs the ies rule
    assert feat.stem("walking") == ["walk"]
    assert feat.stem("baking") == ["bake"]  # strip e, add ing


def test_prefix_suffix_cross_product(feat):
    assert feat.stem("unwalking") == ["walk"]
    assert feat.stem("unwalk") == ["walk"]
    # root lacks the prefix flag
    assert feat.stem("untries") == []


def test_circumfix_pairing(feat):
    # re/X prefix pairs only with the ed/X suffix (both carry circumfix)
    assert feat.stem("rewalked") == ["walk"]
    assert feat.stem("rewalking") == []  # ing carries no circumfix flag
    assert feat.stem("walked") == []  # ed alone lacks its circumfix pair
    # prefix-alone with a direct root flag is accepted (Stemmer.java checks
    # circumfix pairing on the suffix side; real dictionaries route the
    # prefix flag through the suffix's continuation classes instead, as in
    # the reference circumfix.aff where only obb/AX grants the leg/X prefix)
    assert feat.stem("rewalk") == ["walk"]


def test_circumfix_reference_fixture():
    # The reference circumfix.aff/.dic (Hungarian superlative): the prefix
    # flag A reaches the root only through the obb/AX suffix continuation,
    # and the X circumfix flag must appear on BOTH sides.
    aff = (
        "SET UTF-8\n\nCIRCUMFIX X\n\n"
        "PFX A Y 1\nPFX A 0 leg/X .\n\n"
        "PFX B Y 1\nPFX B 0 legesleg/X .\n\n"
        "SFX C Y 3\n"
        "SFX C 0 obb . +COMPARATIVE\n"
        "SFX C 0 obb/AX . +SUPERLATIVE\n"
        "SFX C 0 obb/BX . +SUPERSUPERLATIVE\n"
    )
    d = parse_dictionary(aff, "1\nnagy/C\t[MN]\n")
    assert d.stem("nagy") == ["nagy"]
    assert d.stem("nagyobb") == ["nagy"]  # plain comparative suffix
    assert d.stem("legnagyobb") == ["nagy"]  # circumfix pair leg…obb
    assert d.stem("legeslegnagyobb") == ["nagy"]  # legesleg…obb pair
    assert d.stem("legnagy") == []  # prefix without its paired suffix
    assert d.stem("legeslegnagy") == []


def test_needaffix(feat):
    assert feat.stem("greet") == []  # pseudostem: requires an affix
    assert feat.stem("greets") == ["greet"]


def test_twofold_suffix(feat):
    # hope + ful (T, append carries /S) + s (S) strips back twice
    assert feat.stem("hopefuls") == ["hope"]
    assert feat.stem("hopeful") == ["hope"]
    assert feat.stem("hopes") == []  # S only arrives via the ful append


def test_case_variation(feat):
    assert feat.stem("Paris") == ["paris"]  # title → lower variant
    assert feat.stem("PARIS") == ["paris"]  # upper → title → lower
    assert feat.stem("LONDON") == ["London"]  # upper → title variant hits
    assert feat.stem("Walks") == ["walk"]
    assert feat.stem("pArIs") == []  # mixed case never varies


def test_flag_long_mode():
    aff = "FLAG long\nSFX Aa Y 1\nSFX Aa 0 s .\n"
    d = parse_dictionary(aff, "1\ncat/Aa\n")
    assert d.stem("cats") == ["cat"]
    assert d.stem("cat") == ["cat"]


def test_flag_num_mode():
    aff = "FLAG num\nSFX 65 Y 1\nSFX 65 0 s .\n"
    d = parse_dictionary(aff, "1\ncat/65\n")
    assert d.stem("cats") == ["cat"]


def test_af_aliases():
    aff = "AF 2\nAF S\nAF SG\nSFX S Y 1\nSFX S 0 s .\nSFX G Y 1\nSFX G 0 ing .\n"
    d = parse_dictionary(aff, "2\ndog/1\njump/2\n")
    assert d.stem("dogs") == ["dog"]
    assert d.stem("dogging") == []  # alias 1 carries only S
    assert d.stem("jumping") == ["jump"]
    assert d.stem("jumps") == ["jump"]


def test_ignorecase():
    aff = "IGNORECASE\nSFX S Y 1\nSFX S 0 s .\n"
    d = parse_dictionary(aff, "1\nCat/S\n")
    assert d.stem("CATS") == ["cat"]
    assert d.stem("cats") == ["cat"]


def test_fullstrip():
    aff = "FULLSTRIP\nSFX S Y 1\nSFX S word ions word\n"
    d = parse_dictionary(aff, "1\nword/S\n")
    # the whole surface form is the affix; FULLSTRIP allows the empty rest
    assert d.stem("ions") == ["word"]


def test_complexprefixes_rejected():
    with pytest.raises(ValueError, match="COMPLEXPREFIXES"):
        parse_dictionary("COMPLEXPREFIXES\n", "0\n")


def test_filter_contract(feat):
    toks = tokenize("unwalking zebra hopefuls")
    out = hunspell_stem_tokens(toks, feat)
    # stems keep the source token's position; unknown words pass through
    assert [(t.term, t.position) for t in out] == [
        ("walk", 0),
        ("zebra", 1),  # unknown → unchanged
        ("hope", 2),
    ]


def test_filter_stacking_and_dedup(simple):
    toks = tokenize("foo")
    stems = hunspell_stem_tokens(toks, simple, dedup=False)
    assert [t.term for t in stems] == ["foo", "foo"]  # two entries, no dedup
    assert [t.position for t in stems] == [0, 0]  # stacked at one position
    deduped = hunspell_stem_tokens(toks, simple, dedup=True)
    assert [t.term for t in deduped] == ["foo"]


def test_filter_longest_only(simple):
    toks = tokenize("lucene")
    longest = hunspell_stem_tokens(toks, simple, longest_only=True)
    assert [t.term for t in longest] == ["lucene"]


def test_end_to_end_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import Searcher

    register_hunspell_analyzer("hunspell_feat", FEAT_AFF, FEAT_DIC)
    rows = [
        ("doc://0", "she walks to work"),
        ("doc://1", "unwalking the path rewalked"),
        ("doc://2", "nobody tries buses"),
        ("doc://3", "zebra crossing"),
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    idx = str(tmp_path_factory.mktemp("hunspell_idx"))
    build_index(spark, df, idx, num_segments=2, analyzer="hunspell_feat")
    s = Searcher(spark, idx, analyzer="hunspell_feat")
    # every inflection of walk matches every other through the stem
    hits = {r["url"] for r in s.search("walking", k=10, with_url=True).collect()}
    assert hits == {"doc://0", "doc://1"}
    hits = {r["url"] for r in s.search("try", k=10, with_url=True).collect()}
    assert hits == {"doc://2"}
    # unknown words index as themselves
    hits = {r["url"] for r in s.search("zebra", k=10, with_url=True).collect()}
    assert hits == {"doc://3"}
