"""Solr + WordNet synonym file parsers (analysis/common/.../synonym/
SolrSynonymParser.java, WordnetSynonymParser.java): grammar, expand
semantics, escapes, rule merging — then end-to-end through the index-time
synonym chain and the query-side graph."""

import pytest

from lucene_spark.analysis.synonyms import (
    parse_solr_synonyms,
    parse_wordnet_synonyms,
    synonym_graph_paths,
)

SOLR = """
# blank lines and comments are ignored

couch, sofa, divan
i-pod, i pod => ipod
foo => foo bar, baz
sea\\ biscuit => seabiscuit
"""

WORDNET = """\
s(100000001,1,'wood',n,1,0).
s(100000001,2,'woods',n,1,0).
s(100000001,3,'forest',n,1,0).
s(200000002,1,'alone',r,1,0).
s(300000003,1,'o''clock',r,1,0).
s(300000003,2,'oclock',r,1,0).
"""


def test_solr_expand_true():
    r = parse_solr_synonyms(SOLR, expand=True)
    assert r["couch"] == ("couch", "sofa", "divan")
    assert r["sofa"] == ("couch", "sofa", "divan")
    assert r["i-pod"] == ("ipod",)
    assert r["i pod"] == ("ipod",)           # multi-word input kept intact
    assert r["foo"] == ("foo bar", "baz")    # multi-word output kept intact
    assert r["sea biscuit"] == ("seabiscuit",)  # escaped space


def test_solr_expand_false():
    r = parse_solr_synonyms(SOLR, expand=False)
    assert r["sofa"] == ("couch",) and r["divan"] == ("couch",)
    assert r["i-pod"] == ("ipod",)  # => rules unaffected by expand


def test_solr_merges_repeated_inputs():
    r = parse_solr_synonyms("a => b\na => c\n")
    assert r["a"] == ("b", "c")


def test_wordnet():
    r = parse_wordnet_synonyms(WORDNET, expand=True)
    assert r["wood"] == ("wood", "woods", "forest")
    assert "alone" not in r                  # singleton synset: no rule
    assert r["o'clock"] == ("o'clock", "oclock")  # '' quote escape
    r2 = parse_wordnet_synonyms(WORDNET, expand=False)
    assert r2["forest"] == ("wood",)
    with pytest.raises(ValueError):
        parse_wordnet_synonyms("s(bad line")


def test_parsed_rules_feed_query_graph():
    rules = parse_solr_synonyms("machine learning => ml\n")
    paths = synonym_graph_paths(["machine", "learning", "rocks"], rules)
    assert ("ml", "rocks") in paths and ("machine", "learning", "rocks") in paths
