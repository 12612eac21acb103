"""RSLP parser/stemmer (analysis/rslp.py) on hand-written rule
fixtures; the real galician.rslp / portuguese.rslp files are swept in
tests/test_rslp_real.py."""

import pytest

from lucene_spark.analysis.rslp import Rule, Step, parse_rslp

FIXTURE = """\
# tiny RSLP instance
{  "Plural", 3, 1, {"s"},
  {"ns",1,"n",{"luns"}},
  {"les",2,"l"},
  {"s",2,""}};

{  "Vowel", 0, 0, {},
  {"a",3},
  {"o",3,"",{"ao"}}};
"""


def test_parse_structure():
    steps = parse_rslp(FIXTURE)
    assert sorted(steps) == ["Plural", "Vowel"]
    p = steps["Plural"]
    assert p.min == 3 and p.suffixes == ("s",)
    assert len(p.rules) == 3
    # step with N=0 auto-derives min from rules (min suffix+min)
    v = steps["Vowel"]
    assert v.min == 4  # "a" len 1 + min 3


def test_rule_order_and_exceptions():
    steps = parse_rslp(FIXTURE)
    p = steps["Plural"]
    # first matching rule fires: 'ns' before bare 's'
    assert p.apply("bons") == "bon"
    # whole-word exception blocks the rule AND falls through to NO rule
    # ('luns' matches rule 1's suffix; Lucene tries later rules too —
    # rule 3 's' fires: len-1=3 >= 2)
    assert p.apply("luns") == "lun"
    # entry condition: word must end with 's' to enter the step
    assert p.apply("bon") == "bon"
    # min stem length: 'as' (len 2 - 1 < 2) -> untouched by rule 3,
    # and below the step min anyway
    assert p.apply("as") == "as"


def test_suffix_exception_mode():
    steps = parse_rslp(
        '{  "X", 0, 0, {},\n  {"inho",2,"",{"caminho"}}};\n'
    )
    x = steps["X"]
    # exc mode 0: ends-with exceptions
    assert x.rules[0].exc_whole_word is False
    assert x.apply("gatinho") == "gat"
    assert x.apply("caminho") == "caminho"
    assert x.apply("ocaminho") == "ocaminho"  # ends-with blocks too


def test_replacement_longer_than_suffix():
    r = Rule("ões", 3, "ão")
    assert r.matches("balões") and r.replace("balões") == "balão"


def test_bad_input_raises():
    with pytest.raises(ValueError, match="bad step header"):
        parse_rslp("not a header\n")
    with pytest.raises(ValueError, match="bad rule"):
        parse_rslp('{  "A", 1, 0, {},\n  garbage};\n')
