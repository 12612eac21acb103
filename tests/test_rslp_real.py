"""RSLP stemmers against the REAL Lucene-shipped rule files and the
reference's own stem vocabulary.

- galician.rslp / portuguese.rslp load from the reference mount (rule
  files are Lucene resources this repo does not ship).
- The Portuguese stemmer is swept against ptrslptestdata.zip — the
  reference's own VocabularyAssert data (32,016 word→stem pairs used by
  TestPortugueseStemFilter) — and must match stem-for-stem.
- Galician vectors come from TestGalicianAnalyzer.testBasics.
Skips cleanly when the reference tree is absent.
"""

import io
import os
import zipfile

import pytest

from lucene_spark.analysis.rslp import (
    galician_stem,
    load_rslp,
    portuguese_stem,
)

_GL = ("/root/reference/lucene/analysis/common/src/resources/"
       "org/apache/lucene/analysis/gl/galician.rslp")
_PT = ("/root/reference/lucene/analysis/common/src/resources/"
       "org/apache/lucene/analysis/pt/portuguese.rslp")
_PT_VOCAB = ("/root/reference/lucene/analysis/common/src/test/"
             "org/apache/lucene/analysis/pt/ptrslptestdata.zip")

gl_mounted = pytest.mark.skipif(
    not os.path.exists(_GL), reason="reference galician.rslp absent")
pt_mounted = pytest.mark.skipif(
    not os.path.exists(_PT), reason="reference portuguese.rslp absent")
vocab_mounted = pytest.mark.skipif(
    not os.path.exists(_PT_VOCAB), reason="ptrslptestdata.zip absent")


@gl_mounted
def test_real_galician_rslp():
    steps = load_rslp(_GL)
    assert sorted(steps) == [
        "Adverb", "Augmentative", "Noun", "Plural", "Unification",
        "Verb", "Vowel",
    ]
    # TestGalicianAnalyzer.testBasics
    assert galician_stem("correspondente", steps) == "correspond"
    assert galician_stem("corresponderá", steps) == "correspond"
    # rule-file comment examples (Plural step)
    assert galician_stem("luces", steps) == "luz"
    assert galician_stem("papéis", steps) == "papel"


@gl_mounted
def test_real_galician_full_chain():
    from lucene_spark.analysis.gl import galician_analyze

    steps = load_rslp(_GL)
    toks = [t.term for t in galician_analyze(
        "correspondente corresponderá", rslp_steps=steps)]
    assert toks == ["correspond", "correspond"]


@pt_mounted
@vocab_mounted
def test_real_portuguese_rslp_full_vocabulary():
    """Every one of the reference's 32,016 VocabularyAssert pairs must
    stem identically (TestPortugueseStemFilter.testVocabulary data)."""
    steps = load_rslp(_PT)
    with zipfile.ZipFile(_PT_VOCAB) as z:
        raw = z.read("ptrslp.txt")
    total = 0
    for line in io.TextIOWrapper(io.BytesIO(raw), encoding="utf-8"):
        line = line.rstrip("\n")
        if not line or "\t" not in line:
            continue
        word, want = line.split("\t", 1)
        total += 1
        got = portuguese_stem(word.lower(), steps)
        assert got == want, f"{word!r}: {got!r} != {want!r}"
    assert total == 32016


@pt_mounted
def test_real_portuguese_full_chain():
    from lucene_spark.analysis.pt import portuguese_analyze

    steps = load_rslp(_PT)
    # TestPortugueseStemFilter.testExamples prefix
    toks = [t.term for t in portuguese_analyze(
        "O debate político", rslp_steps=steps)]
    assert toks == ["o", "debat", "politic"]
