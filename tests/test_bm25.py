"""BM25 float32 property + golden tests (BaseSimilarityTestCase analog,
lucene/test-framework/.../search/similarities/BaseSimilarityTestCase.java:48)."""

import math

import numpy as np
import pytest

from lucene_spark.functions.bm25 import Bm25Scorer, DoubleBm25Scorer, idf_value
from lucene_spark.functions.smallfloat import int_to_byte4


def test_idf_value_golden():
    # idf = (float) ln(1 + (N - n + 0.5) / (n + 0.5))
    got = idf_value(doc_freq=3, doc_count=100)
    want = np.float32(math.log(1 + (100 - 3 + 0.5) / (3 + 0.5)))
    assert got == want
    assert got.dtype == np.float32


def test_score_golden_hand_computed():
    # N=10 docs, term in 2, sum_ttf=100 (avgdl=10), freq=3, dl=10
    sc = Bm25Scorer.create(doc_freq=2, doc_count=10, sum_total_term_freq=100)
    norm = int_to_byte4(10)
    got = float(sc.score(np.array([3]), np.array([norm]))[0])
    idf = math.log(1 + (10 - 2 + 0.5) / (2 + 0.5))
    want = idf * 3 / (3 + 1.2 * (1 - 0.75 + 0.75 * 10 / 10))
    assert got == pytest.approx(want, rel=1e-6)


@pytest.mark.parametrize("seed", range(10))
def test_random_properties(seed):
    """Scores finite, non-negative, monotone in freq, anti-monotone in norm."""
    rng = np.random.default_rng(seed)
    doc_count = int(rng.integers(1, 2**40))
    doc_freq = int(rng.integers(1, doc_count + 1))
    sum_ttf = int(rng.integers(doc_count, 2**45))
    sc = Bm25Scorer.create(doc_freq, doc_count, sum_ttf)

    freqs = np.sort(rng.integers(1, 2**20, 50))
    norms = np.full(50, int(rng.integers(0, 256)))
    s = sc.score(freqs, norms)
    assert np.isfinite(s).all()
    assert (s >= 0).all()
    assert (np.diff(s) >= 0).all()  # monotone in freq

    norms2 = np.arange(256)
    s2 = sc.score(np.full(256, 7), norms2)
    assert (np.diff(s2) <= 0).all()  # anti-monotone in norm byte


def test_float32_evaluation_order():
    """weight - weight / (1 + freq * cache[norm]) evaluated in float32."""
    sc = Bm25Scorer.create(5, 1000, 150_000)
    f = np.float32(4.0)
    ni = sc.cache[int_to_byte4(150) & 0xFF]
    want = np.float32(sc.weight - sc.weight / (np.float32(1.0) + f * ni))
    got = sc.score(np.array([4]), np.array([int(int_to_byte4(150))]))[0]
    assert got == want and got.dtype == np.float32


def test_max_score_upper_bounds_block():
    sc = Bm25Scorer.create(10, 10_000, 1_000_000)
    rng = np.random.default_rng(1)
    freqs = rng.integers(1, 100, 500)
    lens = rng.integers(1, 5000, 500)
    norms = int_to_byte4(lens)
    scores = sc.score(freqs, norms)
    # the skyline upper bound must dominate every member score
    from lucene_spark.codecs.blocks import skyline

    sky = np.array(skyline(freqs, norms))
    ub = sc.max_score(sky)
    assert (scores <= ub + 1e-9).all()


def test_double_scorer_matches_formula():
    sc = DoubleBm25Scorer.create(2, 10, 100)
    got = sc.score(np.array([3.0]), np.array([10.0]))[0]
    idf = math.log(1 + (10 - 2 + 0.5) / (2 + 0.5))
    want = idf * 3 / (3 + 1.2 * (1 - 0.75 + 0.75 * 10 / 10))
    assert got == pytest.approx(want, rel=1e-12)
