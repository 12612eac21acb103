"""CCNet perplexity filter (pipeline/perplexity.py, Wenzek et al. 2020)."""

import math

import pytest

from lucene_spark.pipeline.perplexity import (
    bigram_lm,
    ccnet_buckets,
    perplexity_scores,
)


@pytest.fixture(scope="module")
def ref(spark):
    # clean reference: natural repeated patterns
    rows = [(100 + i, "the stream flows into the lake and the stream returns")
            for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_counts(spark, ref):
    uni, big, total_t, vocab = bigram_lm(ref)
    u = {r["term"]: int(r["c"]) for r in uni.collect()}
    # 10 tokens per doc x 5 docs
    assert total_t == 50 and u["the"] == 15 and u["stream"] == 10
    assert vocab == len(u) + 1
    b = {(r["prev"], r["term"]): (int(r["c2"]), int(r["c1"])) for r in big.collect()}
    # 'the stream' occurs twice per doc; context c('the',.) = 15/doc? no:
    # 'the' is followed 3 times per doc ('the stream' x2, 'the lake' x1)
    assert b[("the", "stream")] == (10, 15)
    assert b[("the", "lake")] == (5, 15)


def test_hand_computed_ppl(spark, ref):
    lam = 0.9
    uni, big, total_t, vocab = bigram_lm(ref)
    denom = total_t + vocab
    docs = spark.createDataFrame([(0, "the stream")], "doc_id long, text string")
    got = perplexity_scores(docs, ref, lam=lam).collect()[0]
    p_first = (1 - lam) * (15 + 1) / denom  # 'the' scored unigram-only
    p_second = lam * (10 / 15) + (1 - lam) * (10 + 1) / denom
    expect = math.exp((-math.log(p_first) - math.log(p_second)) / 2)
    assert float(got["ppl"]) == pytest.approx(expect, rel=1e-12)


def test_clean_beats_gibberish_and_floor(spark, ref):
    docs = spark.createDataFrame(
        [
            (0, "the stream flows into the lake"),
            (1, "zx qq vv kk pp ww"),  # pure OOV
            (2, ""),
        ],
        "doc_id long, text string",
    )
    sc = {int(r["doc_id"]): float(r["ppl"]) for r in perplexity_scores(docs, ref).collect()}
    assert sc[0] < sc[1]
    uni, big, total_t, vocab = bigram_lm(ref)
    oov = math.exp(-math.log(0.1 * (1.0 / (total_t + vocab))))
    assert sc[1] == pytest.approx(oov, rel=1e-9)  # every token at the floor
    assert sc[2] == pytest.approx(oov, rel=1e-9)  # empty doc = floor
    assert len(sc) == 3


def test_buckets(spark, ref):
    rows = [(i, "the stream flows into the lake" if i < 3
             else ("the stream" if i < 6 else f"zz{i} qq{i} vv{i}"))
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {int(r["doc_id"]): r["bucket"]
           for r in ccnet_buckets(docs, ref, head=0.3, middle=0.3).collect()}
    assert [out[i] for i in range(10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 4
    )
