"""DSIR importance resampling (pipeline/dsir.py, Xie et al. 2023)."""

import pytest

from lucene_spark.pipeline.dsir import dsir_log_ratios, dsir_scores, dsir_select


@pytest.fixture(scope="module")
def corpora(spark):
    # raw = half "science-style", half "spam-style"; target sample is
    # science-style — DSIR must prefer the science half
    sci = ["quantum physics experiment data analysis result"] * 1
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "quantum physics experiment method data result"))
        else:
            rows.append((i, "click here buy cheap deal offer now win"))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + j, t) for j, t in enumerate(sci * 4)],
        "doc_id long, text string",
    )
    return raw, target


def test_target_style_docs_win(spark, corpora):
    raw, target = corpora
    top = dsir_select(raw, target, 20)
    ids = [int(r["doc_id"]) for r in top.collect()]
    assert len(ids) == 20
    assert all(i % 2 == 0 for i in ids)  # every winner is science-style
    # and they outscore the spam half strictly
    lr = dsir_log_ratios(raw, target)
    sc = {
        int(r["doc_id"]): float(r["dsir_score"])
        for r in dsir_scores(raw, lr).collect()
    }
    assert min(sc[i] for i in range(0, 40, 2)) > max(
        sc[i] for i in range(1, 40, 2)
    )


def test_hashed_mode_matches_exact_on_small_vocab(spark, corpora):
    raw, target = corpora
    # with enough buckets (no collisions on this vocab) the hashed scores
    # induce the same selection
    exact = [int(r["doc_id"]) for r in dsir_select(raw, target, 10).collect()]
    hashed = [
        int(r["doc_id"])
        for r in dsir_select(raw, target, 10, num_buckets=1 << 20).collect()
    ]
    assert set(exact) == set(hashed)


def test_empty_doc_scores_zero(spark, corpora):
    _raw, target = corpora
    raw2 = spark.createDataFrame(
        [(0, "quantum physics data"), (1, "")], "doc_id long, text string"
    )
    lr = dsir_log_ratios(raw2, target)
    sc = {
        int(r["doc_id"]): float(r["dsir_score"])
        for r in dsir_scores(raw2, lr).collect()
    }
    assert sc[1] == 0.0
    assert set(sc) == {0, 1}
