"""naive_bayes_classify vs a hand-rolled python oracle implementing
classification/SimpleNaiveBayesClassifier.java literally."""

import math

import pytest

from lucene_spark.classification import naive_bayes_classify

TRAIN = [
    (0, "spark shuffle join agg", "infra"),
    (1, "spark executor shuffle spill", "infra"),
    (2, "tokenizer stemmer stopword", "nlp"),
    (3, "stemmer lemma token tokenizer corpus", "nlp"),
    (4, "spark tokenizer bridge", "infra"),
]
TEST = [
    (10, "spark shuffle shuffle agg"),   # repeated token: counts twice
    (11, "stemmer tokenizer corpus"),
    (12, "zzz unseen words only"),       # all-smoothing path
]


def _oracle():
    n_train = len(TRAIN)
    docs = [(i, t.split(), c) for i, t, c in TRAIN]
    classes = sorted({c for _, _, c in docs})
    cdf = {c: sum(1 for d in docs if d[2] == c) for c in classes}
    wdf = {}
    for _, toks, c in docs:
        for w in set(toks):
            wdf[(w, c)] = wdf.get((w, c), 0) + 1
    avg_unique = sum(len(set(t)) for _, t, _ in docs) / n_train
    out = {}
    for i, text in TEST:
        toks = text.split()
        scores = {}
        for c in classes:
            den = avg_unique * cdf[c] + n_train
            s = math.log(cdf[c]) - math.log(n_train)
            for w in toks:  # every instance, doc-frequency hits
                s += math.log((wdf.get((w, c), 0) + 1) / den)
            scores[c] = s
        smax = max(scores.values())
        loga = smax + math.log(sum(math.exp(s - smax) for s in scores.values()))
        out[i] = {c: math.exp(s - loga) for c, s in scores.items()}
    return out


def _dfs(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    return train, test


def test_top1_matches_reference_formula(spark):
    train, test = _dfs(spark)
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in naive_bayes_classify(train, test).collect()
    }
    want = _oracle()
    for i, probs in want.items():
        top = max(sorted(probs), key=lambda c: probs[c])
        assert got[i][0] == top
        assert got[i][1] == pytest.approx(probs[top], abs=1e-4)
    assert got[10][0] == "infra" and got[11][0] == "nlp"


def test_topk_scores_sum_to_one(spark):
    train, test = _dfs(spark)
    rows = naive_bayes_classify(train, test, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["score"])
    for i, scores in by_doc.items():
        assert len(scores) == 2  # both classes ranked
        assert sum(scores) == pytest.approx(1.0, abs=1e-3)
    want = _oracle()
    # unseen-vocabulary doc: decided purely by prior and denominator
    probs = want[12]
    top = max(sorted(probs), key=lambda c: probs[c])
    got12 = max(
        (r for r in rows if r["doc_id"] == 12), key=lambda r: r["score"]
    )
    assert got12["label"] == top
