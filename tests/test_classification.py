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


def test_knn_doc_classify_votes(spark, tmp_path):
    """KNearestNeighborDocumentClassifier: MLT top-k neighbors vote
    score/maxScore for their class; class score = vote sum / k; the top
    row is assignClass (oracle-gated in test_gate.py classify_knn_mlt)."""
    from lucene_spark.classification import knn_doc_classify
    from lucene_spark.fixtures import generate_webtext
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import Searcher
    from pyspark.sql import functions as F

    corpus = generate_webtext(200)
    d = str(tmp_path / "knnmlt")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=2, analyzer="simple")
    s = Searcher(spark, d, analyzer="simple", mode="double")
    classes = spark.createDataFrame(
        [(r["url"], "even" if i % 2 == 0 else "odd")
         for i, r in enumerate(corpus)],
        "url string, cls string",
    )
    from lucene_spark.search.mlt import MoreLikeThis

    k = 10
    mlt = MoreLikeThis(s, boost=True, min_term_freq=1, min_doc_freq=1)
    out = knn_doc_classify(s, classes, corpus[0]["text"], k=k, mlt=mlt).collect()
    assert out, "classifier must produce at least one class"
    # votes are normalized: each neighbor contributes <= 1/k, so the
    # total class mass is <= 1 and the top class holds the maximum
    total = sum(r["score"] for r in out)
    assert 0.0 < total <= 1.0 + 1e-6
    assert out[0]["score"] == max(r["score"] for r in out)
    # re-derive from the underlying hits
    hits = s.search(
        mlt.like_text(corpus[0]["text"]), k=k, with_url=True
    ).collect()
    mx = max(r["score"] for r in hits)
    cls_of = {r["url"]: r["cls"] for r in classes.collect()}
    expect = {}
    for h in hits:
        c = cls_of[h["url"]]
        expect[c] = expect.get(c, 0.0) + h["score"] / mx
    expect = {c: round(v / k, 4) for c, v in expect.items()}
    assert {r["cls"]: r["score"] for r in out} == {
        c: pytest.approx(v, abs=1e-4) for c, v in expect.items()
    }


def test_perceptron_reference_arithmetic():
    """BooleanPerceptronClassifier: ttf seeds, default bias = avgdl,
    signum updates with max(0, ·), per-occurrence output sum."""
    from lucene_spark.classification import BooleanPerceptron

    ttf = {"a": 3, "b": 1}
    p = BooleanPerceptron()  # bias = sum_ttf / doc_count = 4/2 = 2.0
    p.fit([("a a b", False), ("b", True)], ttf, doc_count=2)
    assert p.bias == 2.0
    # doc0: out=7 >= 2 -> True but label False: w[a]=max(0,3-2)=1,
    # w[b]=max(0,1-1)=0; doc1: out=0 < 2 -> False but label True: w[b]=1
    assert p.weights == {"a": 1, "b": 1}
    assigned, score = p.assign("a b")
    assert assigned is True and score == pytest.approx(0.0)
    # unseen tokens weigh 0
    assigned, score = p.assign("zzz")
    assert assigned is False and score == pytest.approx(1 - math.exp(-1.0))


def test_perceptron_fst_snapshot_staleness():
    """Within a batch window updates read the STALE snapshot (the FST),
    so consecutive mistakes do not compound (:160-170 + :128)."""
    from lucene_spark.classification import BooleanPerceptron

    train = [("a", False)] * 3
    p1 = BooleanPerceptron(bias=2.0, batch_size=1).fit(train, {"a": 5})
    p3 = BooleanPerceptron(bias=2.0, batch_size=3).fit(train, {"a": 5})
    assert p1.weights == {"a": 2}
    assert p3.weights == {"a": 3}


def test_perceptron_classify_df_matches_assign(spark):
    from lucene_spark.classification import BooleanPerceptron

    p = BooleanPerceptron(bias=2.0).fit(
        [("a a b", False)], {"a": 3, "b": 1}
    )
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b"), (2, "zzz a a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["assigned"], r["score"])
           for r in p.classify_df(docs).collect()}
    for i, t in [(0, "a b"), (1, "b"), (2, "zzz a a")]:
        a, s = p.assign(t)
        assert got[i][0] == a and got[i][1] == pytest.approx(s)
