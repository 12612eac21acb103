"""Index-driven document classification — the classification-module analog.

Reference behavior: classification/SimpleNaiveBayesClassifier.java:
- log prior   = ln(docFreq(class=c)) - ln(docsWithClass)            (:279)
- per word    = ln((hits + 1) / den), hits = #docs of class c that
  CONTAIN the word (a doc-frequency AND-count, not a term frequency)
  summed over every token INSTANCE of the input text                (:209)
- den         = avgUniqueTermsPerDoc * docFreq(class=c)
                + docsWithClass  (shared by all words of a class)   (:241)
- results are normalized to [0,1] with a log-sum-exp softmax        (:296)

The Spark-first restatement classifies an entire unlabeled corpus in one
job instead of one doc per call: the per-(word, class) doc-frequency
table is built once from the labeled corpus (distinct doc-term pairs,
one aggregation), the test token stream joins against it, and the
per-class denominator/prior fold in as per-class constants. Unmatched
words contribute ln(1/den) — folded in as -n_tokens * ln(den) so only
MATCHED words need join rows. Shuffles: the wcdf build (train-vocab
sized), the token join + per-(doc, class) sum, and a per-doc window
whose partitions hold n_classes rows; nothing is driver-sized except the
n_classes prior table (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["naive_bayes_classify", "knn_classify"]

TOKEN_SPLIT = "[^a-z0-9]+"


def _tok(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
    )


def naive_bayes_classify(
    train: DataFrame,
    test: DataFrame,
    class_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
) -> DataFrame:
    """(id, label, score): top-k classes per test doc by the reference's
    naive-Bayes score, with the log-sum-exp-normalized score in [0,1]
    rounded to 4 (ranking cuts on the unrounded value; ties break on
    label ASC). ``k`` defaults to 1 (assignClass); pass k>1 for
    getClasses(max)."""
    tr_tokens = train.select(
        F.col(id_col), F.col(class_col).alias("label"), F.explode(_tok(text_col)).alias("term")
    )
    # (word, class) -> #docs of the class containing the word
    wcdf = (
        tr_tokens.distinct()
        .groupBy("term", "label")
        .agg(F.count("*").alias("wdf"))
    )
    # per-class constants: prior and the word-independent denominator
    n_train = train.count()
    uniq = tr_tokens.distinct().groupBy(id_col).agg(F.count("*").alias("u"))
    avg_unique = uniq.agg(
        (F.sum("u").cast("double") / n_train).alias("a")
    ).collect()[0]["a"]
    classes = (
        train.groupBy(F.col(class_col).alias("label"))
        .agg(F.count("*").alias("cdf"))
        .select(
            "label",
            (F.log(F.col("cdf").cast("double")) - F.log(F.lit(float(n_train)))).alias(
                "log_prior"
            ),
            F.log(
                F.lit(avg_unique) * F.col("cdf").cast("double") + F.lit(float(n_train))
            ).alias("log_den"),
        )
    )
    te_tokens = test.select(id_col, F.explode(_tok(text_col)).alias("term"))
    n_tok = te_tokens.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    hits = (
        te_tokens.join(wcdf, "term")
        .groupBy(id_col, "label")
        .agg(F.sum(F.log(F.col("wdf").cast("double") + 1.0)).alias("hit_sum"))
    )
    scored = (
        n_tok.crossJoin(F.broadcast(classes))
        .join(hits, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("log_prior")
                + F.coalesce("hit_sum", F.lit(0.0))
                - F.col("n_tokens").cast("double") * F.col("log_den")
            ).alias("s"),
        )
    )
    w = Window.partitionBy(id_col)
    smax = F.max("s").over(w)
    loga = smax + F.log(F.sum(F.exp(F.col("s") - smax)).over(w))
    ranked = scored.select(
        id_col,
        "label",
        F.exp(F.col("s") - loga).alias("score"),
        F.row_number()
        .over(Window.partitionBy(id_col).orderBy(F.desc("s"), F.asc("label")))
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= k).select(
        id_col, "label", F.round("score", 4).alias("score")
    )


class BooleanPerceptron:
    """BooleanPerceptronClassifier (classification/src/java/org/apache/
    lucene/classification/BooleanPerceptronClassifier.java) — a binary
    text classifier whose term weights live in an FST and start at each
    term's collection totalTermFreq.

    Reference arithmetic, reproduced exactly:

    - initial weight w[t] = global ttf(t) (:89-95); unseen terms weigh 0
    - bias defaults to avgFieldLength = sumTTF / docCount (:68-75)
    - prediction: output = Σ over token OCCURRENCES of w[token];
      assigned = output >= bias; score = 1 − e^(−|bias − output|/bias)
      (:195-209)
    - training pass (one sequential sweep in doc order, :104-135): when
      the prediction is wrong, modifier = signum(correct − assigned) and
      every DISTINCT doc term gets w[t] = max(0, snapshot[t] + modifier·tf)
      — based on the FST SNAPSHOT, not the live map (:160-170), so
      within a batch window repeated mistakes do not compound; the
      snapshot refreshes when batchCount % batch_size == 0 (:128), and
      weights truncate to LONG at snapshot time (updateFST
      :entry.getValue().longValue())

    Spark split: TRAINING is inherently online-sequential and runs on the
    driver over the (bounded, labeled) training set — exactly like the
    reference, which loops scoreDocs on one thread. CLASSIFICATION is the
    scale path: ``classify_df`` broadcasts the final weights and scores
    any corpus map-only (Arrow batches, no shuffle)."""

    def __init__(self, bias: float | None = None, batch_size: int = 1):
        self.batch_size = max(1, int(batch_size))
        self.bias = bias
        self.weights: dict[str, int] = {}

    @staticmethod
    def _tokens(text: str) -> list[str]:
        from .analysis.simple import simple_terms_positions

        return simple_terms_positions(text or "", None)[0]

    def _output(self, snapshot: dict[str, int], text: str) -> int:
        return sum(snapshot.get(t, 0) for t in self._tokens(text))

    def fit(
        self,
        train: list[tuple[str, bool]],
        term_ttf: dict[str, int],
        doc_count: int | None = None,
    ) -> "BooleanPerceptron":
        """One reference-exact sweep over (text, label) pairs. ``term_ttf``
        seeds the weights (collection totalTermFreq per term — e.g. from
        ``Searcher.reader.term_stats``); ``doc_count`` sizes the default
        bias."""
        if self.bias is None:
            if not doc_count:
                raise ValueError("bias=None needs doc_count for avgdl")
            self.bias = float(sum(term_ttf.values())) / float(doc_count)
        weights = {t: int(v) for t, v in term_ttf.items()}
        snapshot = dict(weights)
        for batch_count, (text, label) in enumerate(train):
            out = self._output(snapshot, text)
            assigned = out >= self.bias
            modifier = (label > assigned) - (label < assigned)  # signum
            if modifier != 0:
                tf: dict[str, int] = {}
                for t in self._tokens(text):
                    tf[t] = tf.get(t, 0) + 1
                for t, f in tf.items():
                    prev = snapshot.get(t)
                    weights[t] = (
                        0 if prev is None else max(0, prev + modifier * f)
                    )
                if batch_count % self.batch_size == 0:
                    snapshot = {t: int(v) for t, v in weights.items()}
        self.weights = {t: int(v) for t, v in weights.items()}
        return self

    def assign(self, text: str) -> tuple[bool, float]:
        """(assignedClass, score) for one text — assignClass(:195-209)."""
        import math

        out = self._output(self.weights, text)
        score = 1.0 - math.exp(-abs(self.bias - float(out)) / self.bias)
        return out >= self.bias, score

    def classify_df(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Distributed assignClass over a corpus: broadcast weights,
        map-only Arrow batches, rows (id, assigned, score)."""
        import math

        from typing import Iterator

        import pandas as pd

        w = dict(self.weights)
        bias = float(self.bias)
        tok = self._tokens
        schema = f"{id_col} long, assigned boolean, score double"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    out = sum(w.get(x, 0) for x in tok(t or ""))
                    rows.append(
                        (
                            int(i),
                            bool(out >= bias),
                            1.0 - math.exp(-abs(bias - float(out)) / bias),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[id_col, "assigned", "score"]
                )

        return docs.select(id_col, text_col).mapInPandas(run, schema)


def knn_doc_classify(
    searcher,
    classes_df: DataFrame,
    text: str,
    k: int = 10,
    url_col: str = "url",
    class_col: str = "cls",
    mlt=None,
) -> DataFrame:
    """KNearestNeighborDocumentClassifier (classification/
    KNearestNeighborDocumentClassifier.java:149-185 knnSearch +
    KNearestNeighborClassifier.java:190 buildListFromTopDocs): build a
    MoreLikeThis query from the document text with per-term TF·IDF boosts
    (mlt.setBoost(true), :163), take the top-k training hits, and let each
    neighbor vote ``score / maxScore`` for its class; a class's score is
    its vote sum / k, argmax assigned.

    ``classes_df`` maps ``url_col`` → ``class_col`` (the stored class
    field; the reference reads it from the neighbor's stored document).
    Returns (cls, score) rows, best first (score DESC, cls ASC), score
    rounded to 4 — the getClasses view; row 1 is assignClass.

    Plan shape: the MLT query runs through the standard pruned search
    path; only k rows join the (broadcastable) class mapping and feed one
    tiny aggregation — classification of a document costs one top-k
    search regardless of corpus size."""
    from .search.mlt import MoreLikeThis

    from pyspark.sql import Window

    if mlt is None:
        mlt = MoreLikeThis(searcher, boost=True)
    hits = searcher.search(mlt.like_text(text), k=k, with_url=True)
    if url_col not in hits.columns:
        # MatchNoDocs (no interesting MLT terms) — no neighbors, no class
        return searcher.spark.createDataFrame(
            [], f"{class_col} string, score double"
        )
    w_all = Window.partitionBy(F.lit(1))
    return (
        hits.join(classes_df.select(url_col, class_col), url_col)
        .withColumn("mx", F.max("score").over(w_all))
        .groupBy(class_col)
        .agg(
            F.round(
                F.sum(F.col("score") / F.col("mx")) / F.lit(float(k)), 4
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(class_col))
    )


def knn_classify(
    emb: DataFrame,
    qvecs: dict[int, list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """K-nearest-neighbor classification over an embedding column — the
    KNearestNeighborClassifier analog (classification/
    KNearestNeighborClassifier.java:190 buildListFromTopDocs) with vector
    similarity standing in for the MLT query (the KnnVectorQuery-era form
    of the same classifier).

    Reference scoring, reproduced exactly: each of the k nearest neighbors
    votes for its class with weight ``score / maxScore`` (maxScore = the
    top neighbor's score); a class's score is its weight sum divided by k
    (count * normalizedBoost / k in the reference simplifies to exactly
    that), and the argmax class is assigned. Every neighbor here carries a
    label, so the reference's sumdoc<k correction never fires.

    Plan: the query set broadcasts (Q rows), cosines compute JVM-side in
    one pass over the table, per-query top-k is a window over (qid) —
    at scale each query reads the table once and only ≤ Q·k rows shuffle
    into the vote aggregation. Returns one (qid, label, score) row per
    query, tie-break (score DESC, label ASC), score rounded to 4.
    """
    spark = emb.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in sorted(qvecs.items())],
        "qid long, qv array<double>",
    )
    v = F.col(vec_col)
    q = F.col("qv")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = dot(v, q) / (F.sqrt(dot(v, v)) * F.sqrt(dot(q, q)))
    scored = emb.crossJoin(F.broadcast(qdf)).select(
        "qid", F.col(id_col), F.col(label_col).alias("label"), cos.alias("cos")
    )
    top = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc(id_col))
            ),
        )
        .filter(F.col("rn") <= k)
        .withColumn("m", F.max("cos").over(Window.partitionBy("qid")))
    )
    votes = top.groupBy("qid", "label").agg(
        (F.sum(F.col("cos") / F.col("m")) / F.lit(float(k))).alias("score")
    )
    best = votes.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("label"))
        ),
    ).filter(F.col("rk") == 1)
    return best.select("qid", "label", F.round("score", 4).alias("score"))
