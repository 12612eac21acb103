"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting. All JVM-side (codegen),
SQL-reproducible for the oracle gate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import ENGLISH_STOP_WORDS
from .dedup import shingles, tokens

__all__ = [
    "lang_id_heuristic",
    "quality_scores",
    "doc_fingerprints",
    "bpe_token_counts",
    "bpe_encode",
    "bpe_token_counts_true",
    "FIXTURE_MERGES",
    "repetition_stats",
    "length_percentiles",
    "lm_doc_logprob",
]


def repetition_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, frac_top_word, frac_top_bigram, frac_dup_trigrams):
    Gopher/C4-style repetition quality filters at token level — the
    fraction of tokens taken by the most frequent word, the fraction of
    word bigrams taken by the most frequent bigram, and the fraction of
    word trigrams that occur 2+ times. Docs failing these are boilerplate
    / template spam in pretraining corpora.

    One shuffle on (doc, gram-size, gram) with map-side combine; the gram
    arrays are sliced map-only from the token array (no window/shuffle to
    assemble n-grams) — scale-safe at 100 TB. Fractions whose denominator
    is empty (fewer tokens than the gram size) are NULL."""
    from .dedup import _token_array

    arr = _token_array("text")

    def grams(n: int):
        idx = F.when(
            F.size(arr) >= n, F.sequence(F.lit(1), F.size(arr) - n + 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"), F.concat_ws(" ", F.slice(arr, i, n)).alias("g")
            ),
        )

    tagged = docs.select(
        id_col,
        F.size(arr).alias("n_tokens"),
        F.explode(F.flatten(F.array(grams(1), grams(2), grams(3)))).alias("t"),
    )
    cnt = tagged.groupBy(
        id_col, "n_tokens", F.col("t.n").alias("n"), F.col("t.g").alias("g")
    ).count()
    agg = cnt.groupBy(id_col, "n_tokens").agg(
        F.max(F.when(F.col("n") == 1, F.col("count"))).alias("top_w"),
        F.max(F.when(F.col("n") == 2, F.col("count"))).alias("top_b"),
        F.sum(
            F.when((F.col("n") == 3) & (F.col("count") >= 2), F.col("count"))
        ).alias("dup_tri"),
    )
    nt = F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        F.round(F.col("top_w") / nt, 4).alias("frac_top_word"),
        F.when(
            F.col("n_tokens") >= 2, F.round(F.col("top_b") / (nt - 1), 4)
        ).alias("frac_top_bigram"),
        F.when(
            F.col("n_tokens") >= 3,
            F.round(F.coalesce(F.col("dup_tri"), F.lit(0)) / (nt - 2), 4),
        ).alias("frac_dup_trigrams"),
    )

# GPT-2-style pre-tokenizer shape over lowercased text: a piece is an
# optionally-space-prefixed letter run, a 1-3 digit group (cl100k-style
# number chunking), or a punctuation/symbol run. Deliberately restricted
# to constructs RE2 and Java regex evaluate identically (no lookarounds,
# explicit whitespace class) so the DuckDB oracle is exact.
BPE_PIECE_RE = r" ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9 \t\n\r]+"
_WS_TOKEN_RE = r"[^ \t\n\r]+"


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws_tokens, n_pieces, chars_per_piece): LLM token-budget
    estimation — whitespace token count plus a BPE-ish piece count from a
    GPT-2-shaped pre-tokenizer regex (no merges table; the piece count is
    the pre-merge upper bound, the standard cheap budget estimator).
    Map-only JVM regex, no shuffle — scale-safe at 100 TB."""
    pieces = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0)))
    ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(_WS_TOKEN_RE), F.lit(0)))
    return docs.select(
        id_col,
        ws.cast("long").alias("n_ws_tokens"),
        pieces.cast("long").alias("n_pieces"),
        F.round(
            F.length("text").cast("double")
            / F.nullif(pieces.cast("double"), F.lit(0.0)),
            4,
        ).alias("chars_per_piece"),
    )

# --- true BPE (the published GPT-2 byte-pair-encoding merge loop, Sennrich
# et al. 2016 / the gpt-2 repo's public encoder.py algorithm): repeatedly
# merge the lowest-rank adjacent pair until no ranked pair remains. The
# merges table is pluggable — drop in the public GPT-2 merges.txt ranks to
# match that tokenizer exactly; FIXTURE_MERGES below is the deterministic
# test vocabulary (single-level, character-disjoint rules, so the DuckDB
# oracle can recompute counts by substring arithmetic).

# character-disjoint: every letter appears in at most one rule, so merges
# never interact and tokens(word) = len(word) - Σ occurrences(rule-string)
FIXTURE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("e", "r"), ("a", "n"), ("o", "w"),
    ("s", "c"), ("l", "d"), ("u", "p"),
]


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered BPE: start from characters, repeatedly merge
    every occurrence of the lowest-rank adjacent pair. Handles multi-level
    merges (a rule whose output feeds a later rule) — the real algorithm,
    not the single-pass approximation."""
    parts = list(word)
    while len(parts) > 1:
        best_rank: int | None = None
        best: tuple[str, str] | None = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (parts[i], parts[i + 1])
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def bpe_token_counts_true(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): EXACT BPE token budget under the given
    merges table (default: the fixture vocabulary). Zipf dictionary trick
    for scale: the iterative merge loop (a Python kernel by necessity) runs
    once per DISTINCT term via an Arrow-batched pandas UDF, then the counts
    join back to the token stream — at 100 TB the vocab is orders of
    magnitude smaller than the corpus, and AQE broadcast-joins it when it
    fits."""
    rules = FIXTURE_MERGES if merges is None else merges
    ranks = {(str(a), str(b)): i for i, (a, b) in enumerate(rules)}

    @F.pandas_udf("long")
    def _n_bpe(terms: pd.Series) -> pd.Series:
        return terms.map(lambda w: len(bpe_encode(str(w), ranks)))

    t = tokens(docs, id_col=id_col)
    vocab = t.select("term").distinct().select("term", _n_bpe("term").alias("n_bpe"))
    joined = t.join(vocab, "term")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        )
    )


# stable, sorted list so engine and oracle agree on the exact stop set
STOPWORDS_SORTED = sorted(ENGLISH_STOP_WORDS)


def lang_id_heuristic(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_stop, stop_ratio, is_en_guess): English detection by
    stopword density (the classic cheap n-gram/stopword LID baseline)."""
    t = tokens(docs, id_col=id_col)
    agg = t.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(
            F.when(F.col("term").isin(STOPWORDS_SORTED), 1).otherwise(0)
        ).alias("n_stop"),
    )
    ratio = F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        "n_stop",
        F.round(ratio, 4).alias("stop_ratio"),
        (ratio >= 0.02).alias("is_en_guess"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_unique, ttr, mean_token_len): length/diversity
    quality features (the pre-training corpus filter basics)."""
    t = tokens(docs, id_col=id_col)
    return t.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_unique"),
        F.round(
            F.countDistinct("term").cast("double") / F.count("*").cast("double"), 4
        ).alias("ttr"),
        F.round(
            F.sum(F.length("term")).cast("double") / F.count("*").cast("double"), 4
        ).alias("mean_token_len"),
    )


def doc_fingerprints(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): min 32-bit hash over word n-gram shingles —
    winnowing-style content fingerprint (one value per doc)."""
    sh = shingles(docs, n=n, id_col=id_col)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    return sh.groupBy(id_col).agg(F.min(h).alias("fingerprint"))


def length_percentiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus length distribution: doc count, mean token count,
    and exact p25/p50/p75 of the per-doc token counts (linear-interpolated
    percentiles — Spark's exact ``percentile``, matching SQL
    ``quantile_cont``). The curation dashboard row behind sequence-length
    budgeting. Token counting is map-only (filtered split array size, no
    explode); the aggregate is one single-row reduction — at 100 TB this is
    a scan plus a scalar combine, no shuffle of the token stream."""
    from .dedup import _token_array

    dl = F.size(_token_array(text_col)).cast("long")
    d = docs.select(dl.alias("dl"))
    return d.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dl"), 4).alias("mean_len"),
        F.round(F.percentile("dl", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("dl", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("dl", F.lit(0.75)), 4).alias("p75"),
    )


def lm_doc_logprob(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, lp): mean unigram log-probability of the doc's tokens under the
    corpus's own unigram model — the cheap LM-quality score (docs of
    unusually low mean logprob are gibberish/rare-token spam; the
    KenLM-perplexity-filter baseline with a unigram model).

    lp(doc) = Σ_tokens ln(ttf(term) / total_tokens) / n_tokens(doc).

    Shape: one groupBy(term) builds the model, one join token-stream ⋈
    model, one groupBy(doc). At 100 TB the model table is precomputed once
    per corpus snapshot and the join key (term) is Zipf-skewed — broadcast
    the model's hot head (or let AQE skew-split); here the whole model is a
    regular shuffle join at test scale."""
    t = tokens(docs, id_col=id_col)
    model = t.groupBy("term").agg(F.count("*").alias("ttf"))
    total = float(model.agg(F.sum("ttf")).collect()[0][0] or 1)
    lp_tok = F.log(F.col("ttf").cast("double") / F.lit(total))
    return (
        t.join(model, "term")
        .groupBy(id_col)
        .agg((F.sum(lp_tok) / F.count("*")).alias("lp"))
    )


def source_stats(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source corpus rollup — the curation table behind training-mixture
    weights (how much of each domain/source goes into the mix): doc count,
    total chars, total simple-analyzer tokens, and mean doc length. One
    map-side-combinable aggregation over map-only token counting (token
    count = size of the filtered split array, no explode) — at 100 TB this
    is a single shuffle of ~|sources| rows."""
    from .dedup import _token_array

    n_toks = F.size(_token_array(text_col))
    return docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.sum(n_toks.cast("long")).alias("total_tokens"),
        (F.sum(n_toks.cast("long")) / F.count("*")).alias("mean_tokens"),
    )
