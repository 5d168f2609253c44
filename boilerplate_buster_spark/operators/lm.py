"""Corpus-trained n-gram language-model scoring - the CCNet-style
perplexity quality filter (Wenzek et al. 2020 use a pretrained KenLM; here
the LM is trained ON the corpus itself with one aggregation, the fully
distributed analog).

Model: add-one-smoothed bigram LM,

    P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)

with c() corpus-wide counts and V the corpus vocabulary size.  Scoring
emits, per document:

  * ``log2_ppl``  - the standard metric: 2 ** (mean negative log2
    bigram probability).  Transcendental, so NOT oracle-compared
    bit-for-bit (libm log differs across engines in the last ulp);
  * ``lik_e6``    - mean of (1e6 * (c(bigram)+1)) div (c(prev)+V),
    ALL-INTEGER: the same ranking signal in exact arithmetic, which a SQL
    oracle reproduces bit-for-bit.  (Monotone per-bigram in P; the mean of
    scaled probabilities ranks near-identically to perplexity for
    filtering purposes.)

Scale posture: training = two hash-aggregates over the corpus (bigram
counts, unigram counts) - the model is CORPUS-SIZED, so scoring joins on
the gram key with sort-merge/AQE (the model table is NOT broadcast; a
pretrained-model variant with a small vocabulary would broadcast instead).
Docs with < 2 tokens score NULL log2_ppl / 0 lik_e6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_expr(tokens_col: str) -> str:
    t = tokens_col
    return (
        f"transform(slice(sequence(1, greatest(size({t}) - 1, 1)), "
        f"1, greatest(size({t}) - 1, 0)), "
        f"i -> struct(element_at({t}, i) AS prev, "
        f"array_join(slice({t}, i, 2), ' ') AS big))"
    )


def train_bigram_counts(
    docs: DataFrame, tokens_col: str = "tokens"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(big, cb), unigram_counts(prev, cu), V): corpus-wide
    OCCURRENCE counts (not doc-distinct - LM counts every token) and the
    vocabulary size."""
    pairs = docs.select(F.explode(F.expr(_bigram_expr(tokens_col))).alias("p"))
    bigrams = pairs.groupBy(F.col("p.big").alias("big")).agg(
        F.count("*").alias("cb")
    )
    # Cache the unigram aggregate: it feeds BOTH the V-count action here and
    # the scoring join later - without the cache the full corpus explode+agg
    # runs twice (round-4 verdict item).
    unigrams = (
        docs.select(F.explode(tokens_col).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
        .persist()
    )
    vocab = unigrams.count()
    return bigrams, unigrams.select(F.col("w").alias("prev"), "cu"), vocab


def score_docs(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_bigrams, lik_e6, log2_ppl): per-document LM score under the
    trained counts (see module docstring).  Unseen bigrams/contexts get the
    add-one floor.  Exactly one shuffle join per count table (gram-keyed,
    uniform) + the per-doc aggregate."""
    # Pre-aggregate occurrences per (doc, prev, big) BEFORE the model joins:
    # both joins then carry one row per DISTINCT per-doc bigram instead of one
    # row per token position, shrinking the two gram-keyed shuffles by the
    # within-doc repetition factor (same trick as lines.line_doc_freq).  The
    # weighted mean below is integer-exact and identical to the per-occurrence
    # formulation.
    occ = (
        docs.select(
            F.col(id_col), F.explode(F.expr(_bigram_expr(tokens_col))).alias("p")
        )
        .select(
            id_col, F.col("p.prev").alias("prev"), F.col("p.big").alias("big")
        )
        .groupBy(id_col, "prev", "big")
        .agg(F.count("*").alias("k"))
    )
    joined = (
        occ.join(bigrams, "big", "left")
        .join(unigrams, "prev", "left")
        .select(
            F.col(id_col),
            F.col("k"),
            (F.coalesce("cb", F.lit(0)) + 1).alias("num"),
            (F.coalesce("cu", F.lit(0)) + vocab).alias("den"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.expr("sum(k)").alias("n_bigrams"),
        F.expr(
            "CAST(sum(k * ((1000000 * num) div den)) div sum(k) AS bigint)"
        ).alias("lik_e6"),
        F.expr(
            "pow(2.0, sum(k * -log2(num / CAST(den AS double))) / sum(k))"
        ).alias("log2_ppl"),
    )
    base = docs.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("lik_e6", F.lit(0)).alias("lik_e6"),
        F.col("log2_ppl"),
    )


def lm_quality_scores(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Train-on-corpus + score in one call (the self-supervised filter:
    documents whose token transitions are atypical FOR THIS CORPUS score
    low lik_e6 / high perplexity)."""
    bigrams, unigrams, vocab = train_bigram_counts(docs, tokens_col)
    return score_docs(docs, bigrams, unigrams, vocab, id_col, tokens_col)
