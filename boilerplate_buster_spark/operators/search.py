"""Inverted-index construction and conjunctive term search - the
retrieval primitive a corpus-curation stack needs next to dedup and
quality scoring (targeted corpus probes: "which documents mention all of
these terms", contamination spot-checks, seed-set bootstrapping).

Scale posture: the index build is one explode + one (term, doc)
aggregation - a single shuffle keyed by the term/doc pair, no windows,
no collects.  A search touches only the postings of its query terms
(a literal IN-list the scanner prunes with), so query cost is bounded
by the posting sizes, never the corpus; per-term document frequencies
are query-terms-sized and broadcast.  Scoring is integer tf-idf
(idf_e6 = (n_docs * 1e6) div df) so SQL oracles reproduce it
bit-for-bit - no floats, no logs (transcendentals are not cross-engine
stable; the integer surface carries the same ranking information for
equal-length conjunctive queries).

No reference anchor: the reference (corpus_miner.cpp) mines phrases but
has no retrieval surface; this mirrors standard postings practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(term, doc_id, tf): one posting row per (term, document) with the
    within-document term frequency.  One explode + one hash aggregation;
    the natural persisted/bucketed artifact for repeated searches."""
    # id kept as-is: a cast("long") here blows up under ANSI for string
    # ids (URLs) - and only looked safe in tests because a pushed-down
    # term filter can hide the cast from every row
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def term_stats(index: DataFrame) -> DataFrame:
    """(term, df, total_tf): per-term document frequency and collection
    frequency over a posting table from :func:`inverted_index` (postings
    are already distinct per (term, doc), so df is a plain count)."""
    return index.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )


def bm25_search(
    index: DataFrame,
    doc_lens: DataFrame,
    terms: list[str],
    n_docs: int,
    total_tokens: int,
    require_all: bool = False,
    k1_e3: int = 1200,
    b_e3: int = 750,
) -> DataFrame:
    """(doc_id, n_hit, score_e3): Okapi BM25 ranking over the posting
    table, as an EXACT integer surface (Robertson & Walker's formula with
    the idf log dropped - transcendentals are not cross-engine stable, the
    same documented deviation as `search_terms`'s tf-idf):

      idf_e3      = ((N - df) * 2000 + 1000) div (2*df + 1)
                    [= 1e3 * (N - df + 0.5) / (df + 0.5), the rational core
                     of BM25's idf, floored]
      L_e6        = (dl * 1e6 * N) div total_tokens           [dl / avgdl]
      den_e6      = tf*1e6 + (k1_e3 * (1e6 - b_e3*1e3
                              + (b_e3*1e3 * L_e6) div 1e6)) div 1e3
      term score  = (idf_e3 * tf * (k1_e3 + 1000))
                      div greatest(den_e6 div 1000, 1)        [e3-scaled]
      score_e3    = sum over matched query terms

    Defaults k1=1.2, b=0.75 (the standard constants, carried in exact
    milli-units).  int64 headroom: safe while N * max(tf) <= ~4e12 and
    N * max(dl) <= ~9e12 - true for any per-shard index this would run on.

    `doc_lens` is (doc_id, dl) - a pure projection of the corpus (token
    count per doc), so its side of the doc_id join is scan-pipelined;
    the postings side is pruned to the query terms' postings by the
    IN-list, so AQE can flip the join to broadcast when the query is
    selective.  df is recomputed from the pruned postings (query-sized,
    broadcast), exactly as `search_terms` does."""
    qterms = sorted(set(terms))
    t = index.filter(F.col("term").isin(qterms))
    df_t = t.groupBy("term").agg(F.count("*").alias("df"))
    n, tot = int(n_docs), int(total_tokens)
    k1, b1000 = int(k1_e3), int(b_e3) * 1000
    idf_e3 = f"((({n} - df) * 2000 + 1000) div (2 * df + 1))"
    # dl is typically size()-derived int32: cast before the e6 scale-up
    # (int32 * int32 overflows under ANSI - same pitfall as search_terms)
    l_e6 = f"((cast(dl AS bigint) * {1000000 * n}) div {max(tot, 1)})"
    den_e6 = (
        f"(tf * 1000000 + ({k1} * (1000000 - {b1000}"
        f" + ({b1000} * {l_e6}) div 1000000)) div 1000)"
    )
    scored = (
        t.join(F.broadcast(df_t), "term")
        .join(doc_lens, "doc_id")
        .withColumn(
            "w",
            F.expr(
                f"({idf_e3} * tf * ({k1} + 1000))"
                f" div greatest({den_e6} div 1000, 1)"
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_hit"),
        F.sum("w").alias("score_e3"),
    )
    if require_all:
        agg = agg.filter(F.col("n_hit") == len(qterms))
    return agg


def search_terms(
    index: DataFrame,
    terms: list[str],
    n_docs: int,
    require_all: bool = True,
) -> DataFrame:
    """(doc_id, n_hit, score_e6): documents matching the query terms,
    scored by integer tf-idf: score_e6 = sum(tf * idf_e6) with
    idf_e6 = (n_docs * 1e6) div df.  ``require_all`` keeps only
    documents containing every query term (conjunctive AND); otherwise
    any-term (OR) with n_hit = number of distinct query terms present.

    The IN-list filter prunes the index scan to the query terms'
    postings; df is recomputed from those same postings (query-sized)
    and broadcast, so the only corpus-sized shuffle is the final per-doc
    aggregate over matching postings."""
    qterms = sorted(set(terms))
    t = index.filter(F.col("term").isin(qterms))
    df_t = t.groupBy("term").agg(F.count("*").alias("df"))
    # the idf numerator is precomputed in Python: an inline `N * 1000000`
    # would be int32 * int32 and overflow under ANSI for corpora > ~2k docs
    scored = t.join(F.broadcast(df_t), "term").withColumn(
        "w", F.expr(f"tf * ({int(n_docs) * 1000000} div df)")
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_hit"),  # postings are distinct per (term, doc)
        F.sum("w").alias("score_e6"),
    )
    if require_all:
        agg = agg.filter(F.col("n_hit") == len(qterms))
    return agg


def positional_index(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(term, doc_id, pos): positional postings (0-based token offsets) -
    the index shape exact-phrase and proximity queries need.  One
    posexplode in the scan; the (term, doc, pos) stream shuffles once if
    persisted bucketed-by-term (sinks.write_bucketed)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col).alias("pos", "term"),
    ).select("term", "doc_id", "pos")


def phrase_search(
    index: DataFrame, phrase: list[str]
) -> DataFrame:
    """(doc_id, n_matches, first_pos): documents containing the EXACT
    consecutive phrase, with occurrence count and first hit offset.
    Implementation is the classic positional-join: postings of word k
    must sit at pos0 + k; every join is pruned to the phrase's own
    postings by the IN-list first, and joins key on (doc_id, pos) -
    matched-rows-bounded, never corpus-bounded."""
    if not phrase:
        raise ValueError("empty phrase")
    terms = list(phrase)
    base = (
        index.filter(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("pos0"))
    )
    for k, t in enumerate(terms[1:], start=1):
        nxt = index.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - k).alias("pos0")
        )
        base = base.join(nxt, ["doc_id", "pos0"])
    return base.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.min("pos0").alias("first_pos"),
    ).select(
        "doc_id",
        F.col("n_matches").cast("long"),
        F.col("first_pos").cast("long"),
    )


def proximity_search(
    index: DataFrame, term_a: str, term_b: str, window: int = 5
) -> DataFrame:
    """(doc_id, n_pairs, min_dist): documents where `term_a` and `term_b`
    occur within `window` token positions (either order), with the pair
    count and the closest distance - the NEAR operator of classic IR.
    Same positional-join economics as phrase_search: both posting sets
    are IN-list-pruned before the (doc-keyed) join; the join output is
    bounded by per-doc occurrence products of TWO terms, never corpus."""
    a = index.filter(F.col("term") == term_a).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = index.filter(F.col("term") == term_b).select(
        "doc_id", F.col("pos").alias("pb")
    )
    pairs = a.join(b, "doc_id").filter(
        F.expr(f"abs(pa - pb) <= {int(window)} AND pa != pb")
    )
    return pairs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("min(abs(pa - pb))").cast("long").alias("min_dist"),
    )
