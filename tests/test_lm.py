"""Bigram-LM quality scoring: hand-computed counts, smoothing floor for
unseen transitions, short-doc boundary, integer surface exactness."""

import math

from boilerplate_buster_spark.operators.lm import (
    lm_quality_scores,
    score_docs,
    train_bigram_counts,
)


def test_train_counts_and_vocab(spark):
    docs = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["a", "b"])], ["doc_id", "tokens"]
    )
    bigrams, unigrams, v = train_bigram_counts(docs)
    bg = {r["big"]: r["cb"] for r in bigrams.collect()}
    ug = {r["prev"]: r["cu"] for r in unigrams.collect()}
    assert bg == {"a b": 2, "b a": 1}
    assert ug == {"a": 3, "b": 2}
    assert v == 2


def test_score_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["a", "b"]), (3, ["zzz"])],
        ["doc_id", "tokens"],
    )
    out = {r["doc_id"]: r for r in lm_quality_scores(docs).collect()}
    # vocab = 3 (a, b, zzz); counts: "a b":2 "b a":1; cu: a:3 b:2 zzz:1
    # doc1 bigrams: (a b): (2+1)/(3+3), (b a): (1+1)/(2+3)
    lik1 = ((1000000 * 3) // 6 + (1000000 * 2) // 5) // 2
    assert out[1]["lik_e6"] == lik1
    ppl1 = 2 ** (-(math.log2(3 / 6) + math.log2(2 / 5)) / 2)
    assert abs(out[1]["log2_ppl"] - ppl1) < 1e-9
    # doc3: single token -> no bigrams -> zeroed integer surface, NULL ppl
    assert out[3]["n_bigrams"] == 0 and out[3]["lik_e6"] == 0
    assert out[3]["log2_ppl"] is None


def test_unseen_transitions_get_floor(spark):
    train = spark.createDataFrame([(1, ["a", "b"])], ["doc_id", "tokens"])
    bigrams, unigrams, v = train_bigram_counts(train)
    test = spark.createDataFrame([(9, ["b", "a"])], ["doc_id", "tokens"])
    r = score_docs(test, bigrams, unigrams, v).collect()[0]
    # "b a" unseen: num=1; prev "b" cu=1, den=1+2=3
    assert r["lik_e6"] == (1000000 * 1) // 3
