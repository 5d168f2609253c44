"""Spark-native BIDE/CloSpan (level-wise closed contiguous patterns) vs the
pure-Python reference kernel and the observed fixture goldens."""

from __future__ import annotations

import random

from boilerplate_buster_spark.core import pyref
from boilerplate_buster_spark.core.tokenize import tokenize
from boilerplate_buster_spark.functions.tokenizer import tokens
from boilerplate_buster_spark.operators.closed_patterns import (
    closed_contiguous_patterns,
)

from .conftest import REF_TESTS, load_dir_corpus_text


def corpus_df(spark, corpus_name):
    named = load_dir_corpus_text(REF_TESTS / corpus_name)
    return spark.createDataFrame(named, ["doc_id", "text"]).select(
        "doc_id", tokens("text").alias("tokens")
    )


def test_spark_bide_test1_golden(spark):
    out = closed_contiguous_patterns(
        spark, corpus_df(spark, "test1"), min_sup=3, min_l=3
    ).collect()
    rows = {(r["phrase"], r["freq"], r["length"]) for r in out}
    # FIXTURES.md 3a: occurrence-count support (doc_04 dup counts twice)
    assert ("this document is intended only for the use of", 7, 9) in rows
    assert (
        "this document is intended only for the use of the individual or "
        "entity to which it is addressed",
        6,
        18,
    ) in rows
    assert ("standard operating procedure", 3, 3) in rows
    assert len(rows) == 5


def test_spark_bide_matches_pyref_randomized(spark):
    for seed in (21, 22, 23):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(10)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 25)))
            for _ in range(15)
        ]
        docs = [tokenize(t) for t in texts]
        want = {
            (p.text, p.support, len(p.tokens))
            for p in pyref.bide_mine(docs, min_docs=3, min_l=2)
        }
        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"]
        ).select("doc_id", tokens("text").alias("tokens"))
        got = {
            (r["phrase"], r["freq"], r["length"])
            for r in closed_contiguous_patterns(spark, df, min_sup=3, min_l=2).collect()
        }
        assert got == want, f"seed={seed}"


def test_spark_bide_short_and_empty(spark):
    df = spark.createDataFrame([("a", ["x"]), ("b", [])], ["doc_id", "tokens"])
    assert closed_contiguous_patterns(spark, df, min_sup=2).count() == 0
    df2 = spark.createDataFrame([("a", ["x"]), ("b", ["x"])], ["doc_id", "tokens"])
    rows = closed_contiguous_patterns(spark, df2, min_sup=2).collect()
    assert [(r["phrase"], r["freq"], r["length"]) for r in rows] == [("x", 2, 1)]
