"""End-to-end Spark BloomSpan miner vs the golden fixture outputs and the
pure-Python oracle on randomized corpora."""

from __future__ import annotations

import random

from boilerplate_buster_spark.core import pyref
from boilerplate_buster_spark.core.tokenize import tokenize
from boilerplate_buster_spark.functions.tokenizer import tokens
from boilerplate_buster_spark.operators import bloomspan

from .conftest import REF_TESTS, load_dir_corpus_text
from .test_pyref_golden import TEST1_GOLDEN


def corpus_df(spark, corpus_name):
    named = load_dir_corpus_text(REF_TESTS / corpus_name)
    df = spark.createDataFrame(named, ["doc_id", "text"])
    return df.select("doc_id", tokens("text").alias("tokens"))


def test_spark_bloomspan_test1(spark):
    out = bloomspan.mine_df(
        spark, corpus_df(spark, "test1"), min_docs=3, ngrams=3
    ).collect()
    assert [(r["phrase"], r["freq"], r["length"]) for r in out] == TEST1_GOLDEN
    # canonical example docs: first 2 of the sorted doc set
    assert out[0]["example_docs"] == ["doc_01.txt", "doc_02.txt"]


def test_spark_bloomspan_supersimple(spark):
    out = bloomspan.mine_df(
        spark, corpus_df(spark, "test-supersimple"), min_docs=2, ngrams=2
    ).collect()
    assert [(r["phrase"], r["freq"], r["length"]) for r in out] == [
        ("f a c e", 2, 4),
        ("f l f", 2, 3),
    ]


def test_spark_bloomspan_utf8_utf16_equal(spark):
    rows = {}
    for c in ("test-utf8", "test-utf16"):
        out = bloomspan.mine_df(spark, corpus_df(spark, c), min_docs=3, ngrams=3)
        rows[c] = [(r["phrase"], r["freq"], r["length"]) for r in out.collect()]
    assert rows["test-utf8"] == rows["test-utf16"]
    assert any("Внимание" in r[0] for r in rows["test-utf8"])


def test_spark_window_retry(spark):
    """W smaller than the longest phrase must transparently re-gather."""
    out = bloomspan.mine_df(
        spark, corpus_df(spark, "test1"), min_docs=3, ngrams=3, window=8
    ).collect()
    assert [(r["phrase"], r["freq"], r["length"]) for r in out] == TEST1_GOLDEN


def test_spark_matches_pyref_randomized(spark):
    """Property: Spark miner == pure-Python oracle on seeded random corpora."""
    for seed in (5, 6, 7):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(15)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 40)))
            for _ in range(20)
        ]
        docs = [tokenize(t) for t in texts]
        want = {
            (p.text, p.support, len(p.tokens))
            for p in pyref.bloomspan_mine(docs, min_docs=3, ngrams=2)
        }
        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"]
        ).select("doc_id", tokens("text").alias("tokens"))
        got = {
            (r["phrase"], r["freq"], r["length"])
            for r in bloomspan.mine_df(spark, df, min_docs=3, ngrams=2).collect()
        }
        assert got == want, f"seed={seed}"


def test_driver_and_distributed_strategies_equal(spark):
    """Both execution strategies must produce identical phrase sets."""
    import random

    from boilerplate_buster_spark.operators.bloomspan import mine

    for corpus, (md, n) in {"test1": (3, 3), "test-supersimple": (2, 2)}.items():
        df = corpus_df(spark, corpus)
        a = {(p.text, p.support, len(p.tokens))
             for p in mine(spark, df, min_docs=md, ngrams=n, strategy="driver")}
        b = {(p.text, p.support, len(p.tokens))
             for p in mine(spark, df, min_docs=md, ngrams=n, strategy="distributed")}
        assert a == b, corpus

    rng = random.Random(99)
    vocab = [f"t{j}" for j in range(12)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 35)))
             for _ in range(25)]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).select("doc_id", tokens("text").alias("tokens"))
    a = {(p.text, p.support, len(p.tokens))
         for p in mine(spark, df, min_docs=3, ngrams=2, strategy="driver")}
    b = {(p.text, p.support, len(p.tokens))
         for p in mine(spark, df, min_docs=3, ngrams=2, strategy="distributed")}
    assert a == b
