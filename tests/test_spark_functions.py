"""Expression-level parity: the JVM-side tokenizer / n-gram builders must
match the pure-Python reference-exact kernels on every fixture doc and on
adversarial strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from boilerplate_buster_spark.core import pyref
from boilerplate_buster_spark.core.tokenize import tokenize
from boilerplate_buster_spark.functions.ngrams import explode_ngrams, ngram_structs
from boilerplate_buster_spark.functions.tokenizer import tokens

from .conftest import REF_TESTS, load_dir_corpus_text

ADVERSARIAL = [
    "",
    "   ",
    "...",
    "e-mail",
    "test-user@example.com. Phone: +1(234)567-89-00.",
    "UPPER lower MiXeD 123abc",
    "Внимание: данный Файл! ёЁ",
    "汉字テストMIXEDтекст42",
    "a\tb\nc\rd",
    "x" * 500,
    "emoji \U0001f600 pair",  # astral codepoint (surrogate pair in JVM)
]


def all_fixture_texts():
    out = list(ADVERSARIAL)
    for corpus in ("test1", "test-supersimple", "test-utf8", "test-utf16"):
        out += [t for _, t in load_dir_corpus_text(REF_TESTS / corpus)]
    return out


def test_expression_tokenizer_matches_python(spark):
    texts = all_fixture_texts()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize(t), repr(t[:60])


def test_ngram_structs_positions(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c", "d"])], ["doc_id", "tokens"])
    rows = explode_ngrams(df, 2).orderBy("pos").collect()
    assert [(r["pos"], r["gram"]) for r in rows] == [
        (0, "a b"),
        (1, "b c"),
        (2, "c d"),
    ]


def test_ngram_short_doc_safe(spark):
    # len < n must produce ZERO grams (guard against descending sequence()).
    df = spark.createDataFrame(
        [(1, ["a"]), (2, []), (3, ["a", "b", "c"])], ["doc_id", "tokens"]
    )
    rows = explode_ngrams(df, 3).collect()
    assert len(rows) == 1 and rows[0]["gram"] == "a b c"
    # and the struct builder itself returns an empty array
    n = df.select(F.size(ngram_structs("tokens", 3)).alias("s")).collect()
    assert sorted(r["s"] for r in n) == [0, 0, 1]


def test_ngrams_match_pyref_on_fixture(spark):
    docs = [tokenize(t) for _, t in load_dir_corpus_text(REF_TESTS / "test1")]
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "tokens"])
    got = {
        (r["doc_id"], r["pos"]): r["gram"] for r in explode_ngrams(df, 3).collect()
    }
    want = {}
    for gram, _, occs in pyref.ngram_candidates(docs, 3, 1):
        for d, p in occs:
            want[(d, p)] = " ".join(gram)
    assert got == want


def test_bpe_token_count_matches_python_re(spark):
    import re

    from boilerplate_buster_spark.operators import text_stats

    texts = [
        "Hello, world! It's 2024.",
        "foo-bar   baz 123",
        "no punct here",
        "...",
        "a",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bpeish"], r["n_ws"])
        for r in text_stats.bpe_token_count(docs).collect()
    }
    pat = re.compile(text_stats.BPE_PATTERN)
    for i, t in enumerate(texts):
        assert got[i] == (len(pat.findall(t)), len(t.split())), t
