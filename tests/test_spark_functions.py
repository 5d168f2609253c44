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


def test_fold_punctuation(spark):
    from boilerplate_buster_spark.operators.text_stats import fold_punctuation

    df = spark.createDataFrame(
        [(1, "a‘b’c “d” e–f—g h…i　j")],
        ["doc_id", "text"],
    )
    got = fold_punctuation(df).collect()[0]["folded"]
    assert got == "a'b'c \"d\" e-f-g h.i j"


def test_extraction_eval_prf(spark):
    from boilerplate_buster_spark.operators.text_stats import extraction_eval

    df = spark.createDataFrame(
        [
            # gold 4 tokens; extracted misses 'd', adds 'x' twice, repeats 'a'
            (1, "a a x b x", "a b c d"),
            # perfect extraction
            (2, "p q", "p q"),
            # nothing extracted overlaps
            (3, "zz", "a b"),
        ],
        ["doc_id", "extracted", "gold"],
    )
    got = {r["doc_id"]: r for r in extraction_eval(df).collect()}
    r1 = got[1]
    # common multiset: min counts -> a:1, b:1 => 2
    assert r1["n_ext"] == 5 and r1["n_gold"] == 4 and r1["n_common"] == 2
    assert r1["p_e6"] == 400_000 and r1["r_e6"] == 500_000
    assert r1["f1_e6"] == 2_000_000 * 2 // 9
    r2 = got[2]
    assert r2["p_e6"] == r2["r_e6"] == r2["f1_e6"] == 1_000_000
    r3 = got[3]
    assert r3["n_common"] == 0 and r3["f1_e6"] == 0


def test_split_sentences_rules(spark):
    from boilerplate_buster_spark.operators.text_stats import split_sentences

    docs = spark.createDataFrame(
        [
            (0, "one two. three! four? five"),
            (1, "no terminators"),
            (2, "ellipsis... still splits. end."),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    got = {}
    for r in split_sentences(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["sentence"], r["n_words"]))
    assert got[0] == [("one two.", 2), ("three!", 1), ("four?", 1), ("five", 1)]
    assert got[1] == [("no terminators", 2)]
    # a terminator RUN stays one boundary; trailing terminator needs no space
    assert got[2] == [("ellipsis...", 1), ("still splits.", 2), ("end.", 1)]
    assert got[3] == [("", 0)]


def test_readability_integer_surface(spark):
    from boilerplate_buster_spark.operators.text_stats import readability

    docs = spark.createDataFrame(
        [(0, "the cat sat. the dog ran. happy end")], ["doc_id", "text"]
    )
    r = readability(docs).collect()[0]
    # W=8, S=2 terminator runs, syllables: vowel groups
    assert (r["n_words"], r["n_sentences"]) == (8, 2)
    syl = r["n_syllables"]
    assert r["fre_e3"] == 206835 - (1015 * 8) // 2 - (84600 * syl) // 8


def _winnow_py(tokens, k=4, w=5):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    hs = [h60(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)]
    out = set()
    for j in range(len(hs) - w + 1):
        m = min(hs[j : j + w])
        pos = max(i for i in range(j, j + w) if hs[i] == m)
        out.add((pos, m))
    return out


def test_winnow_fingerprints_matches_python(spark):
    from boilerplate_buster_spark.operators.text_stats import (
        winnow_fingerprints,
    )

    rows = [
        (0, ("the quick brown fox jumps over the lazy dog again and "
             "again the quick brown fox returns").split()),
        (1, "too short".split()),
        (2, ("aaa bbb aaa bbb aaa bbb aaa bbb ccc").split()),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "tokens"])
    got = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, toks in rows:
        want = _winnow_py(toks)
        assert got.get(i, set()) == want, i
    assert 1 not in got  # shorter than k + w - 1 -> no full window


def test_winnow_shared_fingerprint_on_common_run(spark):
    # the winnowing guarantee: matches of length >= w + k - 1 (= 8)
    # tokens share at least one fingerprint
    from boilerplate_buster_spark.operators.text_stats import (
        winnow_fingerprints,
    )

    common = "one two three four five six seven eight".split()
    rows = [
        (0, "x y z".split() + common + "p q".split()),
        (1, "m n".split() + common + "r s t u".split()),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "tokens"])
    fps = {}
    for r in winnow_fingerprints(docs).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]


def test_exact_percentiles_nearest_rank(spark):
    from boilerplate_buster_spark.operators.corpus_stats import (
        exact_percentiles,
    )

    vals = [5, 1, 3, 2, 4, 2, 2, 9, 7, 6]  # sorted: 1 2 2 2 3 4 5 6 7 9
    docs = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["p"]: r["value"]
        for r in exact_percentiles(docs, "v", [10, 25, 50, 90, 100]).collect()
    }
    import math

    s = sorted(vals)
    want = {p: s[max(1, math.ceil(p * len(s) / 100)) - 1] for p in got}
    assert got == want == {10: 1, 25: 2, 50: 3, 90: 7, 100: 9}


def test_doc_keywords_idf_favors_rare_terms(spark):
    from boilerplate_buster_spark.operators.corpus_stats import doc_keywords

    docs = spark.createDataFrame(
        [
            (1, ["common", "rare1", "common"]),
            (2, ["common", "rare2"]),
        ],
        ["doc_id", "tokens"],
    )
    got = {(r.doc_id, r.rank): (r.term, r.tfidf_e6)
           for r in doc_keywords(docs, n_docs=2, k=2).collect()}
    # doc 1: common tf=2 * idf 1e6 TIES rare1 tf=1 * idf 2e6 -> lex order
    assert got[(1, 1)] == ("common", 2_000_000)
    assert got[(1, 2)] == ("rare1", 2_000_000)
    # doc 2: rare2 (tf=1, idf 2e6) outranks common (tf=1, idf 1e6)
    assert got[(2, 1)] == ("rare2", 2_000_000)
    assert got[(2, 2)] == ("common", 1_000_000)


def test_quality_percentiles_strict_below_ties_share(spark):
    from boilerplate_buster_spark.operators.corpus_stats import (
        quality_percentiles,
    )
    from pyspark.sql import functions as F

    s = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30), (5, 40)],
        ["doc_id", "quality_e6"],
    )
    got = {r.doc_id: r.pct_rank_e6 for r in quality_percentiles(s).collect()}
    # n=5: below-counts 0,0,2,3,4 -> /4
    assert got[1] == got[2] == 0
    assert got[3] == 500_000 and got[4] == 750_000 and got[5] == 1_000_000


def test_skew_report_hand_computed(spark):
    from boilerplate_buster_spark.functions.skew import skew_report

    df = spark.createDataFrame(
        [(k,) for k in ["hot"] * 6 + ["warm"] * 3 + ["a", "b", "c"]],
        ["key"],
    )
    rows = {r.rank: r for r in skew_report(df, "key", top_k=2).collect()}
    h = rows[1]
    assert (h.key, h.cnt, h.total_rows, h.n_keys) == ("hot", 6, 12, 5)
    assert h.share_e6 == 500_000          # 6/12
    assert h.skew_e6 == 2_500_000          # 6*5/12 -> 2.5x uniform
    assert rows[2].key == "warm"
    # uniform data reads ~1e6
    uni = spark.createDataFrame([(k,) for k in "abcd" * 5], ["key"])
    [r] = skew_report(uni, "key", top_k=1).collect()
    assert r.skew_e6 == 1_000_000


def test_topic_boundaries_detects_vocabulary_shift(spark):
    from boilerplate_buster_spark.operators.text_stats import (
        topic_boundaries,
    )

    # two tiles of topic A, two of topic B: the A|B gap scores 0
    doc = (["cat dog fish bird"] * 2 + ["car road fuel wheel"] * 2)
    tokens = " ".join(doc).split(" ")
    df = spark.createDataFrame([(1, tokens)], ["doc_id", "tokens"])
    got = {r.gap_idx: (r.n_shared, r.jaccard_e6)
           for r in topic_boundaries(df, block=4).collect()}
    assert got[1] == (4, 1_000_000)   # A|A: identical tiles
    assert got[2] == (0, 0)           # A|B: the topic boundary
    assert got[3] == (4, 1_000_000)   # B|B
    # short doc (< 2 tiles) emits no gaps and doesn't crash
    one = spark.createDataFrame([(2, ["only", "three", "words"])],
                                ["doc_id", "tokens"])
    assert topic_boundaries(one, block=4).count() == 0


def test_novelty_scores_leave_one_out(spark):
    from boilerplate_buster_spark.operators.corpus_stats import novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "a b c d".split()),   # grams: 'a b c', 'b c d'
            (2, "a b c x".split()),   # shares 'a b c'
            (3, "q r s t".split()),   # fully novel
        ],
        ["doc_id", "tokens"],
    )
    got = {r.doc_id: (r.n_grams, r.n_unique_to_doc, r.novelty_e6)
           for r in novelty_scores(docs, n=3).collect()}
    assert got[1] == (2, 1, 500_000)     # 'b c d' unique, 'a b c' shared
    assert got[2] == (2, 1, 500_000)
    assert got[3] == (2, 2, 1_000_000)


def test_vocab_stats_hapax_and_ttr(spark):
    from boilerplate_buster_spark.operators.corpus_stats import vocab_stats

    docs = spark.createDataFrame(
        [("web", "a a b".split()), ("web", ["c"]), ("code", "x y".split())],
        ["source", "tokens"],
    )
    got = {r.source: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_e6, r.hapax_e6)
           for r in vocab_stats(docs, "source").collect()}
    # web: tokens a,a,b,c -> types {a,b,c}, hapax {b,c}
    assert got["web"] == (4, 3, 2, 750_000, 666_666)
    assert got["code"] == (2, 2, 2, 1_000_000, 1_000_000)


def test_word_dropout_deterministic_and_tagged(spark):
    from boilerplate_buster_spark.operators.augment import word_dropout

    docs = spark.createDataFrame(
        [(1, [f"w{i}" for i in range(200)])], ["doc_id", "tokens"]
    )
    a = word_dropout(docs, rate_e6=100000).collect()[0]
    b = word_dropout(docs, rate_e6=100000).collect()[0]
    assert (a.n_dropped, a.aug_text) == (b.n_dropped, b.aug_text)  # reproducible
    # the empirical rate lands near 10% on 200 coins
    assert 5 <= a.n_dropped <= 40
    # a different tag draws an INDEPENDENT corruption
    c = word_dropout(docs, rate_e6=100000, tag="wd2").collect()[0]
    assert c.aug_text != a.aug_text
    # rate 0 keeps everything; rate 1e6 drops everything
    z = word_dropout(docs, rate_e6=0).collect()[0]
    assert z.n_dropped == 0
    f = word_dropout(docs, rate_e6=1000000).collect()[0]
    assert f.n_dropped == 200 and f.aug_text == ""


def test_span_infilling_runs_merge_and_count(spark):
    from boilerplate_buster_spark.operators.augment import span_infilling

    docs = spark.createDataFrame(
        [(1, [f"w{i}" for i in range(300)])], ["doc_id", "tokens"]
    )
    r = span_infilling(docs, span=3, rate_e6=80000).collect()[0]
    toks = r.corrupted.split(" ")
    # exactly one <mask> per maximal run, never two adjacent
    assert toks.count("<mask>") == r.n_spans
    assert all(not (a == b == "<mask>") for a, b in zip(toks, toks[1:]))
    # token conservation: kept + masked = total
    assert (r.n_tokens - r.n_masked) + r.n_spans == len(toks)
    # every span covers at least `span` tokens unless truncated at the
    # end, so n_masked >= n_spans (strict when any full span exists)
    assert r.n_masked >= r.n_spans


def test_oov_rates_top_v_cut_and_ties(spark):
    from boilerplate_buster_spark.operators.corpus_stats import oov_rates

    docs = spark.createDataFrame(
        [
            (1, ["a", "a", "b", "z"]),   # a freq 2; b/z tie at 1 -> b in V
            (2, ["b", "z", "z"]),        # wait: z freq 3 total, b freq 2
        ],
        ["doc_id", "tokens"],
    )
    # corpus counts: a=2, b=2, z=3 -> V=2 keeps z, then tie(a,b)->a
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_e6)
           for r in oov_rates(docs, vocab_size=2).collect()}
    assert got[1] == (4, 1, 250_000)   # b is OOV
    assert got[2] == (3, 1, 333_333)
    # vocab >= all types -> zero OOV everywhere
    full = oov_rates(docs, vocab_size=10).collect()
    assert all(r.n_oov == 0 for r in full)
