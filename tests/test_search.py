"""Inverted index + conjunctive term search vs straight Python
recomputation, including tf-idf integer scoring and OR semantics."""

from collections import Counter

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.search import (
    inverted_index,
    search_terms,
    term_stats,
)

DOCS = [
    (0, "spark window merge spark".split()),
    (1, "spark sort".split()),
    (2, "window merge window spark".split()),
    (3, "sort sort sort".split()),
    (4, []),
]


def _index_py():
    out = {}
    for i, toks in DOCS:
        for t, c in Counter(toks).items():
            out[(t, i)] = c
    return out


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in inverted_index(docs).collect()
    }
    assert got == _index_py()


def test_term_stats(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    got = {
        r["term"]: (r["df"], r["total_tf"])
        for r in term_stats(inverted_index(docs)).collect()
    }
    assert got == {
        "spark": (3, 4),
        "window": (2, 3),
        "merge": (2, 2),
        "sort": (2, 4),
    }


def test_search_conjunctive_and_scores(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    idx = inverted_index(docs)
    got = {
        r["doc_id"]: (r["n_hit"], r["score_e6"])
        for r in search_terms(idx, ["spark", "window"], n_docs=5).collect()
    }
    # only docs 0 and 2 contain both; df(spark)=3, df(window)=2
    idf_s = (5 * 1000000) // 3
    idf_w = (5 * 1000000) // 2
    assert got == {
        0: (2, 2 * idf_s + 1 * idf_w),
        2: (2, 1 * idf_s + 2 * idf_w),
    }


def test_search_any_mode(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    idx = inverted_index(docs)
    got = {
        r["doc_id"]: r["n_hit"]
        for r in search_terms(
            idx, ["spark", "window"], n_docs=5, require_all=False
        ).collect()
    }
    assert got == {0: 2, 1: 1, 2: 2}


def test_search_prunes_scan_to_query_terms(spark):
    # the IN-list must reach the posting scan as a filter (pushed down so
    # a parquet-backed index would skip non-matching row groups)
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    idx = inverted_index(docs)
    plan = search_terms(idx, ["spark"], n_docs=5)._jdf.queryExecution().toString()
    assert "term#" in plan and "IN" in plan.upper()


def test_bm25_hand_computed(spark):
    from boilerplate_buster_spark.operators.search import (
        bm25_search,
        inverted_index,
    )

    # two docs: doc 1 = "a a b" (dl=3), doc 2 = "a c" (dl=2); N=2, tot=5
    docs = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["a", "c"])], ["doc_id", "tokens"]
    )
    from pyspark.sql import functions as F

    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    got = {
        r.doc_id: (r.n_hit, r.score_e3)
        for r in bm25_search(
            inverted_index(docs), dl, ["a", "b"], n_docs=2, total_tokens=5
        ).collect()
    }

    def score(tf, df, dlen, n=2, tot=5):
        idf = ((n - df) * 2000 + 1000) // (2 * df + 1)
        l_e6 = (dlen * 1000000 * n) // tot
        den = tf * 1000000 + (
            1200 * (1000000 - 750000 + (750000 * l_e6) // 1000000)
        ) // 1000
        return (idf * tf * 2200) // max(den // 1000, 1)

    # doc 1 matches a (tf=2, df=2) and b (tf=1, df=1), dl=3
    assert got[1] == (2, score(2, 2, 3) + score(1, 1, 3))
    # doc 2 matches only a (tf=1, df=2), dl=2
    assert got[2] == (1, score(1, 2, 2))
    # longer doc is penalized: same tf/df, bigger dl => smaller score
    assert score(1, 1, 3) < score(1, 1, 2)


def test_bm25_require_all(spark):
    from boilerplate_buster_spark.operators.search import (
        bm25_search,
        inverted_index,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a"])], ["doc_id", "tokens"]
    )
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    got = bm25_search(
        inverted_index(docs), dl, ["a", "b"], 2, 3, require_all=True
    ).collect()
    assert [r.doc_id for r in got] == [1]


def test_phrase_search_positions(spark):
    from boilerplate_buster_spark.operators.search import (
        phrase_search,
        positional_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c a b".split()),   # 'a b' twice, first at 0
            (2, "b a".split()),         # reversed: no match
            (3, "a x b".split()),       # gap: no match
        ],
        ["doc_id", "tokens"],
    )
    idx = positional_index(docs)
    got = {r.doc_id: (r.n_matches, r.first_pos)
           for r in phrase_search(idx, ["a", "b"]).collect()}
    assert got == {1: (2, 0)}
    # 3-word phrase crosses two joins
    got3 = {r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_search(idx, ["c", "a", "b"]).collect()}
    assert got3 == {1: (1, 2)}


def test_proximity_search_window_and_order(spark):
    from boilerplate_buster_spark.operators.search import (
        positional_index,
        proximity_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "x a y y b".split()),   # dist 3, within 5
            (2, "b x x x x x a".split()),  # dist 6: outside window, order flipped
            (3, "a b".split()),         # dist 1
        ],
        ["doc_id", "tokens"],
    )
    idx = positional_index(docs)
    got = {r.doc_id: (r.n_pairs, r.min_dist)
           for r in proximity_search(idx, "a", "b", window=5).collect()}
    assert got == {1: (1, 3), 3: (1, 1)}
    # widening the window admits doc 2 (order-insensitive)
    wide = {r.doc_id for r in proximity_search(idx, "a", "b", window=6).collect()}
    assert wide == {1, 2, 3}
