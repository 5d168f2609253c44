"""Hashed-ngram classifier + DSIR importance vs pure-Python
recomputation with the same portable hash."""

import hashlib

from boilerplate_buster_spark.operators.classify import (
    classify_docs,
    dsir_importance,
    hashed_bucket_probs,
)

B = 64


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(toks):
    return list(toks) + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def _buckets(toks):
    return [_h60(g) % B for g in _grams(toks)]


DOCS = [
    (0, "the quick brown fox".split()),
    (1, "lazy dog sleeps".split()),
    (2, "the the the".split()),
    (3, []),
]


def _weight(bucket, cls):
    return ((bucket * 31 + cls * 17) % 201) - 100


def test_classify_matches_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "tokens"])
    weights = spark.createDataFrame(
        [(b, c, _weight(b, c)) for b in range(B) for c in range(3)],
        "bucket long, class int, w long",
    )
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in classify_docs(docs, weights, 3, B).collect()
    }
    for i, toks in DOCS:
        if not toks:
            assert got[i] == (0, 0)
            continue
        sums = {
            c: sum(_weight(b, c) for b in _buckets(toks)) for c in range(3)
        }
        best = max(sums, key=lambda c: (sums[c], -c))
        assert got[i] == (best, sums[best]), i


def test_bucket_probs_integer_exact(spark):
    docs = spark.createDataFrame(DOCS[:3], ["doc_id", "tokens"])
    got = {r["bucket"]: r["p_e6"] for r in hashed_bucket_probs(docs, B).collect()}
    from collections import Counter

    cnt = Counter(b for _, toks in DOCS[:3] for b in _buckets(toks))
    total = sum(cnt.values())
    assert got == {b: (c * 1000000) // total for b, c in cnt.items()}


def test_dsir_importance_sign_structure(spark):
    target = spark.createDataFrame(
        [(0, "quick fox".split()), (1, "brown fox".split())],
        ["doc_id", "tokens"],
    )
    raw = spark.createDataFrame(DOCS[:3], ["doc_id", "tokens"])
    tp = hashed_bucket_probs(target, B)
    rp = hashed_bucket_probs(raw, B)
    got = {
        r["doc_id"]: (r["n_grams"], r["imp_e6"])
        for r in dsir_importance(raw, tp, rp, B).collect()
    }
    # python recomputation
    from collections import Counter

    tcnt = Counter(
        b for toks in (["quick", "fox"], ["brown", "fox"]) for b in _buckets(toks)
    )
    rcnt = Counter(b for _, toks in DOCS[:3] for b in _buckets(toks))
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    for i, toks in DOCS[:3]:
        bs = _buckets(toks)
        want = sum(
            (tcnt[b] * 1000000) // tt - (rcnt[b] * 1000000) // rt for b in bs
        )
        assert got[i] == (len(bs), want), i
    # fox-bearing doc 0 must look more target-like than the 'the the the' doc
    assert got[0][1] > got[2][1]


def test_classify_sparse_weights_argmax_includes_zero_classes(spark):
    # a sparse model (zero weights omitted): a doc whose only matched
    # class scores negative must classify as the best ZERO-scoring class
    docs = spark.createDataFrame([(0, ["neg"])], ["doc_id", "tokens"])
    b = _h60("neg") % B
    sparse = spark.createDataFrame(
        [(b, 2, -5)], "bucket long, class int, w long"
    )
    got = classify_docs(docs, sparse, 3, B).collect()[0]
    assert (got["label"], got["score"]) == (0, 0)
