"""Span-level exact substring dedup (Lee et al. 2022 recipe): Spark
substring_dup_spans / substring_dedup_docs vs an independent brute-force
Python reference on crafted and seeded-random corpora."""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.dedup import (
    substring_dedup_docs,
    substring_dup_spans,
)


def _brute_hits(docs, span, min_docs, drop_canonical):
    occ = defaultdict(list)
    for d, toks in docs.items():
        for p in range(len(toks) - span + 1):
            occ[tuple(toks[p : p + span])].append((d, p))
    hits = []
    for lst in occ.values():
        if len({d for d, _ in lst}) < min_docs:
            continue
        lst = sorted(lst)
        hits.extend(lst[1:] if drop_canonical else lst)
    return hits


def _brute_spans(docs, span, min_docs, drop_canonical):
    per_doc = defaultdict(list)
    for d, p in _brute_hits(docs, span, min_docs, drop_canonical):
        per_doc[d].append(p)
    out = []
    for d, ps in per_doc.items():
        ps.sort()
        start, end, n = ps[0], ps[0] + span, 1
        for p in ps[1:]:
            if p > end:
                out.append((d, start, end, n))
                start, end, n = p, p + span, 1
            else:
                end, n = p + span, n + 1
        out.append((d, start, end, n))
    return sorted(out)


def _brute_clean(docs, span, min_docs):
    spans = defaultdict(list)
    for d, s, e, _ in _brute_spans(docs, span, min_docs, drop_canonical=True):
        spans[d].append((s, e))
    out = {}
    for d, toks in docs.items():
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in spans[d])
        ]
        out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def _df(spark, docs):
    rows = [(d, list(toks)) for d, toks in docs.items()]
    return spark.createDataFrame(rows, "doc_id int, tokens array<string>")


CRAFTED = {
    0: "the quick brown fox jumps over the lazy dog every day".split(),
    1: "once more the quick brown fox jumps over the lazy dog again".split(),
    2: "totally unrelated content with no shared windows at all here".split(),
    3: "the quick brown fox jumps over the lazy dog every day".split(),
    4: "short doc".split(),
    5: [],
}


def test_dup_spans_crafted(spark):
    got = sorted(
        tuple(r)
        for r in substring_dup_spans(_df(spark, CRAFTED), span=4).collect()
    )
    assert got == _brute_spans(CRAFTED, 4, 2, drop_canonical=False)
    # doc 2 shares nothing, docs 4/5 are shorter than the window
    assert {d for d, *_ in got} == {0, 1, 3}


def test_dedup_docs_crafted(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in substring_dedup_docs(_df(spark, CRAFTED), span=4).collect()
    }
    assert got == _brute_clean(CRAFTED, 4, 2)
    # doc 0 is the canonical copy (smallest id): loses nothing
    assert got[0][2] == 0
    # doc 3 is an exact duplicate of doc 0: fully removed
    assert got[3] == ("", 11, 11)
    # untouched docs keep their text verbatim
    assert got[2][0] == " ".join(CRAFTED[2]) and got[2][2] == 0


def test_random_corpora_match_brute_force(spark):
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(8)]
    for trial in range(4):
        docs = {
            d: [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
            for d in range(25)
        }
        sdf = _df(spark, docs)
        for span, min_docs in ((2, 2), (3, 2), (3, 3)):
            got = sorted(
                tuple(r)
                for r in substring_dup_spans(
                    sdf, span=span, min_docs=min_docs
                ).collect()
            )
            assert got == _brute_spans(docs, span, min_docs, False), (
                trial, span, min_docs,
            )
        got_clean = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
            for r in substring_dedup_docs(sdf, span=3).collect()
        }
        assert got_clean == _brute_clean(docs, 3, 2), trial


def test_max_bucket_guard(spark):
    # one window shared by 20 docs is dropped when max_bucket < 20 and the
    # remaining 2-doc window survives
    docs = {d: "alpha beta gamma delta".split() for d in range(20)}
    docs[20] = "epsilon zeta eta theta".split()
    docs[21] = "epsilon zeta eta theta".split()
    sdf = _df(spark, docs)
    capped = sorted(
        tuple(r)
        for r in substring_dup_spans(sdf, span=4, max_bucket=10).collect()
    )
    assert capped == [(20, 0, 4, 1), (21, 0, 4, 1)]
    uncapped = substring_dup_spans(sdf, span=4).count()
    assert uncapped == 22


def test_no_corpus_self_join_in_plan(spark):
    sdf = _df(spark, CRAFTED)
    plan = substring_dup_spans(sdf, span=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # bucket expansion, never a self-join
