"""PrefixSpan ALL/CLOSED/MAXIMAL modes (core/pyref.prefixspan_mine) vs an
independent brute-force oracle that enumerates every contiguous gram with
unique-doc support, replicating the reference's emit rule (a pattern whose
every occurrence ends a document is never emitted - the projected-db drop at
prefixspan/corpus_miner.cpp:170-182)."""

from __future__ import annotations

import pathlib
import random
from collections import defaultdict

from boilerplate_buster_spark.core import pyref
from boilerplate_buster_spark.core.tokenize import decode_page_bytes, tokenize


def brute_modes(docs, min_docs, min_l, max_len=60):
    df: dict[tuple, set] = defaultdict(set)
    has_non_end: dict[tuple, bool] = defaultdict(bool)
    for d, doc in enumerate(docs):
        for L in range(1, min(len(doc), max_len) + 1):
            for i in range(len(doc) - L + 1):
                g = tuple(doc[i : i + L])
                df[g].add(d)
                if i + L < len(doc):
                    has_non_end[g] = True
    freq = {g: len(s) for g, s in df.items() if len(s) >= min_docs}
    all_mode = {
        g: n for g, n in freq.items() if len(g) >= min_l and has_non_end[g]
    }

    def exts(g):
        return [freq[g + (w,)] for w in {d[i + len(g)]
                for d in docs for i in range(len(d) - len(g))
                if tuple(d[i : i + len(g)]) == g and i + len(g) < len(d)}
                if g + (w,) in freq]

    closed = {g: n for g, n in all_mode.items() if all(e != n for e in exts(g))}
    maximal = {g: n for g, n in all_mode.items() if not exts(g)}
    return all_mode, closed, maximal


def as_map(phrases):
    return {tuple(p.tokens): p.support for p in phrases}


def check_corpus(docs, min_docs, min_l):
    want_all, want_closed, want_max = brute_modes(docs, min_docs, min_l)
    got_all = as_map(pyref.prefixspan_mine(docs, min_docs, min_l, mode="all"))
    got_closed = as_map(pyref.prefixspan_mine(docs, min_docs, min_l, mode="closed"))
    got_max = as_map(pyref.prefixspan_mine(docs, min_docs, min_l, mode="maximal"))
    assert got_all == want_all
    assert got_closed == want_closed
    assert got_max == want_max
    # mode lattice: maximal <= closed <= all
    assert set(got_max) <= set(got_closed) <= set(got_all)


def test_random_corpora():
    rng = random.Random(5)
    for trial in range(6):
        vocab = ["t%d" % i for i in range(rng.randrange(4, 12))]
        docs = [
            [rng.choice(vocab) for _ in range(rng.randrange(0, 18))]
            for _ in range(rng.randrange(3, 9))
        ]
        check_corpus(docs, min_docs=2, min_l=1)
        check_corpus(docs, min_docs=2, min_l=2)


def test_end_of_doc_quirk():
    # "a b" is frequent but every occurrence ends its doc -> never emitted
    docs = [["x", "a", "b"], ["y", "a", "b"], ["z", "a", "b"]]
    got = as_map(pyref.prefixspan_mine(docs, min_docs=3, min_l=2, mode="all"))
    assert ("a", "b") not in got
    # move one occurrence off the end -> emitted with full support 3
    docs[0] = ["x", "a", "b", "w"]
    got = as_map(pyref.prefixspan_mine(docs, min_docs=3, min_l=2, mode="all"))
    assert got[("a", "b")] == 3


def test_reference_test1_corpus():
    files = sorted(pathlib.Path("/root/reference/tests/test1").iterdir())
    docs = [tokenize(decode_page_bytes(f.read_bytes())) for f in files]
    check_corpus(docs, min_docs=3, min_l=3)


def test_spark_prefixspan_matches_pyref(spark):
    from boilerplate_buster_spark.operators.closed_patterns import (
        prefixspan_patterns,
    )

    rng = random.Random(13)
    vocab = ["v%d" % i for i in range(8)]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randrange(0, 15))]
        for _ in range(8)
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<string>"
    )
    for mode in ("all", "closed", "maximal"):
        got = {
            (r["phrase"], r["freq"], r["length"])
            for r in prefixspan_patterns(spark, df, min_docs=2, min_l=1, mode=mode).collect()
        }
        want = {
            (p.text, p.support, len(p.tokens))
            for p in pyref.prefixspan_mine(docs, min_docs=2, min_l=1, mode=mode)
        }
        assert got == want, mode
