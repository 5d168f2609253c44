"""Distributed BPE trainer/encoder vs a pure-Python reference
implementation of classic BPE (same tie-break), plus the generated
DuckDB training twin."""

from collections import Counter

from boilerplate_buster_spark.operators.bpe import (
    bpe_encode,
    duckdb_train_sql,
    segment_chain_expr,
    train_bpe,
)

CORPUS = [
    (0, "low lower lowest low low".split()),
    (1, "new newer newest new".split()),
    (2, "low new wide wider".split()),
]


def _py_bpe(word_counts: dict[str, int], k: int):
    segs = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for w, cnt in word_counts.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (lhs, rhs), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, c))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def _word_counts():
    return Counter(w for _, toks in CORPUS for w in toks)


def test_train_bpe_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "tokens"])
    want, _ = _py_bpe(_word_counts(), 6)
    # the distributed rounds AND the auto-selected driver path must both
    # reproduce the reference exactly
    assert train_bpe(docs, k=6, strategy="distributed") == want
    assert train_bpe(docs, k=6) == want


def test_bpe_encode_matches_python_segmentation(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "tokens"])
    merges = train_bpe(docs, k=6)
    pairs = [(l, r) for _, l, r, _ in merges]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, pairs).collect()
    }
    _, segs = _py_bpe(_word_counts(), 6)
    for i, toks in CORPUS:
        assert got[i] == (len(toks), sum(len(segs[w]) for w in toks)), i


def test_merge_rewrite_equals_fold_on_repeats(spark):
    # 'a a a' + merge(a,a) must give 'aa a' (left-to-right non-overlap),
    # and chained merges must nest correctly
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("aaa",), ("aaaa",), ("ab",)], ["w"])
    chain = segment_chain_expr("w", [("a", "a"), ("aa", "aa")], "spark")
    got = {r["w"]: r["s"] for r in df.select("w", F.expr(chain).alias("s")).collect()}
    assert got["aaa"] == "aa a </w>"
    assert got["aaaa"] == "aaaa </w>"
    assert got["ab"] == "a b </w>"


def test_duckdb_train_twin_agrees(spark):
    import duckdb

    docs = spark.createDataFrame(CORPUS, ["doc_id", "tokens"])
    got = train_bpe(docs, k=6)
    words = [w for _, toks in CORPUS for w in toks]
    vals = ", ".join(f"('{w}')" for w in words)
    sql = duckdb_train_sql(6, f"SELECT word FROM (VALUES {vals}) t(word)")
    con = duckdb.connect()
    want = [(r[0], r[1], r[2], r[3]) for r in con.sql(sql).fetchall()]
    assert got == sorted(want)
