"""Corpus mixing + sequence packing fixtures - the two-phase prefix sum
must agree with a straight serial packing, including across bucket
boundaries."""

from boilerplate_buster_spark.operators.packing import (
    pack_sequences,
    weighted_corpus_mix,
)


def test_pack_sequences_multi_bucket_prefix_sum(spark):
    # bucket=4 forces several buckets; doc token counts chosen so sequences
    # split across docs and bucket boundaries
    rows = [(i, ["w"] * (3 + (i * 7) % 11)) for i in range(23)]
    docs = spark.createDataFrame(rows, ["doc_id", "tokens"])
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"]
        )
        for r in pack_sequences(docs, seq_len=16, bucket=4).collect()
    }
    running = 0
    for i, toks in rows:
        n = len(toks)
        assert got[i] == (
            n, running, running // 16, (running + max(n, 1) - 1) // 16
        ), i
        running += n


def test_pack_sequences_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, ["a", "b"]), (1, []), (2, ["c"])], ["doc_id", "tokens"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(docs, seq_len=2).collect()
    }
    assert got[0] == (2, 0, 0, 0)
    # empty doc occupies no tokens; its (first, last) degenerate to its slot
    assert got[1] == (0, 2, 1, 1)
    assert got[2] == (1, 2, 1, 1)


def test_weighted_mix_deterministic_and_weighted(spark):
    rows = [(i, "web" if i % 2 == 0 else "junk") for i in range(2000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    kept1 = {
        r["doc_id"]
        for r in weighted_corpus_mix(docs, {"web": 500000}).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in weighted_corpus_mix(docs, {"web": 500000}).collect()
    }
    assert kept1 == kept2  # deterministic across runs
    assert all(i % 2 == 0 for i in kept1)  # unmapped source -> dropped
    assert 350 < len(kept1) < 650  # ~50% of the 1000 web docs
    # weight 1e6 keeps everything from that source
    all_web = weighted_corpus_mix(docs, {"web": 1000000}).count()
    assert all_web == 1000
