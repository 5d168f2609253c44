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


def _full_window_reference(spark, docs, strata_col, quota):
    # ground truth: the rank over the FULL stratum (what the prefilter
    # decomposition must equal)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.operators.text_stats import h60

    coin = h60(f"concat(CAST({strata_col} AS string), '#', CAST(doc_id AS string))")
    w = Window.partitionBy(strata_col).orderBy("_h", "doc_id")
    return {
        (r[strata_col], r["doc_id"]): r["rn"]
        for r in docs.withColumn("_h", F.expr(f"pmod({coin}, 1000000)"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .collect()
    }


def test_stratified_sample_exact_quota_matches_full_window(spark):
    from boilerplate_buster_spark.operators.packing import stratified_sample

    rows = [(i, "big" if i % 3 else "small") for i in range(600)]
    docs = spark.createDataFrame(rows, ["doc_id", "strata"])
    got = {
        (r["strata"], r["doc_id"]): r["sample_rank"]
        for r in stratified_sample(docs, "strata", quota=25).collect()
    }
    assert got == _full_window_reference(spark, docs, "strata", 25)
    assert sum(1 for (s, _) in got if s == "big") == 25
    assert sum(1 for (s, _) in got if s == "small") == 25


def test_stratified_sample_small_stratum_keeps_all(spark):
    from boilerplate_buster_spark.operators.packing import stratified_sample

    rows = [(i, "tiny") for i in range(5)] + [(100 + i, "big") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "strata"])
    out = stratified_sample(docs, "strata", quota=10)
    by = {s: 0 for s in ("tiny", "big")}
    for r in out.collect():
        by[r["strata"]] += 1
    assert by == {"tiny": 5, "big": 10}


def test_stratified_sample_fallback_path_still_exact(spark):
    # oversample=1 makes the prefilter margin razor-thin so some strata
    # undershoot and take the fallback branch; result must still equal the
    # full-window reference
    from boilerplate_buster_spark.operators.packing import stratified_sample

    rows = [(i, f"s{i % 7}") for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "strata"])
    got = {
        (r["strata"], r["doc_id"]): r["sample_rank"]
        for r in stratified_sample(docs, "strata", quota=20, oversample=1).collect()
    }
    assert got == _full_window_reference(spark, docs, "strata", 20)


def test_stratified_sample_partitioning_invariant(spark):
    from boilerplate_buster_spark.operators.packing import stratified_sample

    rows = [(i, "a" if i % 2 else "b") for i in range(300)]
    d1 = spark.createDataFrame(rows, ["doc_id", "strata"]).repartition(13)
    d2 = spark.createDataFrame(rows, ["doc_id", "strata"]).coalesce(1)
    k1 = {(r["strata"], r["doc_id"]) for r in stratified_sample(d1, "strata", 40).collect()}
    k2 = {(r["strata"], r["doc_id"]) for r in stratified_sample(d2, "strata", 40).collect()}
    assert k1 == k2 and len(k1) == 80


def test_chunk_documents_cover_and_overlap(spark):
    from boilerplate_buster_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, [f"t{i}" for i in range(10)]), (1, ["x"]), (2, [])],
        ["doc_id", "tokens"],
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # doc 0: stride 3, n=10 -> chunks at 0,3,6 cover 0..9 (last may run short)
    assert got[(0, 0)] == (0, 4, "t0 t1 t2 t3")
    assert got[(0, 1)] == (3, 4, "t3 t4 t5 t6")
    assert got[(0, 2)] == (6, 4, "t6 t7 t8 t9")
    assert (0, 3) not in got
    assert got[(1, 0)] == (0, 1, "x")
    assert got[(2, 0)] == (0, 0, "")  # empty doc keeps one (empty) chunk
    # overlap >= chunk refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=2, overlap=2)
