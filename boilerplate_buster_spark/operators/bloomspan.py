"""BloomSpan Maximal-Frequent-Phrase miner, Spark-first.

Pipeline (SURVEY.md section 7; reference: corpus-miner/_ours/bloom_gram_miner.cpp):

  docs(doc_id, tokens)
    -> frequent words: one distinct-doc word aggregate       [shuffle #1;
       feeds the reference's word-DF gate AND winner-token resolution]
    -> candidate grams: word-gated per-doc-distinct n-gram
       counts, threshold support >= min_docs                 [shuffle #2;
       post-threshold set is corpus-statistics bounded: boilerplate
       TEMPLATES, not corpus rows]
    -> occurrence gather: in-scan hash IN-set filter over the
       corpus, flat BIGINT prefix-hash/token-hash columns     [NO shuffle]
    -> greedy expansion: per-depth rounds, one 3-column
       cached scan + a tiny aggregate each                    [distributed]
    -> sequential selection: score order + occupancy bitmask
       + backward closure on (cid, doc, pos) integer tuples   [driver, numpy]

The selection step is the reference's inherently sequential stage F
(":595-706").  What reaches the driver is NOT the corpus: one integer row
per occurrence OF A SURVIVING CANDIDATE.  At web scale the occurrence lists
of head phrases grow with the corpus, so ``max_occs_per_gram`` caps the
gathered postings per gram (deterministic xxhash64 sampling) while the EXACT
df keeps coming from the candidate aggregate; the cap trades off bitmask
fidelity only and is off by default for the byte-identical test posture.
Small corpora skip all of this: strategy='driver' collects string windows
and runs the exact kernel (core/expand.py) directly.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from boilerplate_buster_spark.core.expand import (
    WCandidate,
    WOcc,
    WindowExhausted,
    expand_windowed,
)
from boilerplate_buster_spark.functions.ngrams import explode_ngrams

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("phrase", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
        T.StructField("length", T.IntegerType(), False),
        T.StructField("example_docs", T.ArrayType(T.StringType()), False),
    ]
)


def _quote_set(values: list[str]) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in values)


def _gramhash_sql(hs_ref: str, i: str, n: int) -> str:
    """Order-sensitive combine of n consecutive 64-bit token hashes
    (xor of per-position rotations) - used for in-scan candidate membership;
    collisions only ADD occurrence rows, removed by the exact gram-string
    join right after."""
    terms = []
    for k in range(n):
        e = f"element_at({hs_ref}, {i} + {k})"
        sh = (k * 21) % 61
        terms.append(e if sh == 0 else f"shiftleft({e}, {sh})")
    return " ^ ".join(terms)


def candidate_grams(
    docs: DataFrame,
    n: int,
    min_docs: int,
    doc_col: str,
    tokens_col: str,
    word_gate_max: int = 2048,
    fw: list | None = None,
) -> DataFrame:
    """(gram, support): n-grams in >= min_docs DISTINCT docs (stages A-D).
    Exact replacement of Bloom pass + word-DF gate + external merge
    (bloom_gram_miner.cpp:284-589) - those are approximations/spill machinery
    around exactly this aggregate.

    Two cardinality killers applied BEFORE the shuffle (both exactness-
    preserving):
      * per-doc array_distinct on the gram list (intra-doc repeats collapse
        map-side -> the agg is a plain count, no distinct rewrite/Expand);
      * the reference's word-DF gate (P3, bloom_gram_miner.cpp:414-421):
        every token of a qualifying gram is itself in >= min_docs docs, so
        grams touching any rare word are dropped at the scan.  Applied as a
        literal IN-set when the frequent-word set is small (<= word_gate_max,
        the common case for boilerplate thresholds); skipped otherwise (a
        bloom_filter_agg gate is the scale-up path).
    """
    from boilerplate_buster_spark.operators.corpus_stats import word_doc_freq

    t = tokens_col
    if fw is None:
        fw = (
            word_doc_freq(docs, doc_col, tokens_col)
            .filter(F.col("df") >= min_docs)
            .select("word", F.xxhash64("word").alias("h"))
            .collect()
        )
    pos_seq = (
        f"slice(sequence(1, greatest(size({t}) - {n} + 1, 1)), "
        f"1, greatest(size({t}) - {n} + 1, 0))"
    )
    src_df = docs
    if len(fw) <= word_gate_max:
        # membership on 64-bit token hashes, computed ONCE per token -
        # literal IN-lists are linear scans in codegen, so comparing longs
        # (not strings) and testing each token once (not once per gram)
        # keeps the gate ~free.  Hash false positives only ADD grams; the
        # exact threshold below keeps the result exact.
        hset = ", ".join(str(r["h"]) for r in fw) or "0"
        src_df = docs.select(
            F.col(t),
            F.expr(f"transform({t}, x -> xxhash64(x) IN ({hset}))").alias("_ok"),
        )
        conj = " AND ".join(f"element_at(_ok, i + {k})" for k in range(n))
        pos_seq = f"filter({pos_seq}, i -> {conj})"
    per_doc = src_df.select(
        F.explode(
            F.expr(
                f"array_distinct(transform({pos_seq}, i -> array_join(slice({t}, i, {n}), ' ')))"
            )
        ).alias("gram")
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_docs)
    )


def gather_windows(
    docs: DataFrame,
    cands: DataFrame,
    n: int,
    window: int,
    doc_col: str,
    tokens_col: str,
    max_occs_per_gram: int | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Per-occurrence windows for every candidate gram:
    (gram, support, doc_id, pos, prev, window) - or, with hashed=True, the
    compact distributed-rounds layout
    (cid, doc_id, pos, prev_h, window_h, chain).

    ZERO shuffles on the main path: the candidate set is corpus-statistics
    small (post-threshold boilerplate templates), so occurrence discovery is
    a literal IN-set filter INSIDE the doc scan - one codegen pass over the
    cached corpus, windows sliced in place, then a broadcast map-side join
    attaches cid/support.  A candidate set above `inscan_max` falls back to
    the explode + broadcast-join + docs-join plan (two shuffles).

    prev = token before the occurrence (backward-closure input, ":675-695");
    window = W tokens from the occurrence start (expansion input).
    """
    t = tokens_col
    # occurrence discovery: per-token hashes computed once per doc, then a
    # long-typed shift-xor gram hash tested against the candidate hash set
    # INSIDE the scan (string IN-lists are linear scans in codegen; long
    # compares are ~free).  Hash false positives are removed by the exact
    # gram-string broadcast join right after.
    gh = _gramhash_sql("_hs", "i", n)
    cand_hashes = [
        r["gh"]
        for r in cands.select(
            F.expr(
                "transform(split(gram, ' '), x -> xxhash64(x))"
            ).alias("_hs")
        ).select(F.expr(_gramhash_sql("_hs", "1", n)).alias("gh")).collect()
    ]
    inscan_max = 65536
    if len(cand_hashes) <= inscan_max:
        hset = ", ".join(str(h) for h in cand_hashes) or "0"
        pos_expr = (
            f"filter(slice(sequence(1, greatest(size({t}) - {n} + 1, 1)), "
            f"1, greatest(size({t}) - {n} + 1, 0)), "
            f"i -> ({gh}) IN ({hset}))"
        )
        occ = (
            docs.select(
                F.col(doc_col),
                F.col(t),
                F.expr(f"transform({t}, x -> xxhash64(x))").alias("_hs"),
            )
            .select(doc_col, t, "_hs", F.explode(F.expr(pos_expr)).alias("ipos"))
            .withColumn("pos", F.expr("ipos - 1"))
            .withColumn("gram", F.expr(f"array_join(slice({t}, ipos, {n}), ' ')"))
            .join(F.broadcast(cands), "gram")  # exact: drops hash false positives
        )
    else:
        # huge candidate set (plan-size limit for the literal IN-set):
        # enumerate all positions and shuffle-join on gram (AQE handles skew)
        all_pos = (
            f"slice(sequence(1, greatest(size({t}) - {n} + 1, 1)), "
            f"1, greatest(size({t}) - {n} + 1, 0))"
        )
        occ = (
            docs.select(
                F.col(doc_col),
                F.col(t),
                F.expr(f"transform({t}, x -> xxhash64(x))").alias("_hs"),
            )
            .select(doc_col, t, "_hs", F.explode(F.expr(all_pos)).alias("ipos"))
            .withColumn("pos", F.expr("ipos - 1"))
            .withColumn("gram", F.expr(f"array_join(slice({t}, ipos, {n}), ' ')"))
            .join(cands, "gram")
        )
    if max_occs_per_gram is not None:
        # Deterministic pseudo-random rank; keeps exact `support` from the
        # aggregate while bounding driver-bound postings per gram.
        from pyspark.sql import Window

        w = Window.partitionBy("gram").orderBy(F.xxhash64(doc_col, "pos"))
        occ = (
            occ.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_occs_per_gram)
            .drop("_rk")
        )
    if hashed:
        # distributed-rounds payload: FLAT BIGINT COLUMNS, no arrays and no
        # strings - c<i> = rolling prefix hash of window[0..i) (fold of the
        # per-token hashes), w<i> = hash of window token i.  Every expansion
        # round reads exactly THREE long columns from the columnar cache
        # (c_plen, c_plen+1, w_plen+1): perfect column pruning, which array
        # columns cannot give (measured ~8x slower to re-read).
        chain_arr = (
            f"aggregate(slice(_hs, ipos, {window}), "
            f"array(cast(0 AS bigint)), "
            f"(acc, h) -> array_append(acc, xxhash64(element_at(acc, -1), h)), "
            f"acc -> slice(acc, 2, {window}))"
        )
        cols = [
            F.col("cid"),
            # 64-bit doc hash: the selection only needs doc IDENTITY for
            # mask keys and distinct counts; real ids stay cluster-side
            # (example docs come from a dedicated tiny aggregate) and the
            # driver transfer is pure int64 - far cheaper than strings
            F.xxhash64(F.col(doc_col)).alias("doc_h"),
            F.col(doc_col).cast("string").alias("doc_id"),
            F.col("pos"),
            F.when(F.col("pos") > 0, F.expr("element_at(_hs, pos)")).alias("prev_h"),
            F.expr(chain_arr).alias("_chain"),
        ]
        flat = [
            F.col("cid"), F.col("doc_h"), F.col("doc_id"), F.col("pos"),
            F.col("prev_h"),
        ]
        for i in range(1, window + 1):
            flat.append(F.expr(f"try_element_at(_chain, {i})").alias(f"c{i}"))
        for i in range(1, window + 1):
            flat.append(F.expr(f"try_element_at(_hs, ipos + {i} - 1)").alias(f"w{i}"))
        return occ.select(*cols, F.col("_hs"), F.col("ipos")).select(*flat)
    return occ.select(
        "gram",
        "support",
        F.col(doc_col).cast("string").alias("doc_id"),
        "pos",
        # pos is 0-based; element_at is 1-based, so index `pos` IS pos-1.
        F.when(F.col("pos") > 0, F.expr(f"element_at({t}, pos)")).alias("prev"),
        F.expr(f"slice({t}, pos + 1, {window})").alias("window"),
    )


def mine(
    spark: SparkSession,
    docs: DataFrame,
    min_docs: int,
    ngrams: int,
    min_l: int | None = None,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    window: int = 16,
    max_occs_per_gram: int | None = None,
    strategy: str = "auto",
    auto_threshold: int = 150_000,
) -> list[WCandidate]:
    """Run the full miner; returns the final phrase list (driver-side, small).

    strategy='distributed': greedy expansion runs as iterative DataFrame
    rounds - occurrence windows never leave the cluster; only integer
    (gram, doc, pos) tuples reach the driver for the sequential
    occupancy-mask selection.  strategy='driver': collect the windows and run
    the whole kernel driver-side (exact same outputs; per-round Spark job
    overhead dominates on small corpora, giant collect dominates on large
    ones).  'auto' (default) picks by total candidate-occurrence count
    (< auto_threshold -> driver).  All retry with doubled W if a phrase
    outgrows the gathered windows."""
    if min_l is None:
        min_l = ngrams  # main.cpp:67

    # NOTE deliberately NOT persisted: Spark's columnar cache reads of
    # array<string> are ~8x slower than recomputing split()+explode from the
    # (codegen-friendly) source scan - measured on this corpus shape.  Cache
    # the STRING form upstream instead (extraction does), never token arrays.
    docs = docs.select(doc_col, tokens_col)
    from boilerplate_buster_spark.operators.corpus_stats import word_doc_freq

    # frequent words computed ONCE: feeds the candidate word gate AND the
    # distributed winner-token dictionary (saves a full corpus aggregation)
    fw_rows = (
        word_doc_freq(docs, doc_col, tokens_col)
        .filter(F.col("df") >= min_docs)
        .select("word", F.xxhash64("word").alias("h"))
        .collect()
    )
    cands = candidate_grams(docs, ngrams, min_docs, doc_col, tokens_col, fw=fw_rows)
    # one tiny collect serves strategy choice, candidate ids, seed supports
    # and the rolling seed hash (the chain value of the gram itself)
    cand_rows = (
        cands.withColumn(
            "h0",
            F.expr(
                "aggregate(transform(split(gram, ' '), x -> xxhash64(x)), cast(0 AS bigint), (acc, h) -> xxhash64(acc, h))"
            ),
        )
        .withColumn("cid", F.expr("row_number() OVER (ORDER BY gram)"))
        .collect()
    )
    if not cand_rows:
        return []
    cands = spark.createDataFrame(
        [(r["cid"], r["gram"], r["support"]) for r in cand_rows],
        "cid int, gram string, support long",
    ).cache()
    if strategy == "auto":
        # support (distinct docs) lower-bounds occurrences; good enough to
        # pick the execution strategy
        total_occs = sum(r["support"] for r in cand_rows)
        strategy = "driver" if total_occs < auto_threshold else "distributed"
    try:
        while True:
            try:
                if strategy == "distributed":
                    gathered = gather_windows(
                        docs, cands, ngrams, window, doc_col, tokens_col,
                        max_occs_per_gram, hashed=True,
                    )
                    return _mine_distributed(
                        spark, gathered, cand_rows, fw_rows, min_docs, min_l, window,
                    )
                gathered = gather_windows(
                    docs, cands, ngrams, window, doc_col, tokens_col, max_occs_per_gram
                )
                return _mine_driver(gathered, min_docs, min_l, window)
            except WindowExhausted:
                window *= 2
    finally:
        cands.unpersist()


def _mine_driver(
    gathered: DataFrame, min_docs: int, min_l: int, window: int
) -> list[WCandidate]:
    """Collect the windows and run the exact sequential kernel driver-side."""
    rows = gathered.select("gram", "support", "doc_id", "pos", "prev", "window").collect()
    by_gram: dict[str, WCandidate] = {}
    occ_sort: dict[str, list] = defaultdict(list)
    for r in rows:
        if r["gram"] not in by_gram:
            by_gram[r["gram"]] = WCandidate(r["gram"].split(" "), r["support"], [])
        occ_sort[r["gram"]].append(
            (r["doc_id"], r["pos"], WOcc(r["doc_id"], r["pos"], r["prev"], r["window"]))
        )
    for gram, lst in occ_sort.items():
        lst.sort(key=lambda x: (x[0], x[1]))  # canonical occ order
        by_gram[gram].occs = [x[2] for x in lst]
    return expand_windowed(list(by_gram.values()), min_docs, min_l, window=window)


def _mine_distributed(
    spark: SparkSession,
    gathered: DataFrame,
    cand_rows: list,
    fw_rows: list,
    min_docs: int,
    min_l: int,
    window: int,
) -> list[WCandidate]:
    """Distributed greedy expansion + vectorized driver-side mask selection.

    Expansion of a candidate never depends on the occupancy bitmask (the mask
    only gates skip-before/mark-after, bloom_gram_miner.cpp:633-640,697-702),
    so all candidates' greedy walks run together as per-depth ROUNDS over the
    cluster-resident occurrence table.  The table layout is FLAT BIGINT
    columns (c<i> = rolling prefix hash of window[0..i), w<i> = token hash at
    window position i) and - because every alive candidate extends by exactly
    one token per round - the prefix length is GLOBAL per round, so round r
    reads exactly three long columns (c_plen, c_plen+1, w_plen+1):

      round: alive occ = c_plen == current path hash of its candidate
             groupBy(cid, c_plen+1).agg(countDistinct(doc), first(w_plen+1))
             winner = max support (>= min_docs), tie min token string

    Thresholding applies before the next depth exactly like the reference,
    so noise paths never become aggregation state.  Winner token STRINGS are
    resolved through the frequent-word dictionary (a winner follows the
    prefix in >= min_docs docs, hence its word-df >= min_docs).

    Hash note: prefixes are compared by 64-bit chain values; a collision
    (~2^-64 per pair) could merge two prefixes - guarded by the
    driver/distributed equivalence tests.

    Backward closure (":675-695") is a distributed aggregate over final
    occurrences.  The driver then receives (cid, doc_id, pos, is_final)
    tuples and replays the sequential score-ordered selection with
    interval-based numpy mask bookkeeping.
    """
    import numpy as np
    import pandas as pd

    import os
    import time

    _dbg = os.environ.get("BBS_MINE_DEBUG") == "1"
    _t0 = time.perf_counter()

    def _mark(label):
        nonlocal _t0
        if _dbg:
            now = time.perf_counter()
            print(f"[mine-debug] {label}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    gathered = gathered.persist()
    gathered.count()
    _mark("gather materialize")

    # frequent-word dictionary: word-hash -> word (winners are always here;
    # computed once in mine() and shared with the candidate word gate)
    word_by_hash = {r["h"]: r["word"] for r in fw_rows}

    _mark("frequent-word dict")
    state = {
        r["cid"]: {
            "gram": r["gram"],
            "tokens": r["gram"].split(" "),
            "support": r["support"],
            "seed_support": r["support"],
            "h": r["h0"],
            "alive": True,
        }
        for r in cand_rows
    }
    n = len(cand_rows[0]["gram"].split(" "))

    # ---- greedy rounds (plen is global: every alive candidate has extended
    # exactly once per round) ----
    plen = n
    while True:
        alive = [(cid, st["h"]) for cid, st in state.items() if st["alive"]]
        if not alive:
            break
        if plen >= window:
            gathered.unpersist()
            raise WindowExhausted(f"phrase reached window W={window}")
        cur_df = spark.createDataFrame(alive, "cid int, cur_h long")
        counts = (
            gathered.join(F.broadcast(cur_df), "cid")
            .filter(
                (F.col(f"c{plen}") == F.col("cur_h"))
                & F.col(f"c{plen + 1}").isNotNull()
            )
            .groupBy("cid", F.col(f"c{plen + 1}").alias("next_h"))
            .agg(
                F.countDistinct("doc_h").alias("sup"),
                F.first(F.col(f"w{plen + 1}")).alias("word_h"),
            )
            .filter(F.col("sup") >= min_docs)
            .collect()
        )
        by_cid: dict[int, list] = defaultdict(list)
        for r in counts:
            tok = word_by_hash[r["word_h"]]  # winner words are frequent words
            by_cid[r["cid"]].append((tok, r["sup"], r["next_h"]))
        any_won = False
        for cid, _ in alive:
            options = by_cid.get(cid)
            if not options:
                state[cid]["alive"] = False
                continue
            # winner: max unique-doc support, tie -> smallest token string
            best_sup = max(o[1] for o in options)
            tok, sup, nh = min(o for o in options if o[1] == best_sup)
            st = state[cid]
            st["tokens"].append(tok)
            st["support"] = sup
            st["h"] = nh
            any_won = True
        if not any_won:
            break
        plen += 1
    _mark("expansion rounds")

    # ---- distributed backward-closure verdicts over FINAL occurrences ----
    fin_df = spark.createDataFrame(
        [(cid, len(st["tokens"]), st["h"]) for cid, st in state.items()],
        "cid int, flen int, fin_h long",
    )
    carr = "array(" + ", ".join(f"c{i}" for i in range(1, window + 1)) + ")"
    flagged = gathered.join(F.broadcast(fin_df), "cid").withColumn(
        "is_final", F.expr(f"try_element_at({carr}, flen)") == F.col("fin_h")
    )
    closure = {
        r["cid"]: (r["n_pos0"], r["n_prev"])
        for r in flagged.filter("is_final")
        .groupBy("cid")
        .agg(
            F.sum(F.expr("IF(pos = 0, 1, 0)")).alias("n_pos0"),
            F.countDistinct("prev_h").alias("n_prev"),
        )
        .collect()
    }

    # canonical example docs (first 2 sorted) per candidate: one tiny
    # distributed job over the persisted table - REAL doc ids never cross to
    # the driver in bulk
    from pyspark.sql import Window as _W

    ex_rows = (
        flagged.filter("is_final")
        .select("cid", "doc_id")
        .distinct()
        .withColumn(
            "rn", F.row_number().over(_W.partitionBy("cid").orderBy("doc_id"))
        )
        .filter(F.col("rn") <= 2)
        .collect()
    )
    examples: dict[int, list[str]] = defaultdict(list)
    for r in sorted(ex_rows, key=lambda r: (r["cid"], r["doc_id"])):
        examples[r["cid"]].append(r["doc_id"])

    # int64-only transfer: (cid, doc hash, pos, is_final)
    _mark("closure + examples")
    pdf = flagged.select("cid", "doc_h", "pos", "is_final").toPandas()
    gathered.unpersist()
    _mark(f"toPandas ({len(pdf)} rows)")

    # ---- sequential selection (reference stage F), numpy-vectorized with
    # INTERVAL bookkeeping (marks are contiguous ranges; storing intervals
    # instead of positions keeps memory/sorts ~plen times smaller) ----
    codes, _ = pd.factorize(pdf["doc_h"])
    flat = (codes.astype(np.int64) << 32) | pdf["pos"].to_numpy(np.int64)
    cid_arr = pdf["cid"].to_numpy(np.int64)
    isfin_arr = pdf["is_final"].to_numpy(bool)

    order = sorted(
        state.items(),
        key=lambda kv: (
            -kv[1]["seed_support"] * len(kv[1]["gram"].split(" ")),
            -kv[1]["seed_support"],
            kv[1]["gram"].split(" "),
        ),
    )
    sort_idx = np.argsort(cid_arr, kind="stable")
    sorted_cids = cid_arr[sort_idx]
    idx_by_cid: dict[int, np.ndarray] = {}
    for cid, _ in order:
        lo = np.searchsorted(sorted_cids, cid, side="left")
        hi = np.searchsorted(sorted_cids, cid, side="right")
        idx_by_cid[cid] = sort_idx[lo:hi]

    # covered-interval chunks: each chunk keeps (starts sorted, RAW ends in
    # start order, cummax of ends).  A point p is covered by a chunk iff the
    # last interval starting <= p has cummax end > p (cummax makes the single
    # lookup correct for overlapping intervals).  Chunks merge from their RAW
    # ends when they pile up (cummax'd ends must never be merged as if raw -
    # they inherit earlier intervals' reach).
    chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def covered(points: np.ndarray) -> np.ndarray:
        m = np.zeros(len(points), dtype=bool)
        for s, _, cume in chunks:
            idx = np.searchsorted(s, points, side="right") - 1
            ok = idx >= 0
            m |= ok & (cume[np.clip(idx, 0, None)] > points)
        return m

    def add_intervals(starts: np.ndarray, length: int) -> None:
        o = np.argsort(starts, kind="stable")
        s = starts[o]
        raw_e = s + length
        chunks.append((s, raw_e, np.maximum.accumulate(raw_e)))
        if len(chunks) > 8:  # amortized merge
            alls = np.concatenate([c[0] for c in chunks])
            alle = np.concatenate([c[1] for c in chunks])
            o2 = np.argsort(alls, kind="stable")
            s2, e2 = alls[o2], alle[o2]
            chunks.clear()
            chunks.append((s2, e2, np.maximum.accumulate(e2)))

    out: list[WCandidate] = []
    for cid, st in order:
        rows = idx_by_cid[cid]
        starts = flat[rows]
        # skip iff ALL seed START positions already covered (":633-640")
        if chunks and covered(starts).all():
            continue
        n_pos0, n_prev = closure.get(cid, (0, 0))
        fin_rows = rows[isfin_arr[rows]]
        if fin_rows.size and n_pos0 == 0 and n_prev == 1:
            continue  # backward closure: drop, don't mark
        plen = len(st["tokens"])
        if fin_rows.size:
            add_intervals(flat[fin_rows], plen)
        if plen >= min_l:
            out.append(
                WCandidate(
                    st["tokens"],
                    st["support"],
                    occs=[],
                    examples=examples.get(cid, []),
                )
            )
    _mark("selection")
    return out


def phrases_to_df(spark: SparkSession, phrases: list[WCandidate]) -> DataFrame:
    """Canonical result DataFrame (deterministic projection of the CSV sink,
    corpus_miner.cpp:529-561): example_docs = first 2 of the sorted unique doc
    set (deviation: reference uses hash-set order)."""
    data = []
    for p in phrases:
        if p.examples is not None:
            ex = list(p.examples)[:2]
        else:
            ex = sorted({str(o.doc_id) for o in p.occs})[:2]
        data.append((p.text, p.support, len(p.tokens), ex))
    data.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return spark.createDataFrame(data, RESULT_SCHEMA)


def mine_df(spark: SparkSession, docs: DataFrame, **kw) -> DataFrame:
    return phrases_to_df(spark, mine(spark, docs, **kw))
