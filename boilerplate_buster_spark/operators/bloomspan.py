"""BloomSpan Maximal-Frequent-Phrase miner, Spark-first.

Pipeline (SURVEY.md section 7; reference: corpus-miner/_ours/bloom_gram_miner.cpp):

  docs(doc_id, tokens)
    -> seed stream: explode n-gram occurrences              [codegen, no Python]
    -> candidate grams: groupBy(gram).countDistinct(doc)    [shuffle #1; Catalyst
       plans the distinct as partial dedup on (gram, doc) - uniformly
       distributed keys even for head grams == the north rule's salted keys]
    -> threshold df >= min_docs                             [corpus-statistics
       bounded: boilerplate TEMPLATES, not corpus rows]
    -> occurrence gather: seeds |X| broadcast(candidates),
       then join docs on doc_id to slice per-occurrence
       windows slice(tokens, pos+1, W) + prev token         [shuffle #2, linear]
    -> driver kernel: score-ordered greedy expansion +
       occupancy bitmask + backward closure (core/expand.py)

The driver step is the reference's inherently sequential stage F
(":595-706").  What reaches the driver is NOT the corpus: it is one row per
occurrence OF A SURVIVING CANDIDATE, each carrying a W-token window.  At web
scale the occurrence lists of head phrases grow with the corpus, so
``max_occs_per_gram`` caps the gathered postings per gram (deterministic
xxhash64 sampling) while the EXACT df keeps coming from shuffle #1; the cap
trades off bitmask fidelity only (phrase set/df stay exact for phrases whose
expansion path is support-dominated) and is off by default for the
byte-identical test posture.
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


def candidate_grams(
    docs: DataFrame, n: int, min_docs: int, doc_col: str, tokens_col: str
) -> DataFrame:
    """(gram, support): n-grams in >= min_docs distinct docs (stages A-D).
    Exact replacement of Bloom pass + word-DF gate + external merge
    (bloom_gram_miner.cpp:284-589) - those are approximations/spill machinery
    around exactly this aggregate."""
    seeds = explode_ngrams(docs, n, doc_col, tokens_col)
    return (
        seeds.groupBy("gram")
        .agg(
            F.countDistinct(doc_col).alias("support"),
            F.count("*").alias("n_occs"),
        )
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
) -> DataFrame:
    """Per-occurrence windows for every candidate gram:
    (gram, support, doc_id, pos, prev, window).

    Candidate set is broadcast (small); the docs join is a linear shuffle on
    doc_col.  prev = token before the occurrence (backward-closure input,
    ":675-695"); window = W tokens from the occurrence start (expansion input).
    """
    seeds = explode_ngrams(docs, n, doc_col, tokens_col)
    occ = seeds.join(F.broadcast(cands), "gram")
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
    return occ.join(docs, doc_col).select(
        "gram",
        "support",
        F.col(doc_col).cast("string").alias("doc_id"),
        "pos",
        # pos is 0-based; element_at is 1-based, so index `pos` IS pos-1.
        F.when(F.col("pos") > 0, F.expr(f"element_at({tokens_col}, pos)")).alias("prev"),
        F.expr(f"slice({tokens_col}, pos + 1, {window})").alias("window"),
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
    from pyspark import StorageLevel

    # the tokenized corpus feeds two passes (candidate agg + window gather);
    # cache it serialized - spills to disk when it outgrows executor memory
    docs = docs.select(doc_col, tokens_col).persist(StorageLevel.MEMORY_AND_DISK)
    cands = candidate_grams(docs, ngrams, min_docs, doc_col, tokens_col)
    # cands is reused for the gather join - cache the (tiny) candidate table.
    cands = cands.cache()
    if strategy == "auto":
        total_occs = cands.agg(F.sum("n_occs")).first()[0] or 0
        strategy = "driver" if total_occs < auto_threshold else "distributed"
    try:
        while True:
            gathered = gather_windows(
                docs, cands, ngrams, window, doc_col, tokens_col, max_occs_per_gram
            )
            try:
                if strategy == "distributed":
                    return _mine_distributed(spark, gathered, min_docs, min_l, window)
                return _mine_driver(gathered, min_docs, min_l, window)
            except WindowExhausted:
                window *= 2
    finally:
        cands.unpersist()
        docs.unpersist()


def _mine_driver(
    gathered: DataFrame, min_docs: int, min_l: int, window: int
) -> list[WCandidate]:
    """Collect the windows and run the exact sequential kernel driver-side."""
    rows = gathered.collect()
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
    min_docs: int,
    min_l: int,
    window: int,
) -> list[WCandidate]:
    """Distributed greedy expansion + driver-side mask selection.

    Expansion of a candidate never depends on the occupancy bitmask (the mask
    only gates skip-before/mark-after, bloom_gram_miner.cpp:633-640,697-702),
    so ALL candidates' greedy walks can be computed from a single aggregate:
    the FREQUENT EXTENSION TRIE.  Each occurrence emits one row per depth L
    (prefix-hash, next token, child-hash, doc); one
    groupBy(gram, L, prefix, next).countDistinct(doc) with the min_docs
    HAVING filter collapses the corpus to the tiny set of frequent trie edges
    (noise paths from unique text never clear min_docs).  The driver then
    replays the reference's greedy walk (max unique-doc support, >= min_docs,
    tie -> min token, ":642-673") over the in-memory trie - zero iteration,
    no lineage growth, two shuffles total.

    Prefix nodes are identified by xxhash64 of the prefix tokens with
    parent->child hash linking; a hash collision (~2^-64 per path pair) could
    in principle merge two prefixes - the driver/distributed equivalence
    tests and the full-string is_final pass guard the observable output.

    Afterwards the driver receives one row per seed occurrence -
    (gram, doc_id, pos, prev, is_final) integers/strings, NO token arrays -
    and replays the sequential score-ordered selection
    (skip-if-all-starts-covered, backward closure, mark, min_l).
    """
    gathered = gathered.persist()

    # seed state per gram
    state = {
        r["gram"]: {
            "tokens": r["gram"].split(" "),
            "support": r["support"],
            "seed_support": r["support"],
        }
        for r in gathered.select("gram", "support").distinct().collect()
    }
    if not state:
        gathered.unpersist()
        return []
    n = len(next(iter(state)).split(" "))

    # frequent extension trie: one explode + one thresholded aggregate
    edges = (
        gathered.select(
            "gram",
            "doc_id",
            F.explode(
                F.expr(
                    # slice-to-empty guard: sequence(1,0) would DESCEND
                    f"transform(slice(sequence(1, greatest(size(window) - {n}, 1)), "
                    f"1, greatest(size(window) - {n}, 0)), k -> struct("
                    f"  {n} + k - 1 AS L,"
                    # xxhash64 hashes the array value directly - no string build
                    f"  xxhash64(slice(window, 1, {n} + k - 1)) AS phash,"
                    f"  element_at(window, {n} + k) AS next_tok,"
                    f"  xxhash64(slice(window, 1, {n} + k)) AS chash))"
                )
            ).alias("e"),
        )
        .select("gram", "doc_id", "e.L", "e.phash", "e.next_tok", "e.chash")
        .groupBy("gram", "L", "phash", "next_tok", "chash")
        .agg(F.countDistinct("doc_id").alias("sup"))
        .filter(F.col("sup") >= min_docs)
        .collect()
    )
    trie: dict[tuple[str, int, int], list] = defaultdict(list)
    for r in edges:
        trie[(r["gram"], r["L"], r["phash"])].append(
            (r["next_tok"], r["sup"], r["chash"])
        )

    # greedy winner walk per gram (reference ":642-673", deterministic ties)
    for g, st in state.items():
        # depth n: all occurrences share the gram itself as prefix -> the
        # edge rows carry exactly one phash at L=n for this gram.
        lvl = [k for k in trie if k[0] == g and k[1] == n]
        cur = lvl[0][2] if lvl else None
        L = n
        while cur is not None:
            options = trie.get((g, L, cur), [])
            if not options:
                break
            # winner: max unique-doc support, tie -> lexicographically
            # smallest next token (deterministic deviation, core/pyref.py)
            best_sup = max(o[1] for o in options)
            best = min(o for o in options if o[1] == best_sup)
            st["tokens"].append(best[0])
            st["support"] = best_sup
            cur = best[2]
            L += 1
        if len(st["tokens"]) >= window:
            gathered.unpersist()
            raise WindowExhausted(f"phrase reached window W={window}")

    # Ship integers only: every seed occurrence, flagged if it survived the
    # narrowing.  An occurrence survived the whole walk iff its window prefix
    # equals the fully expanded phrase, so seeds and finals come out of the
    # persisted gathered table in one pass - no token arrays to the driver.
    phrase_df = spark.createDataFrame(
        [(g, " ".join(st["tokens"]), len(st["tokens"])) for g, st in state.items()],
        ["gram", "phrase", "flen"],
    )
    pdf = (
        gathered.join(F.broadcast(phrase_df), "gram")
        .withColumn(
            "is_final",
            F.expr("concat_ws(' ', slice(window, 1, flen))") == F.col("phrase"),
        )
        .select("gram", "doc_id", "pos", "prev", "is_final")
        .toPandas()
    )
    gathered.unpersist()

    # ---- sequential selection (reference stage F) on compact driver data ----
    seeds: dict[str, list] = defaultdict(list)
    finals: dict[str, list] = defaultdict(list)
    for g, d, p, prev, is_f in pdf.itertuples(index=False):
        seeds[g].append((d, p))
        if is_f:
            finals[g].append((d, p, prev))

    order = sorted(
        state.items(),
        key=lambda kv: (
            -kv[1]["seed_support"] * len(kv[0].split(" ")),
            -kv[1]["seed_support"],
            kv[0].split(" "),
        ),
    )
    processed: dict[str, set[int]] = defaultdict(set)
    out: list[WCandidate] = []
    for g, st in order:
        # skip iff ALL seed START positions already covered (":633-640")
        if all(p in processed[d] for d, p in seeds[g]):
            continue
        focc = sorted(finals[g], key=lambda x: (x[0], x[1]))
        if focc:
            prev0 = focc[0][2]
            if prev0 is not None and all(o[2] == prev0 for o in focc):
                continue  # backward closure (":675-695"): drop, don't mark
        plen = len(st["tokens"])
        for d, p, _ in focc:  # mark covered positions (":697-702")
            processed[d].update(range(p, p + plen))
        if plen >= min_l:
            out.append(
                WCandidate(
                    st["tokens"],
                    st["support"],
                    [WOcc(d, p, prev, []) for d, p, prev in focc],
                )
            )
    return out


def phrases_to_df(spark: SparkSession, phrases: list[WCandidate]) -> DataFrame:
    """Canonical result DataFrame (deterministic projection of the CSV sink,
    corpus_miner.cpp:529-561): example_docs = first 2 of the sorted unique doc
    set (deviation: reference uses hash-set order)."""
    data = []
    for p in phrases:
        docs_in = sorted({str(o.doc_id) for o in p.occs})
        data.append((p.text, p.support, len(p.tokens), docs_in[:2]))
    data.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return spark.createDataFrame(data, RESULT_SCHEMA)


def mine_df(spark: SparkSession, docs: DataFrame, **kw) -> DataFrame:
    return phrases_to_df(spark, mine(spark, docs, **kw))
