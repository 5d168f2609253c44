"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016) - the vocabulary-learning stage every LLM training pipeline runs
over its cleaned corpus.

Algorithm (classic BPE): words split into characters + a '</w>'
end-of-word marker; k rounds of (count adjacent symbol pairs weighted
by word frequency -> merge the most frequent pair everywhere), ties
broken by (lhs, rhs) byte order so training is fully deterministic.

Scale posture: the corpus is touched ONCE (word-count aggregation);
every training round then runs over the WORD VOCABULARY, which is
Heaps-law bounded (~millions of rows for a 100 TB corpus - still a
DataFrame, never a driver structure).  Each round is one vocab-sized
pair aggregation (output bounded by the symbol-pair vocabulary), a
1-row argmax collect, and one pure-map merge rewrite; lineage is cut
per round with localCheckpoint (the iterative-plan-growth gotcha).
Encoding is a single pure map: the merge table is model-sized, folded
into one chained expression - zero shuffles, zero joins.

Merges are applied with a string rewrite on the space-joined symbol
sequence: separators are doubled, so ' L  R ' occurrences share no
characters and one left-to-right replace() merges exactly the
non-overlapping adjacent pairs - bit-identical to the sequential fold
('a a a' + merge(a,a) -> 'aa a', the standard BPE semantics).  The
rewrite chain is generated ONCE and rendered per dialect (Spark SQL /
DuckDB), so the SQL oracle cannot drift from the operator.

No reference anchor: the reference mines phrases (corpus_miner.cpp);
BPE is the builder brief's tokenizer-training bar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _q(s: str) -> str:
    """Render a string literal (both dialects quote ' by doubling)."""
    return "'" + s.replace("'", "''") + "'"


def char_split_expr(col: str, dialect: str) -> str:
    """Initial BPE segmentation of a word: characters joined by single
    spaces, plus the '</w>' end-of-word symbol."""
    if dialect == "duckdb":
        return (
            f"trim(regexp_replace({col}, '(.)', '\\1 ', 'g')) || ' </w>'"
        )
    return f"concat(trim(regexp_replace({col}, '(.)', '$1 ')), ' </w>')"


def merge_expr(seg: str, lhs: str, rhs: str, dialect: str) -> str:
    """One BPE merge applied to a space-joined symbol string: double the
    separators so occurrences of ' lhs  rhs ' cannot overlap, replace,
    then collapse separators back."""
    pat = _q(f" {lhs}  {rhs} ")
    rep = _q(f" {lhs}{rhs} ")
    return (
        f"trim(replace(replace(concat(' ', replace({seg}, ' ', '  '), ' '), "
        f"{pat}, {rep}), '  ', ' '))"
    )


def segment_chain_expr(
    col: str, merges: list[tuple[str, str]], dialect: str = "spark"
) -> str:
    """The full encoder for one word: char split + every learned merge in
    rank order, as a single nested expression (pure map)."""
    e = char_split_expr(col, dialect)
    for lhs, rhs in merges:
        e = merge_expr(e, lhs, rhs, dialect)
    return e


_PAIR_EXPR = (
    "transform(slice(sequence(1, greatest(size(l) - 1, 1)), "
    "1, greatest(size(l) - 1, 0)), "
    "i -> struct(element_at(l, i) AS lhs, element_at(l, i + 1) AS rhs))"
)


def _train_bpe_driver(
    word_counts: dict[str, int], k: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Classic BPE over a collected word-count dict - same pair counting,
    same (count DESC, lhs, rhs) tie-break, same left-to-right merge as
    the distributed path (the pytest suite pins both against each
    other)."""
    from collections import Counter

    segs = {w: list(w) + ["</w>"] for w in word_counts}
    merges: list[tuple[int, str, str, int]] = []
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
        if c < min_count:
            break
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
    return merges


def train_bpe(
    docs: DataFrame,
    k: int,
    tokens_col: str = "tokens",
    min_count: int = 1,
    strategy: str = "auto",
    driver_max_vocab: int = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``k`` BPE merges from the corpus; returns
    [(rank, lhs, rhs, pair_count)] (model-sized, driver-side by design -
    this IS the tokenizer model).  Stops early when the best remaining
    pair falls under ``min_count``.

    strategy='auto' (the miner's precedent): the corpus aggregates to
    word counts either way (one shuffle); when the VOCABULARY fits
    ``driver_max_vocab`` the k merge rounds run driver-side over the
    collected counts (each distributed round costs a fixed ~1 s of job
    overhead that dwarfs the compute on a small vocabulary - measured
    8.9 s -> sub-second at 200k pages), and distributed (k vocab-sized
    Spark rounds) above it.  Identical output on every path."""
    # persisted so the strategy probe and the collect / checkpoint that
    # follows read the SAME materialized aggregate - without it the full
    # corpus explode+shuffle (the expensive stage) runs twice
    counts_df = (
        docs.select(F.explode(tokens_col).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    if strategy == "auto":
        probe = counts_df.limit(driver_max_vocab + 1).count()
        strategy = "driver" if probe <= driver_max_vocab else "distributed"
    if strategy == "driver":
        wc = {r["word"]: r["cnt"] for r in counts_df.collect()}
        counts_df.unpersist()
        return _train_bpe_driver(wc, k, min_count)
    vocab = (
        counts_df
        .withColumn("seg", F.expr(char_split_expr("word", "spark")))
        .localCheckpoint(eager=True)  # corpus scan runs exactly once
    )
    counts_df.unpersist()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, k + 1):
        best = (
            vocab.select(
                F.col("cnt"), F.expr("split(seg, ' ')").alias("l")
            )
            .select("cnt", F.explode(F.expr(_PAIR_EXPR)).alias("p"))
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_count:
            break
        lhs, rhs, c = best[0]["lhs"], best[0]["rhs"], best[0]["c"]
        merges.append((r, lhs, rhs, c))
        vocab = vocab.withColumn(
            "seg", F.expr(merge_expr("seg", lhs, rhs, "spark"))
        ).localCheckpoint(eager=True)  # bound lineage across rounds
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]):
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): encode every document with a learned
    merge list - the whole model folds into one chained expression
    applied per word inside a transform lambda.  Pure map over the scan:
    no shuffle, no join, no Python."""
    t = tokens_col
    chain = segment_chain_expr("x", merges, "spark")
    return docs.select(
        F.col(id_col),
        F.expr(f"size({t})").cast("long").alias("n_words"),
        F.expr(
            f"aggregate(transform({t}, x -> size(split({chain}, ' '))), "
            f"0, (a, b) -> a + b)"
        ).cast("long").alias("n_bpe_tokens"),
    )


def duckdb_train_sql(k: int, corpus_sql: str) -> str:
    """Generated DuckDB twin of train_bpe: ``corpus_sql`` must yield a
    token column ``word`` (one row per occurrence); the result is
    (rank, lhs, rhs, pair_count) for ``k`` unrolled merge rounds.  Each
    round re-derives pairs with unnest(range()), picks the argmax with
    the same (count DESC, lhs, rhs) tie-break, and applies the merge via
    scalar subqueries into the same doubled-separator rewrite."""
    # every CTE is MATERIALIZED: the rounds chain v0 -> v1 -> ... and
    # reference each b{i} twice; DuckDB's default inlining re-expands the
    # whole prefix per reference (measured 419 s for k=8 on 200 docs),
    # materialization makes the chain linear (sub-second)
    parts = [
        f"v0 AS MATERIALIZED (SELECT word, count(*) AS cnt, "
        f"{char_split_expr('word', 'duckdb')} AS seg "
        f"FROM ({corpus_sql}) GROUP BY word)"
    ]
    for i in range(1, k + 1):
        prev = f"v{i - 1}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT l[j] AS lhs, l[j + 1] AS rhs, sum(cnt) AS c "
            f"FROM (SELECT cnt, l, unnest(range(1, len(l))) AS j "
            f"      FROM (SELECT cnt, string_split(seg, ' ') AS l FROM {prev})) "
            f"GROUP BY lhs, rhs)"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT lhs, rhs, c FROM p{i} "
            f"ORDER BY c DESC, lhs, rhs LIMIT 1)"
        )
        seg = (
            f"trim(replace(replace(concat(' ', replace(seg, ' ', '  '), ' '), "
            f"(SELECT ' ' || lhs || '  ' || rhs || ' ' FROM b{i}), "
            f"(SELECT ' ' || lhs || rhs || ' ' FROM b{i})), '  ', ' '))"
        )
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT word, cnt, {seg} AS seg FROM {prev})"
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS rank, lhs, rhs, CAST(c AS BIGINT) AS pair_count "
        f"FROM b{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ", ".join(parts) + " " + unions
