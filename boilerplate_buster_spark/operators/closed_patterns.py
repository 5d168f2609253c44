"""BIDE+/CloSpan contiguous CLOSED-pattern mining, Spark-first (SURVEY.md
section 2.6 C1/C2; reference: corpus-miner/bide/bide_miner.cpp:43-119,
clospan/clospan_miner.cpp:40-105).

Key reformulation (instead of porting the recursive DFS): a CONTIGUOUS
pattern is just an n-gram, so

  closed k-patterns = { g : occ_count(g) >= min_sup
                          AND no (k+1)-gram with g as PREFIX has equal count   (forward closure,  bide_miner.cpp:10-15)
                          AND no (k+1)-gram with g as SUFFIX has equal count } (backward closure, bide_miner.cpp:19-41)

Support = OCCURRENCE count, not distinct docs (bide_miner.cpp:55; observed:
a phrase repeated inside one doc counts twice - FIXTURES.md 3a).  Any
extension with count equal to a frequent pattern's count is itself frequent,
so comparing against the FREQUENT (k+1)-gram level is exhaustive.

The level-wise loop runs one hash-aggregate per length k (map-side partial
counts, uniform gram keys) and two broadcast anti-joins between adjacent
levels; it terminates at the longest frequent phrase.  The reference's BIDE
and CloSpan differ only in a backward-check early-exit that never changes the
result set (an occurrence at doc start caps the prefix count below support in
both); one implementation serves both names - pinned by the cross-check tests
against the reference binary (tests/test_pyref_crosscheck.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLOSED_SCHEMA = T.StructType(
    [
        T.StructField("phrase", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
        T.StructField("length", T.IntegerType(), False),
    ]
)


def _gram_counts(docs: DataFrame, k: int, min_sup: int, tokens_col: str) -> DataFrame:
    """(gram, freq): occurrence counts of all k-grams with freq >= min_sup."""
    t = tokens_col
    cnt = f"greatest(size({t}) - {k} + 1, 0)"
    grams = docs.select(
        F.explode(
            F.expr(
                f"transform(slice(sequence(1, greatest(size({t}) - {k} + 1, 1)), 1, {cnt}), "
                f"i -> array_join(slice({t}, i, {k}), ' '))"
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_sup)
    )


def closed_contiguous_patterns(
    spark: SparkSession,
    docs: DataFrame,
    min_sup: int,
    min_l: int = 1,
    tokens_col: str = "tokens",
    max_len: int = 128,
) -> DataFrame:
    """All closed contiguous patterns (phrase, freq, length), canonical order
    (-freq*length, -freq, phrase).  Serves `--algo bide` AND `--algo clospan`.
    """
    docs = docs.select(tokens_col).persist()
    out_rows: list[tuple[str, int, int]] = []

    cur = _gram_counts(docs, 1, min_sup, tokens_col).persist()
    k = 1
    while k <= max_len:
        nxt = _gram_counts(docs, k + 1, min_sup, tokens_col).persist()
        nxt_n = nxt.count()

        if k >= min_l:
            if nxt_n == 0:
                survivors = cur
            else:
                # forward closure: drop g if some (k+1)-gram PREFIXED by g has
                # equal count; backward: same with g as SUFFIX.
                ext = nxt.select(
                    F.expr(
                        "array_join(slice(split(gram, ' '), 1, size(split(gram, ' ')) - 1), ' ')"
                    ).alias("pfx"),
                    F.expr("array_join(slice(split(gram, ' '), 2, size(split(gram, ' ')))"
                           ", ' ')").alias("sfx"),
                    F.col("freq").alias("ext_freq"),
                )
                kill = (
                    ext.select(F.col("pfx").alias("gram"), "ext_freq")
                    .unionAll(ext.select(F.col("sfx").alias("gram"), "ext_freq"))
                    .distinct()
                )
                survivors = cur.join(
                    F.broadcast(kill),
                    (cur["gram"] == kill["gram"]) & (cur["freq"] == kill["ext_freq"]),
                    "left_anti",
                )
            out_rows += [
                (r["gram"], r["freq"], k) for r in survivors.collect()
            ]

        cur.unpersist()
        if nxt_n == 0:
            nxt.unpersist()
            break
        cur = nxt
        k += 1

    docs.unpersist()
    out_rows.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return spark.createDataFrame(out_rows, CLOSED_SCHEMA)


# aliases mirroring the reference's algorithm names
bide_mine_df = closed_contiguous_patterns
clospan_mine_df = closed_contiguous_patterns
