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


def _doc_gram_counts(
    docs: DataFrame, k: int, tokens_col: str, id_col: str
) -> DataFrame:
    """(gram, df, ext_df): distinct-doc frequency of all k-grams, plus the
    distinct-doc count of EXTENDABLE occurrences (not at doc end) - the
    reference PrefixSpan emits a pattern only if its projected database is
    non-empty (corpus_miner.cpp:170-182), i.e. some occurrence can extend."""
    t = tokens_col
    cnt = f"greatest(size({t}) - {k} + 1, 0)"
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"array_distinct(transform(slice(sequence(1, greatest(size({t}) - {k} + 1, 1)), 1, {cnt}), "
                f"i -> struct(array_join(slice({t}, i, {k}), ' ') AS gram, "
                f"IF(i + {k} <= size({t}), 1, 0) AS ext)))"
            )
        ).alias("ge"),
    ).select(id_col, "ge.gram", "ge.ext")
    # per-doc max(ext): the doc counts as extendable if ANY occurrence is
    per_doc = pairs.groupBy(id_col, "gram").agg(F.max("ext").alias("ext"))
    return per_doc.groupBy("gram").agg(
        F.count("*").alias("df"), F.sum("ext").alias("ext_docs")
    )


def prefixspan_patterns(
    spark: SparkSession,
    docs: DataFrame,
    min_docs: int,
    min_l: int = 1,
    mode: str = "closed",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_len: int = 128,
) -> DataFrame:
    """Contiguous PrefixSpan patterns with the reference's ALL/CLOSED/MAXIMAL
    modes (prefixspan/corpus_miner.h:18, decision at corpus_miner.cpp:128-142)
    as a level-wise Spark plan; support = DISTINCT-DOC count (occ_delivery,
    corpus_miner.cpp:69-93), closure checks are FORWARD-only (right
    extension), and a pattern whose every occurrence ends its document is
    never emitted (the projected-db drop quirk, ":170-182").  Cross-checked
    against core/pyref.prefixspan_mine.

    One hash-aggregate per length k (per-doc array_distinct collapses repeats
    map-side) and one broadcast anti/left join between adjacent levels."""
    mode = mode.lower()
    if mode not in ("all", "closed", "maximal"):
        raise ValueError(f"unknown mode {mode!r}")
    docs = docs.select(id_col, tokens_col).persist()
    out_rows: list[tuple[str, int, int]] = []

    cur = (
        _doc_gram_counts(docs, 1, tokens_col, id_col)
        .filter(F.col("df") >= min_docs)
        .persist()
    )
    k = 1
    while k <= max_len:
        nxt = (
            _doc_gram_counts(docs, k + 1, tokens_col, id_col)
            .filter(F.col("df") >= min_docs)
            .persist()
        )
        nxt_n = nxt.count()

        if k >= min_l:
            emit = cur.filter(F.col("ext_docs") > 0)
            if mode != "all" and nxt_n > 0:
                # forward kill: a frequent (k+1)-gram PREFIXED by g
                kill = nxt.select(
                    F.expr(
                        "array_join(slice(split(gram, ' '), 1, size(split(gram, ' ')) - 1), ' ')"
                    ).alias("kgram"),
                    F.col("df").alias("ext_df"),
                )
                if mode == "maximal":
                    cond = emit["gram"] == kill["kgram"]
                else:  # closed: only equal-support extensions kill
                    cond = (emit["gram"] == kill["kgram"]) & (
                        emit["df"] == kill["ext_df"]
                    )
                emit = emit.join(F.broadcast(kill), cond, "left_anti")
            out_rows += [(r["gram"], r["df"], k) for r in emit.collect()]

        cur.unpersist()
        if nxt_n == 0:
            nxt.unpersist()
            break
        cur = nxt
        k += 1

    docs.unpersist()
    out_rows.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return spark.createDataFrame(out_rows, CLOSED_SCHEMA)
