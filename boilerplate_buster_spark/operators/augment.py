"""Deterministic text-augmentation operators for denoising-objective
training data (word dropout, BART-style span infilling).  Real pipelines
need augmentation to be REPRODUCIBLE - a re-run must corrupt identically
or eval deltas are noise - so every random choice here comes from the
portable 60-bit hash of (doc id, position, tag), never an RNG: the same
(corpus, tag) always yields the same corruption, any engine can
recompute it, and the DuckDB oracle checks it bit-for-bit.

Both operators are PURE PROJECTIONS (transform/filter over the token
array in-scan): zero shuffles at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.filters import _sql_lit
from boilerplate_buster_spark.operators.text_stats import h60


def _coin(id_col: str, tag: str, idx: str) -> str:
    # tag is caller-supplied: escape it rather than trusting it quote-free
    tag_lit = _sql_lit(f"#{tag}#", "spark")
    return h60(
        f"concat(CAST({id_col} AS string), {tag_lit}, CAST({idx} AS string))"
    )


def word_dropout(
    docs: DataFrame,
    rate_e6: int = 100000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    tag: str = "wd",
) -> DataFrame:
    """(id, n_tokens, n_dropped, aug_text): drop token i (0-based) iff
    h60(id # tag # i) % 1e6 < rate_e6 - an exact rate_e6-expected
    Bernoulli per position, deterministic in (doc, position, tag).
    Change `tag` to draw an independent corruption of the same corpus."""
    t = tokens_col
    kept = (
        f"filter({t}, (x, i) -> "
        f"pmod({_coin(id_col, tag, 'i')}, 1000000) >= {int(rate_e6)})"
    )
    return docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.expr(f"size({t}) - size({kept})").cast("long").alias("n_dropped"),
        F.expr(f"array_join({kept}, ' ')").alias("aug_text"),
    )


def span_infilling(
    docs: DataFrame,
    span: int = 3,
    rate_e6: int = 80000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    mask_token: str = "<mask>",
    tag: str = "sc",
) -> DataFrame:
    """(id, n_tokens, n_masked, n_spans, corrupted): BART-style span
    infilling - position i (0-based) STARTS a masked span of `span`
    tokens iff h60(id # tag # i) % 1e6 < rate_e6; overlapping/adjacent
    spans MERGE (the documented convention - greedy non-overlap needs a
    sequential fold; merged spans keep every rule a bounded-lookback
    closed form both engines evaluate identically).  Each maximal masked
    run is replaced by ONE `mask_token` (BART infilling: span length is
    hidden from the model).

    masked(i) = any of i, i-1, .., i-span+1 fired; run-start(i) =
    masked(i) AND NOT masked(i-1).  Pure projection, no shuffle."""
    t = tokens_col
    s = int(span)

    def fired(idx: str) -> str:
        return (
            f"(({idx}) >= 0 AND "
            f"pmod({_coin(id_col, tag, idx)}, 1000000) < {int(rate_e6)})"
        )

    def masked(idx: str) -> str:
        return "(" + " OR ".join(fired(f"({idx}) - {d}") for d in range(s)) + ")"

    m_i = masked("i")
    start_i = f"({m_i} AND NOT {masked('i - 1')})"
    parts = (
        f"filter(transform({t}, (x, i) -> "
        f"CASE WHEN NOT {m_i} THEN x "
        f"WHEN {start_i} THEN {_sql_lit(mask_token, 'spark')} END), "
        f"x -> x IS NOT NULL)"
    )
    n_masked = (
        f"size(filter(sequence(0, size({t}) - 1), i -> {m_i}))"
    )
    n_spans = (
        f"size(filter(sequence(0, size({t}) - 1), i -> {start_i}))"
    )
    return docs.filter(F.expr(f"size({t}) > 0")).select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.expr(n_masked).cast("long").alias("n_masked"),
        F.expr(n_spans).cast("long").alias("n_spans"),
        F.expr(f"array_join({parts}, ' ')").alias("corrupted"),
    )
