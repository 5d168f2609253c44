"""DOM-heuristic main-content extraction (Boilerpipe/jusText-style).

Second extraction strategy named by the north rule ("DOM heuristics")
alongside the corpus-statistical BloomSpan strip: classify each DOM text
block as content/boilerplate from LOCAL structural signals, no corpus pass
needed.  Published heuristics (Kohlschutter et al. WSDM'10 "Boilerplate
Detection Using Shallow Text Features"; Pomikalek'11 jusText):

  boilerplate iff
    * enclosing tag is navigation chrome (nav/header/footer/aside/form), OR
    * link density  > max_link_density  (default 1/3), OR
    * token count   < min_tokens       (default 3).

Plan shape: ONE Arrow-batched parse (mapInPandas emitting the per-block
rows — the same per-row Python cost Stage 1 pays, then never again), then
classification, filtering, and per-url reassembly are pure Catalyst
(whole-stage-codegen'd): integer link-density compare, array-based token
count, array_sort on (block_id) for deterministic reassembly without a
window shuffle.  At 10^12 docs the parse is a pure map (partition-parallel,
no shuffle); the reassembly groupBy shuffles on url exactly once.

The classifier thresholds are exposed so the contract oracle can recompute
the decision in plain SQL from the block table's columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from boilerplate_buster_spark.core.domblocks import html_to_blocks
from boilerplate_buster_spark.functions.tokenizer import tokens

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("link_chars", T.IntegerType()),
    ]
)

BAD_TAGS = ("nav", "header", "footer", "aside", "form")


def dom_blocks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, html) -> one row per DOM text block with layout stats.

    Arrow-batched: one stdlib parse per page, vectorized transfer back."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, raw in zip(pdf["url"], pdf[html_col]):
                for i, b in enumerate(html_to_blocks(raw)):
                    rows.append(
                        (url, i, b["tag"], b["depth"], b["text"],
                         b["n_chars"], b["link_chars"])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA])

    return pages.select("url", html_col).mapInPandas(run, BLOCK_SCHEMA)


def is_content(
    max_link_density_pct: int = 33, min_tokens: int = 3
) -> Column:
    """Catalyst predicate over a dom_blocks row.  Integer-exact: the link
    density compare is 100*link_chars <= pct*n_chars, so the oracle can
    reproduce it without floating point."""
    return (
        (~F.col("tag").isin(*BAD_TAGS))
        & (100 * F.col("link_chars") <= F.lit(max_link_density_pct) * F.col("n_chars"))
        & (F.size(tokens(F.col("text"))) >= min_tokens)
    )


def extract_by_heuristics(
    pages: DataFrame,
    html_col: str = "html",
    max_link_density_pct: int = 33,
    min_tokens: int = 3,
) -> DataFrame:
    """(url, html) -> (url, extracted_text): content blocks joined by \\n in
    document order.  Parse is a map; shuffles are all on url; reassembly via
    array_sort over collected (block_id, text) structs — no window, order
    deterministic regardless of partitioning.

    Emits ONE ROW PER DISTINCT INPUT URL: a page whose every block is
    boilerplate (or that has no text blocks at all) yields
    extracted_text = '' instead of disappearing — downstream joins and
    per-url metrics rely on the row count being stable under
    classification.  Implemented by unioning a block_id=-1 SENTINEL row per
    input page into the SAME url aggregate (filtered back out of the joined
    text), so the guarantee costs zero extra shuffles — still exactly one
    Exchange, on url."""
    blocks = dom_blocks(pages, html_col)
    kept = blocks.where(is_content(max_link_density_pct, min_tokens)).select(
        "url", "block_id", "text"
    )
    sentinels = pages.select(
        "url", F.lit(-1).alias("block_id"), F.lit("").alias("text")
    )
    return (
        kept.unionByName(sentinels)
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("block_id", "text"))
            ).alias("ordered")
        )
        .select(
            "url",
            F.array_join(
                F.expr("transform(filter(ordered, s -> s.block_id >= 0), s -> s.text)"),
                "\n",
            ).alias("extracted_text"),
        )
    )
