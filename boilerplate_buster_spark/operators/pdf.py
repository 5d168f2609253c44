"""PDF text-layer extraction as a Spark stage.

Same plan shape as the HTML parse stage (operators/extraction.py): one
Arrow-batched map over (url, payload) — partition-parallel, no shuffle, no
per-row Python outside the vectorized batch.  Compressed/filtered streams
decode to NULL (see core/pdfparse docstring) and can be filtered JVM-side.

``synthesize_pdfs`` builds real single-page PDFs from a text column (via
core.pdfparse.make_pdf) so tests and the contract oracle get closed-form
fixtures: parse(synthesize(text)) == wrap_words(text) joined by \\n, and
" ".join of that == text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from boilerplate_buster_spark.core.pdfparse import make_pdf, parse_pdf_text

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("pdf_text", T.StringType()),
    ]
)


def extract_pdf_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(url, payload:binary) -> (url, pdf_text); NULL for non-PDF or
    fully-compressed payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "pdf_text": [parse_pdf_text(b) for b in pdf[payload_col]],
                }
            )

    return df.select("url", payload_col).mapInPandas(run, PDF_TEXT_SCHEMA)


def synthesize_pdfs(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    width: int = 60,
    compress: bool = False,
) -> DataFrame:
    """(url, text) -> (url, payload:binary) of real single-page PDFs
    (optionally /FlateDecode-compressed content streams)."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].astype(str),
                    "payload": [
                        make_pdf(t or "", width, compress) for t in pdf[text_col]
                    ],
                }
            )

    return df.select(df[url_col].alias(url_col), text_col).mapInPandas(run, schema)
