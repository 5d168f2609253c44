"""Page-metadata and sitemap operators - head metadata for indexing /
canonical dedup, sitemap entries for the crawl frontier.  Both are one
Arrow-batched mapInPandas over the page scan (no shuffle), kernels in
core/htmlmeta.py and core/sitemapparse.py."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boilerplate_buster_spark.core.htmlmeta import extract_meta
from boilerplate_buster_spark.core.sitemapparse import parse_sitemap

META_SCHEMA = (
    "url string, title string, description string, og_title string, "
    "canonical string, lang string, charset string"
)

SITEMAP_SCHEMA = (
    "sitemap_url string, is_index boolean, loc string, lastmod string, "
    "changefreq string, priority string"
)


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, description, og_title, canonical, lang, charset): head
    metadata per page; missing fields are empty strings."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                m = extract_meta(h)
                rows.append(
                    (u, m["title"], m["description"], m["og_title"],
                     m["canonical"], m["lang"], m["charset"])
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "title", "description", "og_title",
                         "canonical", "lang", "charset"],
            )

    return pages.select(url_col, html_col).mapInPandas(run, META_SCHEMA)


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """(sitemap_url, is_index, loc, lastmod, changefreq, priority): one row
    per sitemap entry (urlset urls, or child sitemaps of a sitemapindex)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, c in zip(pdf[url_col], pdf[content_col]):
                is_index, entries = parse_sitemap(c)
                for e in entries:
                    rows.append(
                        (u, is_index, e["loc"], e["lastmod"],
                         e["changefreq"], e["priority"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["sitemap_url", "is_index", "loc", "lastmod",
                         "changefreq", "priority"],
            )

    return sitemaps.select(url_col, content_col).mapInPandas(
        run, SITEMAP_SCHEMA
    )


TABLES_SCHEMA = (
    "url string, table_idx int, row_idx int, col_idx int, "
    "cell string, is_header boolean"
)


def extract_page_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, table_idx, row_idx, col_idx, cell, is_header): every table
    cell of every page (core/htmltables kernel) - the WebTables-style
    structured-data extraction, one Arrow-batched map over the page scan."""
    from boilerplate_buster_spark.core.htmltables import extract_tables

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                for ti, table in enumerate(extract_tables(h)):
                    for ri, row in enumerate(table):
                        for ci, (text, hdr) in enumerate(row):
                            rows.append((u, ti, ri, ci, text, hdr))
            yield pd.DataFrame(
                rows,
                columns=["url", "table_idx", "row_idx", "col_idx",
                         "cell", "is_header"],
            )

    return pages.select(url_col, html_col).mapInPandas(run, TABLES_SCHEMA)


JSONLD_RE = r'<script type="application/ld\+json">(.*?)</script>'


def extract_jsonld(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, block_idx, jtype, name, author_name): schema.org JSON-LD
    structured data - the machine-readable page facts (article type,
    headline, author) that knowledge-graph and metadata-enrichment
    pipelines mine from Common-Crawl HTML.

    Fully JVM-side: script bodies come from one regexp_extract_all over
    the page scan (non-greedy match per block; JSON-LD bodies cannot
    contain '</script>' by construction), parsed by Catalyst's from_json
    with an explicit schema - no Python, no shuffle, columns prune to
    (url, html).  Malformed JSON yields NULL fields, never an error
    (from_json PERMISSIVE mode), so one bad page cannot kill a 10^12-page
    job.  posexplode keeps the block index for multi-block pages."""
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_RE), F.lit(1))
        ).alias("block_idx", "block"),
    )
    # two-step select: from_json evaluates ONCE (a single projection with
    # three j.* references would inline the parse three times - Catalyst
    # keeps multiply-referenced non-trivial aliases per reference)
    parsed = blocks.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.from_json(
            "block", "`@type` STRING, name STRING, author STRUCT<name: STRING>"
        ).alias("j"),
    )
    return parsed.select(
        "url",
        "block_idx",
        F.col("j").getField("@type").alias("jtype"),
        F.col("j.name").alias("name"),
        F.col("j.author.name").alias("author_name"),
    )


def feed_entries(
    feeds: DataFrame, url_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, item_idx, title, link, published): every RSS item /
    Atom entry per feed, via the real XML parser (core/feedparse.py)
    inside one Arrow batch - the crawl-frontier companion to
    sitemap_entries.  Malformed feeds contribute no rows (skip, never
    garble).  Pure map, linear output."""
    import pandas as pd

    from boilerplate_buster_spark.core.feedparse import parse_feed

    def run(batches):
        for pdf in batches:
            u, i, t, l, p = [], [], [], [], []
            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                for idx, (title, link, pub) in enumerate(parse_feed(xml or "")):
                    u.append(url)
                    i.append(idx)
                    t.append(title)
                    l.append(link)
                    p.append(pub)
            yield pd.DataFrame(
                {
                    "feed_url": u,
                    "item_idx": pd.Series(i, dtype="int64"),
                    "title": t,
                    "link": l,
                    "published": p,
                }
            )

    return feeds.select(url_col, xml_col).mapInPandas(
        run,
        "feed_url string, item_idx long, title string, link string, "
        "published string",
    )


OUTLINE_SCHEMA = (
    "url string, pos int, level int, text string, parent_pos int"
)


def heading_outline(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, pos, level, text, parent_pos): the h1-h6 document outline in
    order, each heading linked to its nearest PRIOR strictly-higher
    heading (-1 = root) - the structural skeleton section-aware chunkers
    and citation anchors consume.  One Arrow-batched mapInPandas over the
    page scan, one-to-many, no shuffle; kernel in core/htmlmeta.py
    (same tolerant stdlib parser as the metadata kernel)."""
    from boilerplate_buster_spark.core.htmlmeta import extract_outline

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                for pos, level, text, parent in extract_outline(h):
                    rows.append((u, pos, level, text, parent))
            yield pd.DataFrame(
                rows, columns=["url", "pos", "level", "text", "parent_pos"]
            )

    return pages.select(url_col, html_col).mapInPandas(run, OUTLINE_SCHEMA)
