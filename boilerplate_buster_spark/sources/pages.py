"""Seeded synthetic Common-Crawl-style pages (FIXTURES.md section 1; the
north-rule input table: url, warc_ts, html, text, lang).

Mirrors the reference's evaluation harness
(/root/reference/corpus-miner/generate_test_dataset.py:15-66: unique filler
words + golden phrases injected into k random docs), upgraded to be
SEEDED-DETERMINISTIC (the reference is unseeded) and page-shaped.

Two generators:

  * :func:`generate_pages_local`  - driver-side, small n, returns rows PLUS
    the golden boilerplate mask (expected extracted text per url) for
    byte-identical pytest assertions.
  * :func:`generate_pages_df`     - pure Catalyst expressions over
    spark.range(n): every cell derived from xxhash64(id, slot, seed), no
    Python, no driver loop - generates benchmark corpora of any size at
    full cluster parallelism with deterministic content.

Structure of every page: fillers ALWAYS separate boilerplate templates
(filler, T?, filler, T?, filler, T?, filler), so frequent n-grams can never
bridge two templates and the mined phrase set is exactly the injected
template set once each template clears min_docs.  Filler words are 64-bit
hash-unique across the corpus, so no spurious frequent phrase exists.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEMPLATES = [
    "home products pricing support contact sign in register",
    "subscribe to our newsletter for weekly updates and special offers",
    "this site uses cookies by continuing to browse you accept our privacy policy",
    "terms of service imprint sitemap careers press accessibility statement",
]

# NOTE: templates (incl. SITE_TEMPLATE) are pairwise 3-gram-DISJOINT on
# purpose: a shared 3-gram seed would let the greedy expansion hijack the
# lower-support template toward the higher-support continuation (faithful
# reference behavior, bloom_gram_miner.cpp:642-673) and the injection golden
# would no longer equal the mined set.  Overlap behavior itself is covered by
# the reference-binary cross-check tests instead.

# per-site footer pattern; {s} is the site number (site-local boilerplate)
SITE_TEMPLATE = "copyright site{s} incorporated all rights reserved worldwide"

N_SITES = 5
LANGS = ["en", "en", "en", "ru", "de"]

_BLOCK_TAGS = ["nav", "p", "div", "footer", "section"]


def _filler(rng, words: int) -> str:
    return " ".join(f"u{rng.getrandbits(62)}" for _ in range(words))


def generate_pages_local(n_pages: int, seed: int = 42):
    """-> (rows, golden) where rows are dicts with the 5 page columns and
    golden maps url -> (expected_extracted_text, expected_removed_spans).

    Golden spans are recorded AT INJECTION TIME (char offsets of each template
    inside ``text``), independent of the mining/extraction code under test.
    """
    import random

    rng = random.Random(seed)
    rows, golden = [], {}
    for i in range(n_pages):
        site = rng.randrange(N_SITES)
        url = f"https://site{site}.example.com/page/{i}"
        parts: list[str] = [_filler(rng, rng.randrange(3, 8))]
        is_template = [False]
        for t in TEMPLATES:
            if rng.random() < 0.7:
                parts.append(t)
                is_template.append(True)
                parts.append(_filler(rng, rng.randrange(3, 8)))
                is_template.append(False)
        parts.append(SITE_TEMPLATE.format(s=site))
        is_template.append(True)
        parts.append(_filler(rng, rng.randrange(3, 8)))
        is_template.append(False)

        text = "\n".join(parts)
        spans = []
        off = 0
        for part, is_t in zip(parts, is_template):
            if is_t:
                spans.append((off, off + len(part), part))
            off += len(part) + 1  # the joining newline

        # extracted = text minus the template char spans (spec core/extract.py)
        out, cursor = [], 0
        for s, e, _ in spans:
            out.append(text[cursor:s])
            cursor = e
        out.append(text[cursor:])
        golden[url] = ("".join(out), spans)

        html = "<html><head><title>page</title></head><body>" + "".join(
            f"<{tag}>{part}</{tag}>"
            for part, tag in zip(parts, _cycle_tags(len(parts)))
        ) + "</body></html>"
        rows.append(
            {
                "url": url,
                "warc_ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": LANGS[site % len(LANGS)],
            }
        )
    return rows, golden


def _cycle_tags(n: int) -> list[str]:
    return [_BLOCK_TAGS[i % len(_BLOCK_TAGS)] for i in range(n)]


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df_local(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    rows, _ = generate_pages_local(n_pages, seed)
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def generate_pages_df(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    partitions: int | None = None,
    filler_min: int = 3,
    filler_max: int = 7,
) -> DataFrame:
    """Expression-only deterministic page corpus of arbitrary size.

    Every random draw is xxhash64(id, <slot>, seed) - reproducible across
    cluster sizes and partitionings (content is a pure function of row id).
    Emits text-only pages (html = NULL exercises the text fallback path;
    the html parse path is covered by the local generator's corpus).
    """
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def h(slot: int) -> str:  # deterministic per (id, slot)
        return f"xxhash64(id, {slot}, {seed})"

    def filler(slot: int, max_words: int | None = None, min_words: int | None = None) -> str:
        max_words = filler_max if max_words is None else max_words
        min_words = filler_min if min_words is None else min_words
        n_words = f"({min_words} + pmod({h(slot)}, {max_words - min_words + 1}))"
        return (
            f"array_join(transform(sequence(1, {n_words}), "
            f"j -> concat('u', abs(xxhash64(id, {slot}, j, {seed})))), ' ')"
        )

    site = f"pmod({h(0)}, {N_SITES})"
    parts = [filler(1)]
    for k, t in enumerate(TEMPLATES):
        parts.append(f"IF(pmod({h(10 + k)}, 10) < 7, '{t}', NULL)")
        parts.append(f"IF(pmod({h(10 + k)}, 10) < 7, {filler(20 + k)}, NULL)")
    parts.append(f"concat('copyright site', {site}, ' incorporated all rights reserved worldwide')")
    parts.append(filler(40))

    langs_sql = ", ".join(f"'{l}'" for l in LANGS)
    return df.select(
        F.expr(f"concat('https://site', {site}, '.example.com/page/', id)").alias("url"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 86400)").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.expr("concat_ws('\\n', " + ", ".join(parts) + ")").alias("text"),
        F.expr(f"element_at(array({langs_sql}), cast(pmod({site}, {len(LANGS)}) AS int) + 1)").alias("lang"),
    )
