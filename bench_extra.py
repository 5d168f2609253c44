"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file exists so the optimization loop can time individual queries, isolate
phases with the noop sink, and capture .explain("formatted") plans without
touching the driver-timed bench).

Usage:
  python bench_extra.py --queries extract_pages,bpe_train_pages --reps 3
  python bench_extra.py --explain semantic_dedup_vecs --out plans/r07/semantic_dedup_vecs_before.txt
  python bench_extra.py --phases extract            # mine-path phase breakdown

Env contract identical to bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
Timing methodology identical (interleaved reps, min), except queries can be
subset so an A/B takes seconds, not 11 minutes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark):
    """Replicates bench.py's query setup; returns (queries dict, dfs dict).

    `queries[name]()` runs the same action bench.py times.  `dfs[name]()`
    returns the query's DataFrame (pre-action) for explain/noop isolation
    where the query shape allows it (list-returning queries are omitted)."""
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.operators import ann, bloomspan, dedup, text_stats
    from boilerplate_buster_spark.operators.closed_patterns import (
        closed_contiguous_patterns,
    )
    from boilerplate_buster_spark.operators.corpus_stats import (
        frequent_ngrams,
        word_doc_freq,
    )
    from boilerplate_buster_spark.operators.extraction import extract_main_content
    from boilerplate_buster_spark.sources import pages as pages_src

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "tokens", F.split("text", " ")
    )
    n_docs = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    n_pages = int(os.environ.get("BBS_BENCH_PAGES", 4 * n_docs))
    pages_path = f"/tmp/bbs_bench_pages_{n_pages}.parquet"
    if not os.path.exists(pages_path):
        pages_src.generate_pages_df(
            spark, n_pages, seed=42, partitions=4 * CPUS
        ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    pages_tok = pages.select(
        F.col("url").alias("doc_id"), F.split("text", " ").alias("tokens")
    )

    pages.limit(64).mapInPandas(
        lambda it: (pdf.assign(n=pdf["text"].str.len()) for pdf in it),
        "url string, warc_ts timestamp, html binary, text string, lang string, n int",
    ).count()

    q_vec_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q_vec = list(q_vec_row["embedding"])

    from boilerplate_buster_spark.operators.domheuristics import extract_by_heuristics
    from boilerplate_buster_spark.operators.pdf import extract_pdf_text, synthesize_pdfs
    from boilerplate_buster_spark.core.warcparse import make_warc
    from boilerplate_buster_spark.sources.warc import pages_from_warc_bytes

    def _warc_blobs(it):
        import pandas as _p

        for pdf in it:
            blob = make_warc(
                [(u, "2026-01-01T00:00:00Z", (h or "").encode())
                 for u, h in zip(pdf["url"], pdf["html"])],
                gzip_members=True,
            )
            yield _p.DataFrame({"content": [blob]})

    lineitem_path = f"{SF_DIR}/lineitem.parquet"

    from boilerplate_buster_spark.operators.lines import (
        contamination_flags,
        remove_boilerplate_lines,
    )
    from boilerplate_buster_spark.operators.lm import lm_quality_scores

    pages_ml = pages.select(
        F.col("url").alias("doc_id"),
        F.array_join(
            F.expr(
                "transform(sequence(0, greatest(cast(ceil(size(split(text, ' ')) / 10.0) AS int), 1) - 1), "
                "j -> array_join(slice(split(text, ' '), j * 10 + 1, 10), ' '))"
            ),
            "\n",
        ).alias("text"),
    )
    bench_grams_src = pages_tok.limit(64).select(
        F.expr("array_join(slice(tokens, 1, 8), ' ')").alias("g")
    )
    from boilerplate_buster_spark.operators.urls import redact_pii
    from boilerplate_buster_spark.operators.weblinks import (
        extract_links,
        link_graph_degrees,
    )

    link_pages = pages.select(
        "url",
        F.expr(
            "concat('<html><body><nav><a href=\"/\">Home</a> "
            "<a href=\"/about\">About</a></nav><p>', text, "
            "' <a href=\"https://ex.com/', "
            "CAST(abs(xxhash64(url)) % 1000 AS string), "
            "'\">more</a></p></body></html>')"
        ).alias("html"),
    )

    from boilerplate_buster_spark.operators.ann import semantic_dedup
    from boilerplate_buster_spark.operators.pagemeta import extract_jsonld
    from boilerplate_buster_spark.operators.text_stats import (
        extraction_eval,
        fold_punctuation,
    )
    from boilerplate_buster_spark.operators.urls import normalize_urls
    from boilerplate_buster_spark.operators.weblinks import anchor_text_index

    messy_urls = pages.select(
        F.expr(
            "concat('HTTPS://WWW.EX', CAST(pmod(xxhash64(url), 1000) AS string), "
            "'.COM:443/a/./b/../p/', url, '?utm_source=bench&x=1#frag')"
        ).alias("url")
    )
    jl_pages = pages.select(
        "url",
        F.expr(
            "concat('<html><head><script type=\"application/ld+json\">"
            '{"@type":"Article","name":"\', '
            "substr(translate(text, '\\\"', ' '), 1, 24), "
            "'\"}</script></head><body>x</body></html>')"
        ).alias("html"),
    )
    eval_pairs = pages.select(
        F.col("url").alias("doc_id"),
        F.col("text").alias("gold"),
        F.expr(
            "concat(array_join(slice(split(text, ' '), 6, "
            "greatest(size(split(text, ' ')) - 5, 0)), ' '), ' zz yy zz')"
        ).alias("extracted"),
    )
    bench_vecs = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast(pmod(xxhash64(id * 64 + i), 1000) AS float) / 1000 - 0.5)"
        ).alias("embedding"),
    )

    from boilerplate_buster_spark.operators.bpe import bpe_encode, train_bpe
    from boilerplate_buster_spark.operators.classify import (
        classify_docs,
        dsir_importance,
        hashed_bucket_probs,
    )
    from boilerplate_buster_spark.operators.packing import chunk_documents
    from boilerplate_buster_spark.operators.search import (
        inverted_index,
        search_terms,
    )
    from boilerplate_buster_spark.operators.text_stats import readability
    from boilerplate_buster_spark.operators.urls import host_stats

    _pinned_merges = [
        ("e", "</w>"), ("e", "r"), ("n", "</w>"), ("t", "</w>"),
        ("o", "r"), ("o", "w"), ("ow", "</w>"), ("er", "</w>"),
    ]
    cls_weights = spark.range(256).crossJoin(
        spark.range(3).withColumnRenamed("id", "c")
    ).selectExpr(
        "id AS bucket", "cast(c AS int) AS class",
        "cast((id * 31 + c * 17) % 201 - 100 AS long) AS w",
    )
    host_pages = pages.select(
        F.expr("concat('https://h', CAST(pmod(xxhash64(url), 500) AS string), "
               "'.ex.com/', url)").alias("url"),
        "text",
    )

    def _dsir_pages():
        target = pages_tok.filter(F.expr("pmod(xxhash64(doc_id), 10) = 0"))
        tp = hashed_bucket_probs(target, 4096, id_col="doc_id")
        rp = hashed_bucket_probs(pages_tok, 4096, id_col="doc_id")
        return dsir_importance(pages_tok, tp, rp, 4096).agg(
            F.sum("imp_e6"), F.count("*")
        ).collect()

    def _search_pages():
        idx = inverted_index(pages_tok, id_col="doc_id")
        return search_terms(
            idx, ["newsletter", "cookies", "privacy"], n_docs=n_pages
        ).agg(
            F.sum("score_e6"), F.count("*")
        ).collect()

    from boilerplate_buster_spark.operators.ann import pq_adc_topk, pq_encode
    from boilerplate_buster_spark.operators.dedup import fuzzy_pairs
    from boilerplate_buster_spark.operators.encoding import fix_double_utf8

    pq_codes_table = pq_encode(bench_vecs).localCheckpoint()

    moji_pages = pages.select(
        F.col("url").alias("doc_id"),
        F.expr(
            "concat(text, ' caff\\u00c3\\u00a9 don\\u00e2\\u20ac\\u2122t end')"
        ).alias("text"),
    )
    fuzzy_titled = pages.select(
        F.col("url").alias("doc_id"),
        F.expr(
            "concat('record number ', CAST(pmod(xxhash64(url), 50000) AS string))"
        ).alias("title"),
    )

    from boilerplate_buster_spark.operators.ann import kmeans_quantized
    from boilerplate_buster_spark.operators.sessions import (
        asof_join as _asof,
        session_stats,
        sessionize,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )

    queries = {
        "extract_pages": lambda: extract_main_content(
            spark, pages, min_docs=max(10, n_pages // 20), ngrams=3
        )[0].agg(F.sum(F.length("extracted_text"))).collect(),
        "dom_extract_pages": lambda: extract_by_heuristics(pages)
            .agg(F.sum(F.length("extracted_text"))).collect(),
        "pdf_roundtrip": lambda: extract_pdf_text(
            synthesize_pdfs(docs.withColumn("url", F.col("doc_id").cast("string")))
        ).agg(F.sum(F.length("pdf_text"))).collect(),
        "warc_roundtrip_pages": lambda: pages_from_warc_bytes(
            pages.select("url", "html").mapInPandas(_warc_blobs, "content binary")
        ).agg(F.sum(F.length("html"))).collect(),
        "mine_documents": lambda: bloomspan.mine_df(
            spark, docs.select("doc_id", "tokens"), min_docs=max(5, n_docs // 100), ngrams=3
        ).count(),
        "word_df": lambda: word_doc_freq(docs).count(),
        "ngram_df": lambda: frequent_ngrams(docs, 3, 5).count(),
        "minhash_lsh_pages": lambda: dedup.lsh_candidate_pairs(
            pages_tok, hash_fn="xxhash64").count(),
        "dedup_cluster_pages": lambda: dedup.duplicate_clusters(
            dedup.lsh_candidate_pairs(pages_tok, hash_fn="xxhash64")
        ).count(),
        "closed_patterns": lambda: closed_contiguous_patterns(
            spark, docs.select("tokens"), min_sup=max(20, n_docs // 50), min_l=2, max_len=10
        ).count(),
        "simhash_pages": lambda: dedup.simhash16(pages_tok).agg(
            F.countDistinct("simhash")
        ).collect(),
        "token_quality_stats": lambda: text_stats.token_stats(docs).join(
            text_stats.quality_score(docs), "doc_id"
        ).agg(F.avg("quality_e6"), F.avg("n_tokens")).collect(),
        "ann_topk": lambda: ann.cosine_topk(emb, q_vec, k=10).collect(),
        "embedding_neardup_lsh": lambda: ann.lsh_bucketed_neardup_pairs(
            emb, threshold=0.3, planes=6, dim=len(q_vec)
        ).count(),
        "pricing_summary": lambda: spark.read.parquet(lineitem_path)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
            .collect(),
        "web_graph_pages": lambda: link_graph_degrees(
            extract_links(link_pages)
        ).agg(F.sum("in_degree"), F.count("*")).collect(),
        "pii_redact_pages": lambda: redact_pii(
            pages.select(F.col("url").alias("doc_id"), "text"), id_col="doc_id"
        ).agg(F.sum("n_emails"), F.sum(F.length("redacted_text"))).collect(),
        "line_dedup_pages": lambda: remove_boilerplate_lines(
            pages_ml, min_df=max(20, n_pages // 100)
        ).agg(F.sum(F.length("clean_text"))).collect(),
        "lm_score_pages": lambda: lm_quality_scores(pages_tok)
            .agg(F.avg("lik_e6"), F.count("*")).collect(),
        "decontaminate_pages": lambda: contamination_flags(
            pages_tok, [r["g"] for r in bench_grams_src.collect()], ngram=8
        ).agg(F.sum("n_contaminated"), F.count("*")).collect(),
        "url_canonical_pages": lambda: normalize_urls(messy_urls)
            .agg(F.countDistinct("norm_url")).collect(),
        "jsonld_pages": lambda: extract_jsonld(jl_pages)
            .agg(F.count("*"), F.countDistinct("jtype")).collect(),
        "anchor_text_pages": lambda: anchor_text_index(
            extract_links(link_pages)
        ).agg(F.sum("n_links"), F.count("*")).collect(),
        "punct_fold_pages": lambda: fold_punctuation(
            pages.select(F.col("url").alias("doc_id"), "text")
        ).agg(F.sum(F.length("folded"))).collect(),
        "extraction_eval_pages": lambda: extraction_eval(eval_pairs)
            .agg(F.avg("f1_e6"), F.count("*")).collect(),
        "semantic_dedup_vecs": lambda: semantic_dedup(bench_vecs, k=32)
            .agg(F.sum(F.col("keep").cast("long")), F.count("*")).collect(),
        "bpe_train_pages": lambda: train_bpe(pages_tok, k=4),
        "bpe_encode_pages": lambda: bpe_encode(pages_tok, _pinned_merges)
            .agg(F.sum("n_bpe_tokens")).collect(),
        "classify_pages": lambda: classify_docs(
            pages_tok, cls_weights, n_classes=3, buckets=256
        ).agg(F.sum("score"), F.count("*")).collect(),
        "dsir_pages": _dsir_pages,
        "term_search_pages": _search_pages,
        "chunk_pages": lambda: chunk_documents(pages_tok, 64, 16)
            .agg(F.count("*"), F.sum("n_tokens")).collect(),
        "readability_pages": lambda: readability(
            pages.select(F.col("url").alias("doc_id"), "text")
        ).agg(F.sum("fre_e3"), F.count("*")).collect(),
        "host_stats_pages": lambda: host_stats(host_pages)
            .agg(F.sum("n_docs"), F.count("*")).collect(),
        "mojibake_pages": lambda: fix_double_utf8(moji_pages)
            .agg(F.sum(F.length("fixed_text")),
                 F.sum(F.col("was_fixed").cast("long"))).collect(),
        "pq_encode_vecs": lambda: pq_encode(bench_vecs).agg(
            F.sum(F.expr("aggregate(codes, 0, (a, b) -> a + b)"))
        ).collect(),
        "pq_adc_vecs": lambda: pq_adc_topk(
            pq_codes_table, [0.1] * 64, k=50
        ).collect(),
        "fuzzy_pairs_pages": lambda: fuzzy_pairs(fuzzy_titled)
            .agg(F.count("*"), F.sum("dist")).collect(),
        "kmeans_vecs": lambda: kmeans_quantized(
            bench_vecs, k=8, iters=2
        )[0].agg(F.sum("dist"), F.count_distinct("cluster_id")).collect(),
        "events_temporal": lambda: _asof(
            ev.select("event_id", "user_id", "ts"), pur,
            on=["user_id"], right_cols=["purchase_id"],
        ).agg(F.count("*"), F.count("asof_purchase_id")).collect() and
            session_stats(sessionize(ev, gap_s=28800))
            .agg(F.count("*"), F.sum("n_events")).collect(),
    }

    # DataFrame builders for explain/noop isolation (queries whose bench
    # action is a terminal agg over a single DataFrame)
    dfs = {
        "semantic_dedup_vecs": lambda: semantic_dedup(bench_vecs, k=32),
        "extraction_eval_pages": lambda: extraction_eval(eval_pairs),
        "lm_score_pages": lambda: lm_quality_scores(pages_tok),
        "minhash_lsh_pages": lambda: dedup.lsh_candidate_pairs(
            pages_tok, hash_fn="xxhash64"),
        "fuzzy_pairs_pages": lambda: fuzzy_pairs(fuzzy_titled),
        "classify_pages": lambda: classify_docs(
            pages_tok, cls_weights, n_classes=3, buckets=256),
        "pq_encode_vecs": lambda: pq_encode(bench_vecs),
        "pq_adc_vecs": lambda: pq_adc_topk(pq_codes_table, [0.1] * 64, k=50),
        "simhash_pages": lambda: dedup.simhash16(pages_tok),
        "web_graph_pages": lambda: link_graph_degrees(extract_links(link_pages)),
        "line_dedup_pages": lambda: remove_boilerplate_lines(
            pages_ml, min_df=max(20, n_pages // 100)),
        "extract_pages": lambda: extract_main_content(
            spark, pages, min_docs=max(10, n_pages // 20), ngrams=3)[0],
    }
    ctx = {
        "pages": pages, "pages_tok": pages_tok, "docs": docs,
        "n_pages": n_pages, "n_docs": n_docs, "F": F, "spark": spark,
    }
    return queries, dfs, ctx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--phases", default="")
    args = ap.parse_args()

    from boilerplate_buster_spark.session import get_spark

    spark = get_spark(
        "bbs-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, dfs, ctx = build(spark)

    if args.explain:
        # --explain q1,q2 --out plans/r07 --suffix before
        names = [q.strip() for q in args.explain.split(",") if q.strip()]
        for name in names:
            df = dfs[name]()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
                with open(path, "w") as f:
                    f.write(txt)
                print(f"wrote {path}")
            else:
                print(f"=== {name} ===\n{txt}")
        return

    if args.phases == "extract":
        _extract_phases(spark, ctx)
        return

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(queries)
    samples: dict[str, list[float]] = {n: [] for n in names}
    loads: list[float] = []
    for _ in range(args.reps):
        for n in names:
            loads.append(round(os.getloadavg()[0], 2))
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.perf_counter()
            queries[n]()
            samples[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "queries": {n: min(v) for n, v in samples.items()},
        "samples": samples,
        "loadavg_1m": {"min": min(loads), "max": max(loads),
                       "mean": round(sum(loads) / len(loads), 2)},
        "total": round(sum(min(v) for v in samples.values()), 3),
    }
    print(json.dumps(out))


def _extract_phases(spark, ctx) -> None:
    """Mine-path phase breakdown for the flagship extraction query."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.functions.tokenizer import tokens
    from boilerplate_buster_spark.operators import bloomspan
    from boilerplate_buster_spark.operators.corpus_stats import word_doc_freq
    from boilerplate_buster_spark.operators.extraction import (
        strip_text_pass,
        with_text_repr,
    )

    pages, n_pages = ctx["pages"], ctx["n_pages"]
    min_docs = max(10, n_pages // 20)
    t: dict[str, float] = {}

    def lap(name, fn):
        t0 = time.perf_counter()
        r = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {t[name]}s", flush=True)
        return r

    text_repr = with_text_repr(pages).select("url", "text_repr").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    lap("parse_persist", lambda: text_repr.count())
    docs = text_repr.select(
        F.col("url").alias("doc_id"), tokens("text_repr").alias("tokens")
    )
    lap("word_df_pass", lambda: word_doc_freq(docs)
        .filter(F.col("df") >= min_docs).count())
    fw = (
        word_doc_freq(docs).filter(F.col("df") >= min_docs)
        .select("word", F.xxhash64("word").alias("h")).collect()
    )
    cands = bloomspan.candidate_grams(docs, 3, min_docs, "doc_id", "tokens", fw=fw)
    lap("cand_agg_pass", lambda: cands.count())
    phrases = lap(
        "mine_full", lambda: bloomspan.mine(spark, docs, min_docs=min_docs, ngrams=3)
    )
    lap("strip_pass", lambda: strip_text_pass(
        text_repr, [p.text for p in phrases]
    ).agg(F.sum(F.length("extracted_text"))).collect())
    text_repr.unpersist()
    print(json.dumps({"phases": t}))


if __name__ == "__main__":
    main()
