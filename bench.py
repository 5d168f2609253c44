"""Headline benchmark. Prints TWO JSON lines: first the full-detail record
(per-query samples, loadavg traces), then a COMPACT line (<500 chars) with
the headline numbers only - the driver keeps the tail of the output, so the
parseable summary must come LAST (round-5 artifact lesson: the detail line
alone outgrew the captured tail and BENCH_r05 recorded parsed: null).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BBS_BENCH_PAGES    (override synthetic page-corpus size; default 4x the
                         documents row count of the chosen sf),
     BBS_BENCH_REPS     (interleaved repetitions per query; default 2),
     BBS_BENCH_MAX_EXTRA (extra load-triggered reps cap; default 2 - extra
                         interleaved reps run while the recorded 1-min
                         loadavg mean exceeds half the advertised cores),
     BBS_BENCH_PINNED_CORES (taskset core list for the pinned extraction
                         leg, default "0-7"; set to "" to skip the leg).

Pinned leg (round-6): the flagship extraction query is re-run in a child
process pinned with `taskset -c 0-7` to its own 8-core budget (the
BENCH/BASELINE.md pinning protocol).  Ambient tenant load lands mostly on
the other 24 cores, so the pinned figure is the load-insensitive
round-over-round comparable; the full-width local[32] number remains the
throughput headline.

Measurement protocol (round-4): every query is timed BBS_BENCH_REPS times in
INTERLEAVED round-robin order (q1 q2 ... qN, q1 q2 ... qN) and the reported
per-query number is the MIN across reps.  A single-shot sample on this shared
host is meaningless - identical queries vary 3-15x with ambient tenant load
(see BENCH/BASELINE.md host-calibration study) - and interleaving spreads any
load spike across all queries instead of poisoning whichever one it landed
on.  The JSON also carries /proc/loadavg samples (1-min, taken before each
rep) and the per-query raw samples so a regression can be adjudicated
real-vs-ambient after the fact.

The page-extraction query also reports pages_per_sec - the north metric
(BASELINE.json): pages extracted per second with the full two-pass
mine+broadcast+strip pipeline."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
REPS = max(1, int(os.environ.get("BBS_BENCH_REPS", 2)))


def main() -> None:
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.session import get_spark
    from boilerplate_buster_spark.operators import ann, bloomspan, dedup, text_stats
    from boilerplate_buster_spark.operators.closed_patterns import (
        closed_contiguous_patterns,
    )
    from boilerplate_buster_spark.operators.corpus_stats import frequent_ngrams, word_doc_freq
    from boilerplate_buster_spark.operators.extraction import extract_main_content
    from boilerplate_buster_spark.sources import pages as pages_src

    spark = get_spark(
        "bbs-bench", master=f"local[{CPUS}]", shuffle_partitions=max(2 * CPUS, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "tokens", F.split("text", " ")
    )
    n_docs = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # setup (untimed): synthetic page corpus, materialized once
    n_pages = int(os.environ.get("BBS_BENCH_PAGES", 4 * n_docs))
    pages_path = f"/tmp/bbs_bench_pages_{n_pages}.parquet"
    if not os.path.exists(pages_path):
        pages_src.generate_pages_df(spark, n_pages, seed=42, partitions=4 * CPUS).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    pages_tok = pages.select(
        F.col("url").alias("doc_id"), F.split("text", " ").alias("tokens")
    )

    # untimed warmup: first Arrow/mapInPandas action pays Python-worker pool
    # spawn + codegen JIT (~3-5 s once per JVM); exclude it so queries
    # measure steady state, as a long-lived cluster would run
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

    queries: list[tuple[str, object]] = [
        ("extract_pages", lambda: extract_main_content(
            spark, pages, min_docs=max(10, n_pages // 20), ngrams=3
        )[0].agg(F.sum(F.length("extracted_text"))).collect()),
        ("dom_extract_pages", lambda: extract_by_heuristics(pages)
            .agg(F.sum(F.length("extracted_text"))).collect()),
        ("pdf_roundtrip", lambda: extract_pdf_text(
            synthesize_pdfs(docs.withColumn("url", F.col("doc_id").cast("string")))
        ).agg(F.sum(F.length("pdf_text"))).collect()),
        ("warc_roundtrip_pages", lambda: pages_from_warc_bytes(
            pages.select("url", "html").mapInPandas(_warc_blobs, "content binary")
        ).agg(F.sum(F.length("html"))).collect()),
        ("mine_documents", lambda: bloomspan.mine_df(
            spark, docs.select("doc_id", "tokens"), min_docs=max(5, n_docs // 100), ngrams=3
        ).count()),
        ("word_df", lambda: word_doc_freq(docs).count()),
        ("ngram_df", lambda: frequent_ngrams(docs, 3, 5).count()),
        ("minhash_lsh_pages", lambda: dedup.lsh_candidate_pairs(
            pages_tok, hash_fn="xxhash64").count()),
        ("dedup_cluster_pages", lambda: dedup.duplicate_clusters(
            dedup.lsh_candidate_pairs(pages_tok, hash_fn="xxhash64")
        ).count()),
        ("closed_patterns", lambda: closed_contiguous_patterns(
            spark, docs.select("tokens"), min_sup=max(20, n_docs // 50), min_l=2, max_len=10
        ).count()),
        ("simhash_pages", lambda: dedup.simhash16(pages_tok).agg(
            F.countDistinct("simhash")
        ).collect()),
        ("token_quality_stats", lambda: text_stats.token_stats(docs).join(
            text_stats.quality_score(docs), "doc_id"
        ).agg(F.avg("quality_e6"), F.avg("n_tokens")).collect()),
        ("ann_topk", lambda: ann.cosine_topk(emb, q_vec, k=10).collect()),
        ("embedding_neardup_lsh", lambda: ann.lsh_bucketed_neardup_pairs(
            emb, threshold=0.3, planes=6, dim=len(q_vec)
        ).count()),
        ("pricing_summary", lambda: spark.read.parquet(lineitem_path)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
            .collect()),
    ]

    # round-4 LLM-pipeline operators at pages scale
    from boilerplate_buster_spark.operators.lines import (
        contamination_flags,
        remove_boilerplate_lines,
    )
    from boilerplate_buster_spark.operators.lm import lm_quality_scores

    # multi-line view of the page corpus: 10-token chunks as lines
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
    # round-5 web-graph + PII operators at pages scale
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

    queries += [
        ("web_graph_pages", lambda: link_graph_degrees(
            extract_links(link_pages)
        ).agg(F.sum("in_degree"), F.count("*")).collect()),
        ("pii_redact_pages", lambda: redact_pii(
            pages.select(F.col("url").alias("doc_id"), "text"), id_col="doc_id"
        ).agg(F.sum("n_emails"), F.sum(F.length("redacted_text"))).collect()),
        ("line_dedup_pages", lambda: remove_boilerplate_lines(
            pages_ml, min_df=max(20, n_pages // 100)
        ).agg(F.sum(F.length("clean_text"))).collect()),
        ("lm_score_pages", lambda: lm_quality_scores(pages_tok)
            .agg(F.avg("lik_e6"), F.count("*")).collect()),
        ("decontaminate_pages", lambda: contamination_flags(
            pages_tok, [r["g"] for r in bench_grams_src.collect()], ngram=8
        ).agg(F.sum("n_contaminated"), F.count("*")).collect()),
    ]

    # round-5 canonicalization / structured-data / semantic-dedup operators
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
    # deterministic synthetic vectors sized for the dedup self-join
    bench_vecs = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast(pmod(xxhash64(id * 64 + i), 1000) AS float) / 1000 - 0.5)"
        ).alias("embedding"),
    )

    queries += [
        ("url_canonical_pages", lambda: normalize_urls(messy_urls)
            .agg(F.countDistinct("norm_url")).collect()),
        ("jsonld_pages", lambda: extract_jsonld(jl_pages)
            .agg(F.count("*"), F.countDistinct("jtype")).collect()),
        ("anchor_text_pages", lambda: anchor_text_index(
            extract_links(link_pages)
        ).agg(F.sum("n_links"), F.count("*")).collect()),
        ("punct_fold_pages", lambda: fold_punctuation(
            pages.select(F.col("url").alias("doc_id"), "text")
        ).agg(F.sum(F.length("folded"))).collect()),
        ("extraction_eval_pages", lambda: extraction_eval(eval_pairs)
            .agg(F.avg("f1_e6"), F.count("*")).collect()),
        ("semantic_dedup_vecs", lambda: semantic_dedup(bench_vecs, k=32)
            .agg(F.sum(F.col("keep").cast("long")), F.count("*")).collect()),
    ]

    # round-5 curation/model operators at pages scale
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
        # terms from the page TEMPLATES (the documents-table vocabulary
        # does not occur in synthetic pages - searching it measures an
        # empty pipeline)
        return search_terms(
            idx, ["newsletter", "cookies", "privacy"], n_docs=n_pages
        ).agg(
            F.sum("score_e6"), F.count("*")
        ).collect()

    queries += [
        ("bpe_train_pages", lambda: train_bpe(pages_tok, k=4)),
        ("bpe_encode_pages", lambda: bpe_encode(pages_tok, _pinned_merges)
            .agg(F.sum("n_bpe_tokens")).collect()),
        ("classify_pages", lambda: classify_docs(
            pages_tok, cls_weights, n_classes=3, buckets=256
        ).agg(F.sum("score"), F.count("*")).collect()),
        ("dsir_pages", _dsir_pages),
        ("term_search_pages", _search_pages),
        ("chunk_pages", lambda: chunk_documents(pages_tok, 64, 16)
            .agg(F.count("*"), F.sum("n_tokens")).collect()),
        ("readability_pages", lambda: readability(
            pages.select(F.col("url").alias("doc_id"), "text")
        ).agg(F.sum("fre_e3"), F.count("*")).collect()),
        ("host_stats_pages", lambda: host_stats(host_pages)
            .agg(F.sum("n_docs"), F.count("*")).collect()),
    ]

    from boilerplate_buster_spark.operators.ann import pq_adc_topk, pq_encode
    from boilerplate_buster_spark.operators.dedup import fuzzy_pairs
    from boilerplate_buster_spark.operators.encoding import fix_double_utf8

    # the materialized PQ index, built in setup (untimed): the build cost
    # is what the pq_encode_vecs entry measures
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

    queries += [
        ("mojibake_pages", lambda: fix_double_utf8(moji_pages)
            .agg(F.sum(F.length("fixed_text")),
                 F.sum(F.col("was_fixed").cast("long"))).collect()),
        # PQ: index build and query timed separately (deployment shape -
        # the code table is materialized once, queried many times; a fused
        # encode+ADC plan re-evaluates the encode expression per exploded
        # row, measured 9x slower)
        ("pq_encode_vecs", lambda: pq_encode(bench_vecs).agg(
            F.sum(F.expr("aggregate(codes, 0, (a, b) -> a + b)"))
        ).collect()),
        ("pq_adc_vecs", lambda: pq_adc_topk(
            pq_codes_table, [0.1] * 64, k=50
        ).collect()),
        ("fuzzy_pairs_pages", lambda: fuzzy_pairs(fuzzy_titled)
            .agg(F.count("*"), F.sum("dist")).collect()),
    ]

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

    queries += [
        # iterative integer Lloyd over the 10k synthetic vectors: two
        # constant-folded assignment scans + two k*dim hash aggregates
        ("kmeans_vecs", lambda: kmeans_quantized(
            bench_vecs, k=8, iters=2
        )[0].agg(F.sum("dist"), F.count_distinct("cluster_id")).collect()),
        # union-carry as-of join + gap sessionization over the events table
        ("events_temporal", lambda: _asof(
            ev.select("event_id", "user_id", "ts"), pur,
            on=["user_id"], right_cols=["purchase_id"],
        ).agg(F.count("*"), F.count("asof_purchase_id")).collect() and
            session_stats(sessionize(ev, gap_s=28800))
            .agg(F.count("*"), F.sum("n_events")).collect()),
    ]

    samples: dict[str, list[float]] = {name: [] for name, _ in queries}
    loads: list[float] = []

    def run_rep() -> None:
        for name, fn in queries:
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 3))

    for _rep in range(REPS):
        run_rep()
    # load-aware extension (round-5): when ambient load during the run
    # averaged above a third of the advertised cores, every rep so far is
    # suspect (neighbor tenants - see BENCH/BASELINE.md), so the min-of-REPS
    # is likely still contaminated; take up to BBS_BENCH_MAX_EXTRA more
    # interleaved reps so the artifact converges toward the quiet-window
    # number even on a contended box.  (Threshold was cpus/2 initially; two
    # round-5 runs with mean loadavg 13.9 and 15.7 slipped under it while
    # still contaminating extract/dedup mins - cpus/3 catches that band.)
    max_extra = max(0, int(os.environ.get("BBS_BENCH_MAX_EXTRA", 2)))
    extra_reps = 0
    while extra_reps < max_extra and sum(loads) / len(loads) > CPUS / 3:
        run_rep()
        extra_reps += 1

    spark.stop()

    pinned = _run_pinned_leg(pages_path, n_pages)

    timings = {name: min(vals) for name, vals in samples.items()}
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    load_mean = round(sum(loads) / len(loads), 2)
    detail = {
        "metric": "total_headline_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "pages_per_sec": round(n_pages / timings["extract_pages"], 1),
        "n_pages": n_pages,
        "dom_pages_per_sec": round(n_pages / timings["dom_extract_pages"], 1),
        "cpus": CPUS,
        "reps": REPS,
        "extra_reps": extra_reps,
        "samples": samples,
        "loadavg_1m": {
            "min": min(loads), "max": max(loads), "mean": load_mean,
        },
        **pinned,
    }
    print(json.dumps(detail))
    # compact line LAST so a tail-truncated capture still parses
    compact = {
        "metric": "total_headline_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "cpus": CPUS,
        "pages_per_sec": detail["pages_per_sec"],
        "dom_pages_per_sec": detail["dom_pages_per_sec"],
        "extract_sec": timings["extract_pages"],
        "n_queries": len(timings),
        "reps": REPS,
        "extra_reps": extra_reps,
        "loadavg_1m_mean": load_mean,
    }
    for key in ("pinned_pages_per_sec", "pinned_extract_sec", "pinned_cores"):
        if key in pinned:
            compact[key] = pinned[key]
    print(json.dumps(compact))


def _run_pinned_leg(pages_path: str, n_pages: int) -> dict:
    """Run the flagship extraction query in a `taskset`-pinned child JVM on
    its own core budget (default cores 0-7, local[8]).  Returns {} when the
    leg is disabled or fails - the main bench must never die on it."""
    import subprocess

    cores = os.environ.get("BBS_BENCH_PINNED_CORES", "0-7")
    if not cores:
        return {}
    try:
        proc = subprocess.run(
            ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
             "--pinned-leg", pages_path, str(n_pages), cores],
            capture_output=True, text=True, timeout=1800,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(
            f"pinned leg produced no JSON (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}\n"
        )
    except Exception as exc:  # noqa: BLE001 - diagnostic path
        sys.stderr.write(f"pinned leg skipped: {exc}\n")
    return {}


def _pinned_leg(pages_path: str, n_pages: int, cores: str) -> None:
    """Child-process body: local[n_cores] Spark over the already-materialized
    page corpus, min-of-reps extraction timing.  Affinity is inherited from
    the parent taskset, so the JVM, its Python workers, and this driver all
    stay inside the pinned set."""
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.operators.extraction import extract_main_content
    from boilerplate_buster_spark.session import get_spark

    n_cores = len(os.sched_getaffinity(0))
    spark = get_spark(
        "bbs-bench-pinned",
        master=f"local[{n_cores}]",
        shuffle_partitions=max(2 * n_cores, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    # same untimed Arrow warmup as the main bench
    pages.limit(64).mapInPandas(
        lambda it: (pdf.assign(n=pdf["text"].str.len()) for pdf in it),
        "url string, warc_ts timestamp, html binary, text string, lang string, n int",
    ).count()
    reps = max(3, REPS)
    times: list[float] = []
    lds: list[float] = []
    for _ in range(reps):
        lds.append(round(os.getloadavg()[0], 2))
        t0 = time.perf_counter()
        extract_main_content(
            spark, pages, min_docs=max(10, n_pages // 20), ngrams=3
        )[0].agg(F.sum(F.length("extracted_text"))).collect()
        times.append(round(time.perf_counter() - t0, 3))
    best = min(times)
    print(json.dumps({
        "pinned_cores": n_cores,
        "pinned_core_list": cores,
        "pinned_extract_sec": best,
        "pinned_pages_per_sec": round(n_pages / best, 1),
        "pinned_samples": times,
        "pinned_loadavg_1m": lds,
    }))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--pinned-leg":
        _pinned_leg(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
