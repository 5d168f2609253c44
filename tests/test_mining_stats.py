"""M5 mining-statistics table (reference bloom_gram_miner.cpp:447-454,
710-718): seed totals, accepted/rejected + %reduction, phrase counts,
selection counters - emitted by both mining strategies and committed into
the pipeline checkpoint snapshot."""

from __future__ import annotations

from boilerplate_buster_spark.operators import bloomspan
from boilerplate_buster_spark.plans.pipeline import run_extraction_pipeline
from boilerplate_buster_spark.sources.pages import pages_df_local

STATS_KEYS = {
    "seeds_total", "seeds_accepted", "seeds_rejected", "pct_reduction",
    "candidates_after_merge", "phrases_total", "phrases_6plus",
    "selection_skipped_covered", "selection_dropped_closure",
}


def _fixture_docs(spark):
    boiler = "all rights reserved contact us for details"
    rows = []
    for i in range(12):
        noise = " ".join(f"n{i}x{j}" for j in range(6))
        rows.append((i, f"{noise} {boiler} tail{i}".split(" ")))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def _check(stats, expect_6plus: int):
    assert STATS_KEYS <= set(stats), sorted(STATS_KEYS - set(stats))
    assert stats["seeds_total"] == stats["seeds_accepted"] + stats["seeds_rejected"]
    assert stats["seeds_accepted"] >= stats["candidates_after_merge"] == stats["seeds_accepted"]
    assert 0.0 <= stats["pct_reduction"] <= 100.0
    assert stats["phrases_total"] >= 1
    assert stats["phrases_6plus"] == expect_6plus


def test_stats_driver_and_distributed_agree(spark):
    docs = _fixture_docs(spark)
    out = {}
    for strat in ("driver", "distributed"):
        stats: dict = {}
        phrases = bloomspan.mine(
            spark, docs, min_docs=10, ngrams=3, strategy=strat, stats=stats
        )
        _check(stats, expect_6plus=1)  # the 7-token boilerplate phrase
        out[strat] = (sorted(p.text for p in phrases), stats)
    assert out["driver"] == out["distributed"]


def test_pipeline_snapshot_carries_mining_stats(spark, tmp_path):
    pages = pages_df_local(spark, 30, seed=7)
    res = run_extraction_pipeline(
        spark, pages, str(tmp_path / "ckpt"), min_docs=12, ngrams=3
    )
    m = res["metrics"]["phrases"]
    assert STATS_KEYS <= set(m)
    assert m["phrases_total"] == m["n_phrases"]


def test_capped_sampling_scales_expansion_threshold(spark):
    """When max_occs_per_gram binds (seed support > cap), expansion-edge
    supports are subsample counts; the threshold must scale to the unbiased
    estimate or greedy expansion silently truncates (round-2 ADVICE item).
    Here min_docs(20) > cap(8): the raw threshold could NEVER pass on a
    <=~8-doc sample, so this test fails outright without the scaling."""
    boiler = "all rights reserved contact us for details"
    rows = []
    for i in range(40):
        noise = " ".join(f"n{i}x{j}" for j in range(4))
        rows.append((i, f"{noise} {boiler} tail{i}".split(" ")))
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    stats: dict = {}
    phrases = bloomspan.mine(
        spark, docs, min_docs=20, ngrams=3, strategy="distributed",
        max_occs_per_gram=8, stats=stats,
    )
    assert stats["occ_cap_sampled_grams"] >= 1
    texts = {p.text for p in phrases}
    assert boiler in texts, texts  # expansion reached the full 7-token phrase
    full = next(p for p in phrases if p.text == boiler)
    # reported support is the rescaled unbiased estimate, bounded by exact df
    assert 20 <= full.support <= 40
