"""Stage-count invariants of the composed FineWeb-style contract query
(`llm_corpus_pipeline` in __spark_entry__.py): WARC ingest -> DOM strip ->
CCNet line dedup -> decontamination -> langID/quality/LM -> MinHash-LSH
clustering -> survivor selection.  Value-level parity with the DuckDB
WITH-chain is the driver gate's job; these tests pin the structural
guarantees each stage must deliver regardless of corpus content."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    df = entry.queries()["llm_corpus_pipeline"](spark, SF).toPandas()
    return df.set_index("url", drop=False)


def test_one_row_per_url(result):
    # 200 originals + 50 mirror copies, no drops or dups anywhere in the chain
    assert len(result) == 250
    assert result["url"].is_unique
    assert sum(result["url"].str.startswith("https://mirror.")) == 50


def test_mirrors_are_clustered_duplicates(result):
    # every mirror page is an exact near-dup of its original: same cluster
    # (possibly merged wider by natural near-dups), cluster head is an
    # ex.com url (every mirror has a lexicographically smaller twin), and
    # the mirror is always dropped as a duplicate
    for i in range(50):
        orig = result.loc[f"https://ex.com/{i}"]
        mirror = result.loc[f"https://mirror.ex.com/{i}"]
        assert mirror["cluster_id"] == orig["cluster_id"]
        assert mirror["cluster_id"].startswith("https://ex.com/")
        assert not bool(mirror["is_survivor"])
        assert mirror["drop_reason"] == "duplicate" and not bool(mirror["keep"])
    # exactly one survivor per cluster
    heads = result[result["is_survivor"]]
    assert (heads["cluster_id"] == heads["url"]).all()
    assert result["cluster_id"].nunique() == len(heads)


def test_line_dedup_removed_exactly_the_injected_banners(result):
    # injected df: cookie 250, accept 125, repeat-me 84 - all >= min_df 80,
    # so removals per doc = 1 + (id%2==0) + 2*(id%3==0); natural chunks
    # (df <= 2 even with mirrors) must survive
    for url, row in result.iterrows():
        i = int(url.rsplit("/", 1)[1])
        expect = 1 + (i % 2 == 0) + 2 * (i % 3 == 0)
        assert row["n_lines_removed"] == expect, url


def test_benchmark_docs_flag_contaminated(result):
    # docs 0-9 (and their mirrors) contain their own benchmark 3-gram
    for i in range(10):
        assert result.loc[f"https://ex.com/{i}", "n_contaminated"] >= 1
        assert result.loc[f"https://mirror.ex.com/{i}", "n_contaminated"] >= 1
    # the keep flag composes all gates: kept rows are survivors, clean,
    # English, above the quality bar
    kept = result[result["keep"]]
    assert len(kept) > 0
    assert kept["is_survivor"].all()
    assert (kept["n_contaminated"] == 0).all()
    assert (kept["lang_pred"] == "en").all()
    assert (kept["quality_e6"] >= 320000).all()
    assert (kept["drop_reason"] == "").all()


def test_drop_reason_priority(result):
    # duplicate > contaminated > language > low_quality; non-kept rows
    # always carry a reason
    dropped = result[~result["keep"]]
    assert (dropped["drop_reason"] != "").all()
    dup = result[~result["is_survivor"]]
    assert (dup["drop_reason"] == "duplicate").all()
    cont = result[result["is_survivor"] & (result["n_contaminated"] > 0)]
    assert (cont["drop_reason"] == "contaminated").all()


def test_curation_pipeline_invariants(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["curation_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 300
    by_reason: dict = {}
    for r in rows:
        by_reason.setdefault(r["reason"], 0)
        by_reason[r["reason"]] += 1
        # spam farms are exactly the doc_id % 20 in (3, 7) hosts
        is_spam_farm = r["doc_id"] % 20 in (3, 7)
        assert r["spam_host"] == is_spam_farm, r
        assert r["label"] in (0, 1, 2)
        # reason precedence: spam_host > classifier > readability > keep
        if r["spam_host"]:
            assert r["reason"] == "spam_host" and not r["keep"]
        elif r["label"] == 2:
            assert r["reason"] == "classifier" and not r["keep"]
        elif r["fre_e3"] <= 0:
            assert r["reason"] == "readability" and not r["keep"]
        else:
            assert r["reason"] == "keep" and r["keep"]
    assert by_reason.get("spam_host") == 30  # 2 of 20 residues x 300/20
    assert by_reason.get("keep", 0) > 0  # policy keeps something
