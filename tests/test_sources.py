"""Sources/sinks coverage (SURVEY.md section 2.1 S1-S8): directory reader with
BOM sniffing + mask, CSV-as-corpus, sampling, results CSV sink, SPMF bridge."""

from __future__ import annotations

from boilerplate_buster_spark.functions.tokenizer import tokens
from boilerplate_buster_spark.operators import bloomspan
from boilerplate_buster_spark.sources.csv_corpus import read_csv_corpus
from boilerplate_buster_spark.sources.sinks import export_spmf, import_spmf, results_csv
from boilerplate_buster_spark.sources.text_dir import read_text_dir

from .conftest import REF_TESTS


def test_read_text_dir_utf8_and_utf16_equal(spark):
    """The BOM-sniffing reader must make the utf8 and utf16 corpora identical
    after tokenization (observed reference behavior, SURVEY.md section 1)."""
    out = {}
    for corpus in ("test-utf8", "test-utf16"):
        df = read_text_dir(spark, str(REF_TESTS / corpus)).select(
            "doc_id", tokens("text").alias("toks")
        )
        out[corpus] = sorted(
            tuple(r["toks"]) for r in df.collect()
        )
    assert out["test-utf8"] == out["test-utf16"]
    assert len(out["test-utf8"]) == 10


def test_read_text_dir_mask(spark):
    df = read_text_dir(spark, str(REF_TESTS / "test1"), mask="doc_01.txt")
    assert df.count() == 1
    df2 = read_text_dir(spark, str(REF_TESTS / "test1"), mask="*.txt")
    assert df2.count() == 10


def test_read_text_dir_sampling_seeded(spark):
    a = read_text_dir(spark, str(REF_TESTS / "test1"), sampling=0.5, seed=7).count()
    b = read_text_dir(spark, str(REF_TESTS / "test1"), sampling=0.5, seed=7).count()
    assert a == b  # seeded determinism (deviation from unseeded reference)


def test_csv_corpus_matches_dir_mode(spark):
    """test-supersimple.csv rows = the same docs as the directory fixture;
    mining results must agree (FIXTURES.md 3b)."""
    docs = read_csv_corpus(spark, str(REF_TESTS / "test-supersimple.csv")).select(
        "doc_id", tokens("text").alias("tokens")
    )
    got = [
        (r["phrase"], r["freq"], r["length"])
        for r in bloomspan.mine_df(spark, docs, min_docs=2, ngrams=2).collect()
    ]
    assert got == [("f a c e", 2, 4), ("f l f", 2, 3)]
    ids = [r["doc_id"] for r in docs.collect()]
    assert all(i.startswith("row_") for i in ids)


def test_results_csv_sink(spark, tmp_path):
    docs = read_csv_corpus(spark, str(REF_TESTS / "test-supersimple.csv")).select(
        "doc_id", tokens("text").alias("tokens")
    )
    out = bloomspan.mine_df(spark, docs, min_docs=2, ngrams=2)
    text = results_csv(out, str(tmp_path / "r.csv"))
    lines = text.strip().splitlines()
    assert lines[0] == "phrase,freq,length,example_files"
    assert lines[1].startswith("f a c e,2,4,")
    assert (tmp_path / "r.csv").read_text() == text


def test_spmf_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [("a", ["x", "y", "x"]), ("b", ["y"])], ["doc_id", "tokens"]
    )
    p = str(tmp_path / "c.spmf")
    export_spmf(docs, p)
    body = open(p).read().strip().splitlines()
    assert body == ["1 -1 2 -1 1 -1 -2", "2 -1 -2"]
    # fake an SPMF result file and import it back
    (tmp_path / "out.spmf").write_text("1 -1 2 -1 #SUP: 2\n")
    res = import_spmf(spark, str(tmp_path / "out.spmf"), p + ".dict").collect()
    assert [(r["phrase"], r["freq"], r["length"]) for r in res] == [("x y", 2, 2)]


def test_run_spmf_subprocess_bridge(spark, tmp_path):
    """C5 java bridge end-to-end against a mock SPMF jar compiled on the
    fly (skip when no JDK): the jar implements SPMF's CLI contract
    (`run <Algo> <in> <out> <params>`) by counting each input sequence's
    first item - exercising the real subprocess, temp-file lifecycle,
    dictionary resolution and min_l filter.  Skips (not fails) without
    javac/jar, mirroring run-spmf's availability contract."""
    import shutil
    import subprocess

    import pytest

    from boilerplate_buster_spark.sources.sinks import run_spmf

    if not (shutil.which("javac") and shutil.which("jar") and shutil.which("java")):
        pytest.skip("no JDK on PATH")

    src = tmp_path / "MockSpmf.java"
    src.write_text(
        """
import java.io.*; import java.nio.file.*; import java.util.*;
public class MockSpmf {
  public static void main(String[] a) throws Exception {
    // a = [run, Algo, input, output, params...]
    Map<String,Integer> firstCounts = new TreeMap<>();
    for (String line : Files.readAllLines(Paths.get(a[2]))) {
      String[] t = line.trim().split("\\\\s+");
      if (t.length > 0 && !t[0].isEmpty())
        firstCounts.merge(t[0], 1, Integer::sum);
    }
    try (PrintWriter w = new PrintWriter(new FileWriter(a[3]))) {
      for (Map.Entry<String,Integer> e : firstCounts.entrySet())
        w.println(e.getKey() + " -1 #SUP: " + e.getValue());
    }
  }
}
"""
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path)
    jar = tmp_path / "mock-spmf.jar"
    subprocess.run(
        ["jar", "cfe", str(jar), "MockSpmf", "MockSpmf.class"],
        check=True, cwd=tmp_path,
    )

    docs = spark.createDataFrame(
        [(0, ["beta", "x"]), (1, ["beta", "y"]), (2, ["alpha"])],
        "doc_id long, tokens array<string>",
    )
    out = {
        (r["phrase"], r["freq"], r["length"])
        for r in run_spmf(docs, "MockAlgo", str(jar), "3", min_l=1).collect()
    }
    # sorted dictionary: alpha=1, beta=2, x=3, y=4; first items: alpha x1, beta x2
    assert out == {("alpha", 1, 1), ("beta", 2, 1)}

    # jar missing -> FileNotFoundError, never a silent pass
    with pytest.raises(FileNotFoundError):
        run_spmf(docs, "MockAlgo", str(tmp_path / "absent.jar"), "3")


def test_jsonl_corpus_roundtrip_and_permissive(spark, tmp_path):
    from boilerplate_buster_spark.sources.jsonl_corpus import (
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    df = spark.createDataFrame(
        [("a", "hello world", {"src": "web"}), ("b", "x", {"src": "code"})],
        "id string, text string, meta map<string,string>",
    )
    path = str(tmp_path / "corpus")
    write_jsonl_corpus(df, path)
    back = read_jsonl_corpus(spark, path)
    got = {r.id: (r.text, dict(r.meta), r.corrupt) for r in back.collect()}
    assert got == {
        "a": ("hello world", {"src": "web"}, False),
        "b": ("x", {"src": "code"}, False),
    }
    # PERMISSIVE: a malformed line becomes one corrupt row, not a crash
    with open(f"{tmp_path}/corpus/zz_bad.txt", "w") as f:
        f.write('{"id": "c", "text": "fine"}\n{broken json\n')
    rows = read_jsonl_corpus(spark, path).collect()
    assert len(rows) == 4
    assert sum(r.corrupt for r in rows) == 1
    assert {r.id for r in rows if not r.corrupt} == {"a", "b", "c"}
