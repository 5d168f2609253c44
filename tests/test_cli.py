"""Drop-in CLI parity: same flags as the reference binary, same
(phrase,freq,length) rows on the fixture corpora."""

from __future__ import annotations

import csv
import subprocess
import sys


def run_cli(tmp_path, *args):
    out = tmp_path / "results_max.csv"
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/corpus_miner_cli.py", *args,
         "--output", str(out)],
        capture_output=True, text=True, timeout=600, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, newline="") as f:
        return {(rec["phrase"], int(rec["freq"]), int(rec["length"]))
                for rec in csv.DictReader(f)}


def test_cli_bloomspan_test1(tmp_path):
    rows = run_cli(tmp_path, "/root/reference/tests/test1",
                   "--algo", "bloomspan", "--n", "3", "--ngrams", "3")
    assert ("standard operating procedure", 3, 3) in rows
    assert len(rows) == 3


def test_cli_bide_test1(tmp_path):
    rows = run_cli(tmp_path, "/root/reference/tests/test1",
                   "--algo", "bide", "--n", "3", "--ngrams", "3")
    assert ("this document is intended only for the use of", 7, 9) in rows
    assert len(rows) == 5


def test_cli_csv_mode(tmp_path):
    rows = run_cli(tmp_path, "/root/reference/tests/test-supersimple.csv",
                   "--n", "2", "--ngrams", "2")
    assert rows == {("f a c e", 2, 4), ("f l f", 2, 3)}
