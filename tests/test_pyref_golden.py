"""Golden tests: pure-Python reference-exact core vs the observed outputs of
the reference binary on its own fixture corpora (FIXTURES.md section 3,
observed by building/running /root/reference this round).

These pin the SEMANTICS; the Spark operators are then tested for equality
against this core (tests/test_bloomspan_spark.py etc.).
"""

from __future__ import annotations

import pathlib

import pytest

from boilerplate_buster_spark.core import pyref
from boilerplate_buster_spark.core.tokenize import decode_page_bytes, tokenize

REF_TESTS = pathlib.Path("/root/reference/tests")


def load_dir_corpus(path: pathlib.Path) -> tuple[list[list[str]], list[str]]:
    """Directory corpus: one doc per file, sorted by filename for determinism
    (reference shuffles unseeded - corpus_miner.cpp:400-402; our canonical
    order is sorted paths)."""
    docs, names = [], []
    for f in sorted(path.iterdir()):
        docs.append(tokenize(decode_page_bytes(f.read_bytes())))
        names.append(f.name)
    return docs, names


def rows_no_examples(rows):
    return [(r[0], r[1], r[2]) for r in rows]


# ---------------------------------------------------------------- tokenizer

def test_tokenizer_edge_cases():
    # test1/doc_08.txt punishment cases
    assert tokenize("test-user@example.com") == ["test", "user", "example", "com"]
    assert tokenize("+1(234)567-89-00") == ["1", "234", "567", "89", "00"]
    assert tokenize("123-456 and UPPERCASE") == ["123", "456", "and", "uppercase"]
    # ASCII-only lowering: Cyrillic capitals preserved (tokenizer.h:56)
    assert tokenize("Внимание данный") == ["Внимание", "данный"]
    assert tokenize("e-mail") == ["e", "mail"]
    assert tokenize("") == []
    assert tokenize("  ... !!!") == []


def test_utf16_decode_matches_utf8():
    utf8_docs, _ = load_dir_corpus(REF_TESTS / "test-utf8")
    utf16_docs, _ = load_dir_corpus(REF_TESTS / "test-utf16")
    assert utf8_docs == utf16_docs


# ---------------------------------------------------------------- bloomspan

TEST1_GOLDEN = [
    (
        "this document is intended only for the use of the individual or entity "
        "to which it is addressed please notify the sender immediately by e mail "
        "if you have received this communication in error",
        3,
        34,
    ),
    (
        "please notify the sender immediately by e mail if you have received "
        "this communication in error",
        4,
        16,
    ),
    ("standard operating procedure", 3, 3),
]


def test_bloomspan_test1():
    docs, names = load_dir_corpus(REF_TESTS / "test1")
    phrases = pyref.bloomspan_mine(docs, min_docs=3, ngrams=3)
    rows = pyref.canonical_rows(phrases, names)
    assert rows_no_examples(rows) == TEST1_GOLDEN


def test_bloomspan_supersimple_dir():
    docs, names = load_dir_corpus(REF_TESTS / "test-supersimple")
    phrases = pyref.bloomspan_mine(docs, min_docs=2, ngrams=2)
    rows = rows_no_examples(pyref.canonical_rows(phrases, names))
    assert rows == [("f a c e", 2, 4), ("f l f", 2, 3)]


def test_bloomspan_supersimple_csv():
    # CSV-as-corpus: each row's fields joined with spaces into one document
    # (corpus_miner.cpp:281-284); doc names row_<i> (":337").
    lines = (REF_TESTS / "test-supersimple.csv").read_text().strip().splitlines()
    docs = [tokenize(line.replace(",", " ")) for line in lines]
    phrases = pyref.bloomspan_mine(docs, min_docs=2, ngrams=2)
    rows = rows_no_examples(pyref.canonical_rows(phrases))
    assert rows == [("f a c e", 2, 4), ("f l f", 2, 3)]


def test_bloomspan_utf8_equals_utf16():
    out = {}
    for name in ("test-utf8", "test-utf16"):
        docs, _ = load_dir_corpus(REF_TESTS / name)
        phrases = pyref.bloomspan_mine(docs, min_docs=3, ngrams=3)
        out[name] = rows_no_examples(pyref.canonical_rows(phrases))
    assert out["test-utf8"] == out["test-utf16"]
    texts = [r[0] for r in out["test-utf8"]]
    assert "Внимание данный файл содержит конфиденциальную информацию" in texts


def test_intra_doc_repetition_counts_once():
    # doc_04 contains the boilerplate twice; unique-doc support counts it once.
    docs, _ = load_dir_corpus(REF_TESTS / "test1")
    phrases = pyref.bloomspan_mine(docs, min_docs=3, ngrams=3)
    long_row = max(phrases, key=lambda p: len(p.tokens))
    assert long_row.support == 3  # docs 01, 02, 09 (04 diverges, counted once anyway)


# ------------------------------------------------------------- bide/clospan

def test_bide_clospan_test1():
    docs, names = load_dir_corpus(REF_TESTS / "test1")
    for miner in (pyref.bide_mine, pyref.clospan_mine):
        phrases = miner(docs, min_docs=3, min_l=3)
        rows = rows_no_examples(pyref.canonical_rows(phrases, names))
        # Occurrence-count support: doc_04's duplicated sentence counts twice.
        assert (
            "this document is intended only for the use of",
            7,
            9,
        ) in rows
        assert (
            "this document is intended only for the use of the individual or "
            "entity to which it is addressed",
            6,
            18,
        ) in rows
        for golden in TEST1_GOLDEN:
            assert golden in rows, golden
        assert len(rows) == 5


def test_bide_equals_clospan_on_fixtures():
    for corpus in ("test1", "test-supersimple", "test-utf8"):
        docs, _ = load_dir_corpus(REF_TESTS / corpus)
        b = rows_no_examples(pyref.canonical_rows(pyref.bide_mine(docs, 3, 3)))
        c = rows_no_examples(pyref.canonical_rows(pyref.clospan_mine(docs, 3, 3)))
        assert b == c
