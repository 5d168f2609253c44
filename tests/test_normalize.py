"""Whitespace normalization + HTML entity decoding, including the
Spark/DuckDB dialect parity of the generated whitespace class."""

from boilerplate_buster_spark.operators.text_stats import (
    decode_entities,
    normalize_whitespace,
    normalize_ws_expr,
)

CASES = [
    (0, "a b　 c\t\nd  e "),
    (1, " lead and trail "),
    (2, "zero​width﻿join"),
    (3, "already clean"),
    (4, ""),
]
WANT = {
    0: "a b c d e",
    1: "lead and trail",
    2: "zero width join",  # zero-width folds to space (documented)
    3: "already clean",
    4: "",
}


def test_normalize_whitespace(spark):
    docs = spark.createDataFrame(CASES, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_chars"])
        for r in normalize_whitespace(docs).collect()
    }
    for i, raw in CASES:
        assert got[i][0] == WANT[i], i
        assert got[i][1] == len(raw) - len(WANT[i]), i


def test_normalize_ws_dialect_parity():
    import duckdb

    con = duckdb.connect()
    expr = normalize_ws_expr("t", "duckdb")
    for _, raw in CASES:
        want = con.sql(
            f"SELECT {expr} FROM (SELECT ? AS t)", params=[raw]
        ).fetchone()[0]
        assert want == WANT[dict((r, i) for i, r in CASES)[raw]]


def test_decode_entities_real_table(spark):
    rows = [
        (0, "x &amp; y &#233; &eacute; &#x41;"),
        (1, "no entities here & none"),
        (2, "&Uuml;ber &ndash; caf&eacute;"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["decoded_text"], r["n_entities"])
        for r in decode_entities(docs).collect()
    }
    assert got[0] == ("x & y é é A", 4)
    assert got[1] == ("no entities here & none", 0)
    assert got[2] == ("Über – café", 3)
