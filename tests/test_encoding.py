"""Mojibake repair: table chain vs the real cp1252/UTF-8 codec round
trip, pass-through safety for clean and multilingual text."""

from boilerplate_buster_spark.operators.encoding import (
    MOJIBAKE_TABLE,
    fix_double_utf8,
    fix_expr,
    fix_mojibake,
)


def _moji(s: str) -> str:
    """Make mojibake the way the web does: UTF-8 bytes mis-decoded as
    cp1252."""
    return s.encode("utf-8").decode("windows-1252")


def test_table_is_real_mojibake():
    # every table entry must BE the cp1252 mis-decode of its repaired char
    for moji, good in MOJIBAKE_TABLE:
        assert _moji(good) == moji, (moji, good)


def test_fix_mojibake_chain(spark):
    rows = [
        (0, "caff" + _moji("é") + " m" + _moji("ü") + "nchen"),
        (1, "don" + _moji("’") + "t stop"),
        (2, "already clean"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["fixed_text"], r["n_changed_chars"])
        for r in fix_mojibake(docs).collect()
    }
    assert got[0] == ("caffé münchen", 2)
    assert got[1] == ("don’t stop", 2)
    assert got[2] == ("already clean", 0)


def test_fix_double_utf8_general_repair(spark):
    # the codec path must fix sequences the table doesn't list
    weird = _moji("œuvre — déjà vu")  # includes U+2014 and NBSP
    rows = [
        (0, "x " + weird),
        (1, "clean ascii"),
        (2, "中文 stays untouched Ã©ven with an indicator"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["fixed_text"], r["was_fixed"])
        for r in fix_double_utf8(docs).collect()
    }
    assert got[0] == ("x œuvre — déjà vu", True)
    assert got[1] == ("clean ascii", False)  # no indicator -> untouched
    # CJK chars fail the cp1252-encodable gate -> untouched even though
    # the indicator pattern is present
    assert got[2][1] is False
    assert got[2][0] == rows[2][1]


def test_codec_and_table_agree_on_table_domain(spark):
    from pyspark.sql import functions as F

    text = " ".join("w" + m for m, _ in MOJIBAKE_TABLE)
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    codec = fix_double_utf8(docs).collect()[0]["fixed_text"]
    table = fix_mojibake(docs).collect()[0]["fixed_text"]
    assert codec == table
    # and DuckDB renders the same chain
    import duckdb

    con = duckdb.connect()
    want = con.sql(
        "SELECT " + fix_expr("t", "duckdb") + " FROM (SELECT ? AS t)",
        params=[text],
    ).fetchone()[0]
    assert want == table


def test_codec_survives_lone_lead_byte(spark):
    # a lone 'Ã' (valid indicator, but its cp1252 bytes are malformed
    # UTF-8) must not crash the job; any outcome that keeps the row is
    # acceptable, and clean rows stay byte-identical
    docs = spark.createDataFrame(
        [(0, "trailing lone Ã©x Ã"), (1, "plain")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["fixed_text"] for r in fix_double_utf8(docs).collect()}
    assert got[1] == "plain"
    assert isinstance(got[0], str)


def test_nfc_normalize(spark):
    # round-6: canonical composition - decomposed sequences compose, the
    # changed flag and codepoint counts register the delta, composed or
    # ASCII text passes through byte-identical
    from boilerplate_buster_spark.operators.encoding import nfc_normalize

    rows = [
        (0, "plain ascii"),
        (1, "café"),          # e + combining acute -> é
        (2, "café"),           # already composed
        (3, "Å ring"),        # A + combining ring -> Å
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in nfc_normalize(df).collect()}
    assert got[0]["nfc_text"] == "plain ascii" and not got[0]["changed"]
    assert got[1]["nfc_text"] == "café" and got[1]["changed"]
    assert got[1]["n_cp_in"] == 5 and got[1]["n_cp_out"] == 4
    assert got[2]["nfc_text"] == "café" and not got[2]["changed"]
    assert got[3]["nfc_text"] == "Å ring" and got[3]["changed"]
    assert got[4]["nfc_text"] == "" and not got[4]["changed"]
