"""Mojibake repair - fixing UTF-8 text that was mis-decoded as
Windows-1252 somewhere upstream ('caffÃ©' -> 'caffé'), the ftfy/CCNet
cleanup stage every web corpus needs (a large fraction of Common-Crawl
pages declare the wrong charset).

Two implementations, both pure maps:

  * :func:`fix_double_utf8` - the REAL general repair: re-encode the
    text as Windows-1252 bytes and decode them as UTF-8, exactly
    reversing the bad decode.  Applied only to rows that (a) show a
    mojibake indicator (a 'Ã'/'â€' lead byte pattern) and (b) contain
    only chars Windows-1252 can encode - other rows pass through
    untouched, so genuinely multilingual text is never mangled.
  * :func:`fix_mojibake` - the table-driven subset (the most common
    two/three-byte sequences), as one generated replace chain rendered
    per dialect.  This is the SQL-oracle twin: DuckDB has no charset
    codecs, so the contract query runs the REAL codec repair on Spark
    and the table chain in DuckDB - equality on the injected domain
    proves the codec round-trip.

No reference anchor (the reference reads clean files); mirrors
ftfy/CCNet practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (mojibake, repaired): UTF-8 bytes of the repaired char, mis-decoded as
#: Windows-1252.  Longer (3-byte) sequences first so the chain never
#: rewrites a prefix of a longer pattern.
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    ("â€™", "’"),   # â€™ -> ’
    ("â€œ", "“"),   # â€œ -> “
    ("â€“", "–"),   # â€“ -> –
    ("Ã©", "é"),         # Ã© -> é
    ("Ã¨", "è"),         # Ã¨ -> è
    ("Ã¡", "á"),         # Ã¡ -> á
    ("Ã³", "ó"),         # Ã³ -> ó
    ("Ãº", "ú"),         # Ãº -> ú
    ("Ã±", "ñ"),         # Ã± -> ñ
    ("Ã¼", "ü"),         # Ã¼ -> ü
    ("Ã¶", "ö"),         # Ã¶ -> ö
    ("Ã¤", "ä"),         # Ã¤ -> ä
    ("ÃŸ", "ß"),         # ÃŸ -> ß
]


def fix_expr(col: str, dialect: str = "spark") -> str:
    """The table-driven repair as one nested replace chain; identical
    semantics in Spark SQL and DuckDB (plain replace, no regex)."""
    e = col
    for moji, good in MOJIBAKE_TABLE:
        m = moji.replace("'", "''")
        g = good.replace("'", "''")
        e = f"replace({e}, '{m}', '{g}')"
    return e


def fix_mojibake(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fixed_text, n_changed_chars): table-driven repair.  Every
    table entry shrinks the text by >= 1 char per hit, so
    n_changed_chars = length(text) - length(fixed) > 0 iff something
    was repaired.  Pure map."""
    # two-step select so the (non-trivial) chain is computed once and the
    # char delta reads the alias (Catalyst does not CSE repeated aliases)
    step = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_n0"),
        F.expr(fix_expr(text_col)).alias("fixed_text"),
    )
    return step.select(
        id_col,
        "fixed_text",
        (F.col("_n0") - F.length("fixed_text")).cast("long").alias(
            "n_changed_chars"
        ),
    )


def fix_double_utf8(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fixed_text, was_fixed): the REAL repair - encode the text
    back to Windows-1252 bytes and decode them as UTF-8, reversing a bad
    cp1252 decode exactly (any mojibake sequence, not just the table).

    Gated twice so it can never corrupt clean text: only rows whose text
    (a) matches a mojibake indicator ('Ã' followed by a Latin-1 byte
    char, or the 'â€' punctuation lead-in) and (b) contains no char
    outside U+0001-U+2122's cp1252-encodable set are rewritten (the
    cp1252-unencodable check is a negated character-class regex).  Rows
    failing either gate pass through unchanged."""
    # cp1252 encodes: U+0000-U+00FF minus the 0x80-0x9F block, plus the 27
    # remapped chars; this class lists what we ACCEPT (conservative)
    encodable = (
        "^[\\u0000-\\u007f\\u00a0-\\u00ff"
        "\\u20ac\\u201a\\u0192\\u201e\\u2026\\u2020\\u2021\\u02c6\\u2030"
        "\\u0160\\u2039\\u0152\\u017d\\u2018\\u2019\\u201c\\u201d\\u2022"
        "\\u2013\\u2014\\u02dc\\u2122\\u0161\\u203a\\u0153\\u017e\\u0178]*$"
    )
    indicator = "(\\u00c3[\\u0080-\\u00ff])|(\\u00e2\\u20ac)"
    fixable = (
        F.col(text_col).rlike(indicator)
        & F.col(text_col).rlike(encodable)
    )
    # Spark 4 whitelists encode() charsets (no windows-1252): emulate the
    # cp1252 encoder exactly by translating the 27 remapped chars down to
    # their 0x80-0x9F code points first, then encoding ISO-8859-1 (which
    # maps U+0000-U+00FF to bytes 1:1)
    src = (
        "€‚ƒ„…†‡ˆ‰Š"
        "‹ŒŽ‘’“”•–—"
        "˜™š›œžŸ"
    )
    dst = (
        "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
        "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
        "\x98\x99\x9a\x9b\x9c\x9e\x9f"
    )
    # two-step select: compute the candidate byte string once; decode only
    # when those bytes ARE valid UTF-8 (Spark 4's decode raises
    # MALFORMED_CHARACTER_CODING otherwise - e.g. a lone 'Ã' lead byte)
    step = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.when(
            fixable,
            F.encode(F.translate(F.col(text_col), src, dst), "ISO-8859-1"),
        ).alias("_b"),
    )
    ok = F.col("_b").isNotNull() & F.expr("is_valid_utf8(_b)")
    return step.select(
        id_col,
        F.when(ok, F.decode(F.col("_b"), "UTF-8"))
        .otherwise(F.col(text_col))
        .alias("fixed_text"),
        ok.alias("was_fixed"),
    )


def nfc_normalize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization (canonical composition - 'e' + COMBINING
    ACUTE -> U+00E9 etc.), the other half of web-text cleanup after
    mojibake repair: the same visible string must hash/shingle/dedup
    identically whether the page shipped it composed or decomposed.

    Arrow-batched pandas_udf (pandas Series.str.normalize - vectorized
    unicodedata), pure map, no shuffle; DuckDB's nfc_normalize() is the
    bit-exact oracle twin.  Returns (id, nfc_text, changed, n_cp_in,
    n_cp_out) - both engines count length() in codepoints."""
    import pandas as pd

    def _nfc_fn(s):
        return s.str.normalize("NFC")

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf cannot
    # resolve on pyspark 4
    _nfc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = F.pandas_udf(_nfc_fn, "string")

    out = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        _nfc(F.col(text_col)).alias("nfc_text"),
    )
    return out.select(
        id_col,
        "nfc_text",
        (F.col("_raw") != F.col("nfc_text")).alias("changed"),
        F.length("_raw").cast("long").alias("n_cp_in"),
        F.length("nfc_text").cast("long").alias("n_cp_out"),
    )
