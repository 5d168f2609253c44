"""Minimal-PDF text layer: encoder/parser kernel + Spark stage.

Pins: literal-string escapes, octal, Tj vs TJ vs ', line moves, the
filtered-stream None boundary, wrap_words round-trip (property-based),
and the mapInPandas stage end-to-end on the synthetic corpus."""

import string

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from boilerplate_buster_spark.core.pdfparse import (
    make_pdf,
    parse_pdf_text,
    wrap_words,
)
from boilerplate_buster_spark.operators.pdf import (
    extract_pdf_text,
    synthesize_pdfs,
)


def test_roundtrip_basic():
    t = "alpha beta gamma delta " * 20
    t = t.strip()
    out = parse_pdf_text(make_pdf(t))
    assert out == "\n".join(wrap_words(t, 60))
    assert " ".join(out.split("\n")) == t
    # even lines are TJ arrays, odd lines Tj — both operators exercised
    assert b"] TJ" in make_pdf(t) and b") Tj" in make_pdf(t)


def test_escapes_and_specials():
    for t in [
        "parens (both) kinds ) (",
        r"back\slash and \( fake escape",
        "unicode stays latin-1-safe: caf\xe9",
        "",
        "oneword",
        "x" * 200,  # single word longer than width
    ]:
        got = parse_pdf_text(make_pdf(t))
        assert " ".join(got.split("\n")) == t, (t, got)


def test_hand_assembled_operators():
    # a content stream exercising ', octal, and line-continuation escapes
    content = (
        b"BT /F1 10 Tf (first ) Tj (line) Tj T* (second) Tj "
        b"(\\164hird) '  [(a) -120 (b)] TJ ET"
    )
    pdf = b"%PDF-1.4\n1 0 obj\n" + (
        b"<< /Length %d >>\nstream\n%s\nendstream\n" % (len(content), content)
    ) + b"endobj\ntrailer\n<< /Size 2 >>\n%%EOF\n"
    assert parse_pdf_text(pdf) == "first line\nsecond\nthirdab"


def test_none_boundaries():
    assert parse_pdf_text(None) is None
    assert parse_pdf_text(b"not a pdf") is None
    # a declared /Filter stream must NOT be faked
    filt = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 20 >>\n"
        b"stream\nBT (hidden) Tj ET\nendstream\nendobj\n"
    )
    assert parse_pdf_text(filt) is None


WORDS = st.lists(
    st.text(alphabet=string.ascii_lowercase + "()\\", min_size=1, max_size=12),
    min_size=1,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(WORDS, st.integers(min_value=5, max_value=80))
def test_wrap_roundtrip_property(words, width):
    t = " ".join(words)
    lines = wrap_words(t, width)
    assert " ".join(lines) == t
    # no line exceeds width unless it is a single long word
    for ln in lines:
        assert len(ln) <= width or " " not in ln
    assert " ".join(parse_pdf_text(make_pdf(t, width)).split("\n")) == t


def test_spark_stage_roundtrip(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(30)
        .select(F.concat(F.lit("pdf://"), "doc_id").alias("url"), "text")
    )
    pdfs = synthesize_pdfs(docs)
    out = extract_pdf_text(pdfs).select(
        "url",
        F.array_join(F.split("pdf_text", "\n"), " ").alias("joined"),
    )
    both = out.join(docs, "url").collect()
    assert len(both) == 30
    for r in both:
        assert r.joined == r.text
    # plan: parse stage is a pure map — no Exchange below the Arrow batch
    # (built without .limit(), whose GlobalLimit adds its own Exchange)
    nolimit = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.concat(F.lit("pdf://"), "doc_id").alias("url"), "text"
    )
    plan = (
        extract_pdf_text(synthesize_pdfs(nolimit))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet=string.printable, max_size=300))
def test_pdf_any_printable_roundtrip(t):
    # newlines in input become paragraph boundaries (lossy only up to the
    # space-join); every other byte — including raw \r — round-trips exactly
    got = parse_pdf_text(make_pdf(t))
    assert " ".join(got.split("\n")) == " ".join(t.split("\n")), (t, got)


def test_flatedecode_roundtrip_and_exact_length_framing():
    import zlib

    t = "alpha beta gamma " * 40
    t = t.strip()
    assert parse_pdf_text(make_pdf(t, compress=True)) == "\n".join(wrap_words(t))
    # stored-block (level 0) zlib embeds the payload VERBATIM, so a text
    # containing "endstream" lands the marker inside the compressed body —
    # only exact /Length framing parses this correctly
    content = b"BT (hidden endstream trick) Tj ET"
    raw = zlib.compress(content, 0)
    assert b"endstream" in raw
    pdf = (
        b"%PDF-1.4\n1 0 obj\n"
        + (b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(raw))
        + raw
        + b"\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n%%EOF\n"
    )
    assert parse_pdf_text(pdf) == "hidden endstream trick"


def test_unknown_filter_skipped():
    dct = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode /Length 5 >>\n"
        b"stream\nABCDE\nendstream\nendobj\n"
    )
    assert parse_pdf_text(dct) is None


def test_lzw_filter_roundtrip():
    from boilerplate_buster_spark.core.pdfparse import _lzw_decode, _lzw_encode

    content = b"BT (lzw text layer) Tj T* (second line here) Tj ET"
    assert _lzw_decode(_lzw_encode(content)) == content
    body = _lzw_encode(content)
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Filter /LZWDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body), body)
    )
    assert parse_pdf_text(pdf) == "lzw text layer\nsecond line here"
    # malformed LZW body skips cleanly
    bad = pdf.replace(body, b"\xff" * len(body))
    assert parse_pdf_text(bad) is None


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + " ()\\", max_size=200),
       st.booleans())
def test_pdf_roundtrip_property_compressed(t, comp):
    got = parse_pdf_text(make_pdf(t, compress=comp))
    assert " ".join(got.split("\n")) == t


def test_operator_names_inside_strings_do_not_terminate():
    # "ET"/"Td"/"TJ" inside shown TEXT must not end the text block or move
    # lines — regression for the BT(.*?)ET regex bug the fuzzer caught
    t = "we MET at Td junction NEXT TJ BT ET end"
    assert parse_pdf_text(make_pdf(t, width=200)) == t


def test_literal_string_balanced_parens():
    """ISO 32000-1 7.3.4.2: balanced unescaped parens inside a literal
    string are literal characters - '(a (b) c) Tj' shows 'a (b) c'
    (ADVICE round-3: the old pattern ended the string at the first ')')."""
    from boilerplate_buster_spark.core.pdfparse import parse_pdf_text

    body = b"BT (a (b) c) Tj ET"
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body), body)
    )
    assert parse_pdf_text(pdf) == "a (b) c"
    # two levels + escapes mixed
    body2 = rb"BT (x (y (z)) \(esc\)) Tj ET"
    pdf2 = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body2), body2)
    )
    assert parse_pdf_text(pdf2) == "x (y (z)) (esc)"


def test_asciihex_ascii85_and_filter_chain():
    import base64
    import zlib

    content = b"BT (hex and 85) Tj ET"
    hx = content.hex().encode() + b">"
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Filter /ASCIIHexDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(hx), hx)
    )
    assert parse_pdf_text(pdf) == "hex and 85"
    a85 = base64.a85encode(content) + b"~>"
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Filter /ASCII85Decode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(a85), a85)
    )
    assert parse_pdf_text(pdf) == "hex and 85"
    # chain: A85 applied first, then Flate (the common belt-and-braces form)
    chained = base64.a85encode(zlib.compress(content)) + b"~>"
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Filter [/ASCII85Decode /FlateDecode] /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(chained), chained)
    )
    assert parse_pdf_text(pdf) == "hex and 85"
    # odd hex digit count pads with 0 per 7.4.2; garbage a85 skips cleanly
    bad = b"zzzz not a85 \xff\xff~>"
    pdf = (
        b"%%PDF-1.4\n1 0 obj\n<< /Filter /ASCII85Decode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(bad), bad)
    )
    assert parse_pdf_text(pdf) is None


def test_decodeparms_predictor_and_earlychange_skipped():
    import zlib

    # Predictor > 1 delta-codes bytes before compression: decompressing
    # without applying the predictor yields garble, so the stream is SKIPPED
    content = b"BT (would be garbled) Tj ET"
    raw = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n"
        + (b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 "
           b"/Columns 4 >> /Length %d >>\nstream\n" % len(raw))
        + raw
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )
    assert parse_pdf_text(pdf) is None
    # EarlyChange 0 shifts LZW code-width boundaries -> also skipped
    from boilerplate_buster_spark.core.pdfparse import _lzw_encode

    body = _lzw_encode(b"BT (lzw) Tj ET")
    pdf2 = (
        b"%PDF-1.4\n1 0 obj\n"
        + (b"<< /Filter /LZWDecode /DP << /EarlyChange 0 >> /Length %d >>"
           b"\nstream\n" % len(body))
        + body
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )
    assert parse_pdf_text(pdf2) is None
    # Predictor 1 (none) + EarlyChange 1 are the defaults we DO honor
    pdf3 = (
        b"%PDF-1.4\n1 0 obj\n"
        + (b"<< /Filter /FlateDecode /DecodeParms << /Predictor 1 >> "
           b"/Length %d >>\nstream\n" % len(raw))
        + raw
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )
    assert parse_pdf_text(pdf3) == "would be garbled"


def test_hex_show_strings():
    # round-6: <hex> Tj / <hex> ' (PDF 7.3.4.3) - whitespace between
    # digits, odd trailing digit zero-padded, << dict delimiters never
    # confused with hex strings
    from boilerplate_buster_spark.core import pdfparse as P

    body = (
        b"%PDF-1.4\n1 0 obj << /X <</Nested true>> >>\n"
        b"stream\nBT <4869 2c20> Tj <74 68 65 72 65> Tj T* "
        b"<776F726C6> Tj ET\nendstream\nendobj"
    )
    assert P.parse_pdf_text(body) == "Hi, there\nworl`"
    # make_pdf round-trips with hex lines in the mix (every third line)
    text = " ".join(f"word{i}" for i in range(30))
    for compress in (False, True):
        pdf = P.make_pdf(text, width=18, compress=compress)
        if not compress:  # compressed bodies hide the op bytes, of course
            assert b"> Tj" in pdf  # a hex show op is actually present
        assert P.parse_pdf_text(pdf) == "\n".join(P.wrap_words(text, 18))


def test_decodeparms_predictors_honored():
    # round-6: TIFF (2) and PNG (10-15) predictors at BPC 8 are reversed
    # after inflation; other bit depths still skip (never garble)
    import zlib

    from boilerplate_buster_spark.core import pdfparse as P

    content = b"BT (Hello predictor world) Tj ET"
    cols = 16
    rows = [
        content[i : i + cols].ljust(cols, b" ")
        for i in range(0, len(content), cols)
    ]
    png = bytearray()
    prev = bytes(cols)
    for r in rows:  # PNG Up-filter each row
        png.append(2)
        png += bytes((r[i] - prev[i]) & 0xFF for i in range(cols))
        prev = r
    flate = zlib.compress(bytes(png))
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns 16 >> /Length "
        + str(len(flate)).encode() + b" >>\nstream\n" + flate
        + b"\nendstream\nendobj"
    )
    assert P.parse_pdf_text(pdf) == "Hello predictor world"

    tiff = bytearray()
    for r in rows:  # TIFF horizontal differencing
        rr = bytearray(r)
        for i in range(len(rr) - 1, 0, -1):
            rr[i] = (rr[i] - rr[i - 1]) & 0xFF
        tiff += rr
    flate2 = zlib.compress(bytes(tiff))
    pdf2 = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /DP "
        b"<< /Predictor 2 /Columns 16 >> /Length "
        + str(len(flate2)).encode() + b" >>\nstream\n" + flate2
        + b"\nendstream\nendobj"
    )
    assert P.parse_pdf_text(pdf2) == "Hello predictor world"

    # 16-bit components remain outside the subset -> stream skipped
    pdf3 = pdf.replace(
        b"/Predictor 12 /Columns 16",
        b"/Predictor 12 /Columns 16 /BitsPerComponent 16",
    )
    assert P.parse_pdf_text(pdf3) is None


def test_tiff_predictor_partial_row_skips():
    # review fix: a TIFF-predicted stream whose body is not a whole number
    # of rows must SKIP (the partial row would pass through as raw deltas)
    import zlib

    from boilerplate_buster_spark.core import pdfparse as P

    body = zlib.compress(b"BT (x) Tj ET" + b"\x01" * 5)  # 17 B, rows of 16
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /DP "
        b"<< /Predictor 2 /Columns 16 >> /Length "
        + str(len(body)).encode() + b" >>\nstream\n" + body
        + b"\nendstream\nendobj"
    )
    assert P.parse_pdf_text(pdf) is None
