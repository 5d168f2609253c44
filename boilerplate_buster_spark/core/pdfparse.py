"""Minimal real PDF text layer: encoder + parser, stdlib-only.

The north rule names "PDF/layout parse" as part of the extraction surface.
No PDF library ships in this container, so this module implements the
honest subset that needs none: uncompressed content streams,
/FlateDecode (zlib) — the compression real-world PDFs actually use —
plus /ASCIIHexDecode, /ASCII85Decode, /LZWDecode (the TIFF/PDF MSB
flavor with EarlyChange, distinct from GIF's LSB variant) and in-order
filter CHAINS of these (e.g. [/ASCII85Decode /FlateDecode]), with the
standard text-showing operators.  That is a REAL decode
path: the parser walks actual PDF object/stream structure byte-by-byte,
frames stream bodies by their exact /Length when the dict declares a
direct one (regex framing would mis-split compressed bytes containing
"endstream"), and inflates via stdlib zlib.  Crisply documented boundary:
streams with any OTHER filter (DCT, JBIG2, JPX, Crypt, ...) are skipped,
never faked; round 6 HONORS /DecodeParms predictors at
BitsPerComponent 8 - TIFF horizontal differencing (2) and the PNG
row filters (10-15) are reversed after the filter chain - while
EarlyChange 0 (shifted LZW widths), other bit depths, and per-filter
parms arrays still skip, never garble (nested parameter dicts are
balanced when locating the stream dict, so an inner << >> cannot hide
/Filter).

Supported when parsing:
  * object scan for ``stream ... endstream`` bodies (any object order);
  * text runs between BT/ET;
  * ``(string) Tj``  and  ``' ``  show-string operators, plus
    ``<hex> Tj`` / ``<hex> '`` hex strings (7.3.4.3, round 6 - whitespace
    between digits, odd trailing digit zero-padded, << never confused);
  * ``[(a) -120 (b) ...] TJ``   arrays (kerning numbers ignored, strings
    concatenated — the Adobe-viewer-visible text);
  * ``Td  TD  T*``  line moves -> newline;
  * literal-string escapes  \\\\ \\( \\) \\n \\r \\t \\b \\f, octal \\ddd,
    and line-continuation backslash-newline;
  * BALANCED unescaped parentheses inside literal strings (7.3.4.2), to
    8 nesting levels — deeper nesting is outside the honest subset.

``make_pdf`` emits a complete single-page PDF-1.4 file (catalog, page
tree, font, content stream, byte-accurate xref + trailer) whose text
layer round-trips through ``parse_pdf_text`` — used by the synthetic
corpus so the contract oracle can pin the parser with plain SQL, and
valid input for any external PDF reader.

No reference anchor: the reference corpus is plain text
(/root/reference/corpus-miner/corpus_miner.cpp:417-448); this implements
the north rule's wider input surface from the public PDF-1.7 spec
(ISO 32000-1, sections 7.3.8 streams / 9.4 text objects).
"""

from __future__ import annotations

import re

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)


def _nested_string_pat(depth: int) -> bytes:
    """Literal-string body pattern supporting BALANCED unescaped parens to
    ``depth`` levels (ISO 32000-1 7.3.4.2: balanced parens inside a string
    are literal characters, no escape required).  The three alternatives are
    disjoint on their first byte (backslash / non-paren / open-paren), so
    matching is deterministic - no backtracking blowup.  Nesting deeper than
    ``depth`` is out of the documented honest subset."""
    pat = rb"(?:\\(?:.|\n)|[^\\()])*"
    for _ in range(depth):
        pat = rb"(?:\\(?:.|\n)|[^\\()]|\((?:" + pat + rb")\))*"
    return pat


# one literal string (escapes handled post-hoc) OR an operator token.
# Strings are matched ATOMICALLY and first, so operator names occurring
# inside string data (e.g. a text containing "ET" or "Td") can never be
# mistaken for operators — the BT/ET text-block state machine in
# parse_pdf_text runs over THIS token stream, not over raw bytes.
_TOKEN_RE = re.compile(
    rb"\((?P<str>" + _nested_string_pat(8) + rb")\)\s*(?P<op>Tj|')?"  # (s) Tj  (s) '
    # <48656c6c6f> hex string (7.3.4.3) - the (?<!<) / (?!>) guards keep
    # << dict delimiters from ever matching as an empty-ish hex string
    rb"|(?<!<)<(?P<hex>[0-9A-Fa-f\s]*)>(?!>)\s*(?P<hop>Tj|')?"
    rb"|\](?P<tj>\s*TJ)"  # end of a TJ array
    rb"|(?<![A-Za-z])(?P<nl>T\*|Td|TD)(?![A-Za-z])"  # line moves
    rb"|(?<![A-Za-z])(?P<bt>BT)(?![A-Za-z])"
    rb"|(?<![A-Za-z])(?P<et>ET)(?![A-Za-z])"
)


def _unhex_string(body: bytes) -> str:
    """Hex string body -> latin-1 text (whitespace allowed between digits;
    an odd trailing digit is padded with 0 per the spec)."""
    digits = re.sub(rb"\s+", b"", body)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(body: bytes) -> str:
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d, \dd, \ddd
                j = i + 1
                while j < min(i + 4, n) and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and body[i : i + 1] == b"\n":
                    i += 1
                continue
        out += c
        i += 1
    return out.decode("latin-1")


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+0\s+R)")


#: decodable stream filters (ISO 32000-1 7.4); DCT/JBIG2/... stay an honest
#: skip.  Abbreviated names are the inline-image forms, accepted anyway.
_SUPPORTED_FILTERS = {
    "FlateDecode", "Fl", "ASCIIHexDecode", "AHx", "ASCII85Decode", "A85",
    "LZWDecode", "LZW",
}


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (7.4.4): MSB-first variable-width codes 9->12 bits,
    256 = clear table, 257 = EOD, EarlyChange=1 (width grows one code
    early) - the TIFF/PDF LZW flavor, distinct from GIF's LSB-packed
    variant (operators/multimodal.py)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        code = 0
        for _ in range(width):
            code = (code << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if code == 256:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW: code out of range")
        if prev is not None:
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # the decoder's table is ONE entry behind the encoder's next_code
        # (no add on the first code after a clear), hence the -1
        if width < 12 and len(table) >= (1 << width) - early - 1:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode-compatible encoder (test/synthesis aid): clear code
    first, EOD last, EarlyChange=1."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if width < 12 and next_code >= (1 << width) - early:
            width += 1
        elif next_code > 4095:  # table full: clear and restart
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(257, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)

_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _stream_info(
    data: bytes, stream_start: int
) -> tuple[list[str] | None, int | None, tuple[int, int, int] | None]:
    """(filter_chain, direct_length, predictor_parms) from the dict
    immediately before a stream.  filter_chain is [] for unfiltered, the in-order name list when
    every filter is decodable, or None when any filter is unsupported ->
    caller skips the stream (honest boundary, never faked).  The third
    element carries honored /DecodeParms predictor settings
    (predictor, columns, colors) or None."""
    head = data[max(0, stream_start - 512) : stream_start]
    # last TOP-LEVEL << before the stream: a plain rfind would land on a
    # nested dict (/DecodeParms << ... >>) and miss the outer /Filter
    depth = 0
    dict_start = -1
    i = 0
    while i < len(head) - 1:
        pair = head[i : i + 2]
        if pair == b"<<":
            if depth == 0:
                dict_start = i
            depth += 1
            i += 2
        elif pair == b">>":
            depth = max(depth - 1, 0)
            i += 2
        else:
            i += 1
    d = head[dict_start if dict_start >= 0 else 0 :]
    lm = _LENGTH_RE.search(d)
    length = int(lm.group(1)) if lm else None
    fm = _FILTER_RE.search(d)
    if fm is None:
        return ([], length, None) if b"/Filter" not in d else (None, length, None)
    names = [n.decode("ascii") for n in re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))]
    if not names or any(n not in _SUPPORTED_FILTERS for n in names):
        return None, length, None
    # /DecodeParms: TIFF (2) and PNG (10-15) predictors at
    # BitsPerComponent 8 are HONORED (round 6 - the forms Flate streams
    # actually use); EarlyChange 0 (shifted LZW code widths) and other
    # bit depths still skip - decoding those without honoring the
    # parameters would emit garbage the token scan then "extracts"
    pm = re.search(rb"/(?:DecodeParms|DP)\b", d)
    predictor = None
    if pm is not None:
        parms = d[pm.end() :]
        pred = re.search(rb"/Predictor\s+(\d+)", parms)
        if pred is not None and int(pred.group(1)) > 1:
            pv = int(pred.group(1))
            bpc = re.search(rb"/BitsPerComponent\s+(\d+)", parms)
            if (pv == 2 or 10 <= pv <= 15) and (
                bpc is None or int(bpc.group(1)) == 8
            ) and len(names) == 1:
                cols = re.search(rb"/Columns\s+(\d+)", parms)
                colr = re.search(rb"/Colors\s+(\d+)", parms)
                predictor = (
                    pv,
                    int(cols.group(1)) if cols else 1,
                    int(colr.group(1)) if colr else 1,
                )
            else:
                return None, length, None
        ec = re.search(rb"/EarlyChange\s+(\d+)", parms)
        if ec is not None and int(ec.group(1)) == 0:
            return None, length, None
    return names, length, predictor


def _apply_filter(name: str, body: bytes) -> bytes:
    import base64
    import zlib

    if name in ("FlateDecode", "Fl"):
        return zlib.decompress(body)
    if name in ("ASCIIHexDecode", "AHx"):
        hexpart = body.split(b">")[0]
        digits = b"".join(hexpart.split())
        if len(digits) % 2:  # odd count: final digit padded with 0 (7.4.2)
            digits += b"0"
        return bytes.fromhex(digits.decode("ascii"))
    if name in ("ASCII85Decode", "A85"):
        payload = b"".join(body.split())
        if payload.startswith(b"<~"):
            payload = payload[2:]
        if payload.endswith(b"~>"):
            payload = payload[:-2]
        return base64.a85decode(payload)
    if name in ("LZWDecode", "LZW"):
        return _lzw_decode(body)
    raise ValueError(f"unsupported filter {name}")


def _undo_predictor(body: bytes, predictor: int, columns: int, colors: int) -> bytes:
    """Reverse /DecodeParms prediction on filter output (BPC 8): TIFF
    horizontal differencing (2) or the PNG per-row filters (10-15, each
    row tagged Sub/Up/Average/Paeth exactly as in PNG).  Pure stdlib -
    content streams are small and this module stays numpy-free."""
    rowlen = columns * colors
    if predictor == 2:
        if len(body) % rowlen:
            # a partial trailing row would pass through as raw deltas -
            # garbled "text"; skip the stream instead (caller catches)
            raise ValueError("truncated predictor row")
        out = bytearray(body)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r0 + colors, r0 + rowlen):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    # PNG predictors: rows are (1 + rowlen) bytes, first byte = filter tag
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 <= len(body):
        ft = body[pos]
        row = bytearray(body[pos + 1 : pos + 1 + rowlen])
        if len(row) < rowlen:
            raise ValueError("truncated predictor row")
        pos += 1 + rowlen
        for i in range(rowlen):
            a = row[i - colors] if i >= colors else 0
            b = prev[i]
            c = prev[i - colors] if i >= colors else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ValueError(f"unknown predictor row filter {ft}")
            row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def parse_pdf_text(data: bytes | bytearray | memoryview | None) -> str | None:
    """Extract the text layer of a PDF: uncompressed, /FlateDecode,
    /ASCIIHexDecode, /ASCII85Decode, /LZWDecode streams (and chains of
    these) are parsed; streams with any other filter are skipped.  None if
    the input has no PDF header or no parseable content stream."""
    import zlib

    if data is None:
        return None
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        return None
    lines: list[str] = []
    cur: list[str] = []
    saw_stream = False
    prev_end = 0
    for m in _STREAM_RE.finditer(data):
        if m.start(1) < prev_end:
            continue  # spurious match inside a previous /Length-framed body
        filters, length, predictor = _stream_info(data, m.start())
        if filters is None:
            continue
        body = m.group(1)
        if length is not None:
            # /Length-exact framing beats the regex when the (compressed)
            # body happens to contain the bytes "endstream"
            start = m.start(1)
            body = data[start : start + length]
            prev_end = start + length
            if not filters:
                body = body.rstrip(b"\r\n")
        else:
            prev_end = m.end(1)
        try:
            for fname in filters:
                body = _apply_filter(fname, body)
            if predictor is not None:
                body = _undo_predictor(body, *predictor)
        except (zlib.error, ValueError):
            continue  # malformed encoded body: skip, never garble
        in_text = False
        for tok in _TOKEN_RE.finditer(body):
            if tok.group("bt"):
                in_text = True
                saw_stream = True
                continue
            if tok.group("et"):
                in_text = False
                continue
            if not in_text:
                continue
            if tok.group("str") is not None or tok.group("hex") is not None:
                if tok.group("str") is not None:
                    cur.append(_unescape(tok.group("str")))
                    shown_op = tok.group("op")
                else:
                    cur.append(_unhex_string(tok.group("hex")))
                    shown_op = tok.group("hop")
                if shown_op == b"'":  # ' = next-line + show
                    lines.append("".join(cur[:-1]))
                    cur = [cur[-1]]
            elif tok.group("nl") is not None or tok.group("tj"):
                if tok.group("nl") is not None and cur:
                    lines.append("".join(cur))
                    cur = []
    if cur:
        lines.append("".join(cur))
    if not saw_stream:
        return None
    # NOTE no trailing-line trimming: an empty cur never flushes, so a final
    # T* can't fabricate a line — every emitted line is a real show op, and
    # the encode->parse round trip is exact including empty shows
    return "\n".join(lines)


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def wrap_words(text: str, width: int = 60) -> list[str]:
    """Greedy word wrap at ``width`` chars (a word longer than width gets its
    own line).  Splitting only ever replaces a single space, so
    " ".join(wrap_words(t)) == t for single-spaced text."""
    lines: list[str] = []
    for para in text.split("\n"):
        cur: list[str] = []
        cur_len = -1
        for w in para.split(" "):
            if cur and cur_len + 1 + len(w) > width:
                lines.append(" ".join(cur))
                cur, cur_len = [], -1
            cur.append(w)
            cur_len += 1 + len(w)
        lines.append(" ".join(cur))
    return lines


def make_pdf(text: str, width: int = 60, compress: bool = False) -> bytes:
    """Complete single-page PDF-1.4 whose text layer is ``text`` wrapped to
    ``width`` chars/line.  Every third line is a hex show string, remaining
    even lines use a TJ array (split at the first space, with a kerning
    number), the rest plain Tj — so a round trip exercises all three
    string forms.  Byte-accurate xref.  With ``compress`` the
    content stream is /FlateDecode (zlib) with an exact /Length — the form
    real-world PDFs use."""
    import zlib

    lines = wrap_words(text, width)
    ops = ["BT", "/F1 10 Tf", "12 780 Td"]
    for i, ln in enumerate(lines):
        e = _escape(ln)
        sp = e.find(" ")
        if i % 3 == 2:  # hex show string (7.3.4.3) - round 6
            ops.append(f"<{ln.encode('latin-1').hex()}> Tj")
        elif i % 2 == 0 and 0 < sp < len(e) - 1:
            ops.append(f"[({e[:sp + 1]}) -250 ({e[sp + 1:]})] TJ")
        else:
            ops.append(f"({e}) Tj")
        ops.append("0 -12 Td")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    if compress:
        raw = zlib.compress(content, 6)
        contents_obj = (
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(raw), raw)
        )
    else:
        contents_obj = b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(content) + 1, content,
        )

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        contents_obj,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
