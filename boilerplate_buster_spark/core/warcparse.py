"""WARC (Web ARChive, ISO 28500) reader/writer, stdlib-only.

Common Crawl ships pages as WARC: a sequence of records, each a header
block (``WARC/1.0`` + name:value lines, CRLF) then ``Content-Length``
bytes of payload, then CRLF CRLF.  Crawl archives store one gzip MEMBER
per record (concatenated members per file), which is what lets a splittable
reader seek between records; this module supports both plain and
member-gzipped bytes via zlib.

``iter_warc_records`` yields every record as (headers: dict, payload:
bytes).  ``iter_warc_pages`` filters to ``response`` records, splits the
HTTP/1.1 envelope from the entity body, and yields the fields matching the
north-rule input shape: (url, warc_ts, html_bytes, http_status).

``make_warc`` emits byte-accurate records (warcinfo + one response record
per page, correct Content-Length, optional per-record gzip members) for
round-trip tests and the contract oracle.

Reference anchor: none — the reference reads plain text dirs/CSV
(/root/reference/corpus-miner/corpus_miner.cpp:417-448); WARC is the
north rule's "Common-Crawl-style" ingest surface, implemented from the
public ISO 28500 / WARC-1.1 spec and the documented Common Crawl layout.
"""

from __future__ import annotations

import zlib
from typing import Iterator


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (zlib stops at the first)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        out += d.flush()
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per record; transparently gunzips."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break  # not a record boundary -> stop rather than guess
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        # ISO 28500 4.2: field names are case-insensitive - lowercase keys on
        # parse (as split_http does for HTTP); a 'content-length' spelled any
        # other way must still frame the record or every later record in the
        # file silently desynchronizes and drops
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def split_http(payload: bytes) -> tuple[int, dict, bytes]:
    """HTTP/1.1 response payload -> (status, headers, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return 0, {}, payload
    lines = payload[:sep].split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return status, headers, payload[sep + 4 :]


def iter_warc_pages(data: bytes) -> Iterator[dict]:
    """response records -> {url, warc_ts (ISO string), status, html (bytes)}."""
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        status, _http_headers, body = split_http(payload)
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "status": status,
            "html": body,
        }


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
    )
    head += b"Content-Length: %d\r\n\r\n" % len(payload)
    return head + payload + b"\r\n\r\n"


def make_warc(
    pages: list[tuple[str, str, bytes]], gzip_members: bool = False
) -> bytes:
    """[(url, iso_ts, html_bytes)] -> a complete WARC file: one warcinfo
    record then one response record per page (HTTP/1.1 200 envelope).
    With gzip_members=True each record is its own gzip member, the
    Common Crawl file layout."""
    records = [
        _record(
            [("WARC-Type", "warcinfo"), ("WARC-Date", pages[0][1] if pages else "1970-01-01T00:00:00Z")],
            b"software: boilerplate-buster-spark\r\n",
        )
    ]
    for url, ts, html in pages:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
            b"Content-Length: %d\r\n\r\n%s" % (len(html), html)
        )
        records.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", ts),
                ],
                http,
            )
        )
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for r in records:
        c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out += c.compress(r) + c.flush()
    return bytes(out)
