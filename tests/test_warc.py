"""WARC (ISO 28500) reader: kernel framing, gzip members, Spark source."""

import zlib

import pyspark.sql.functions as F

from boilerplate_buster_spark.core.warcparse import (
    _gunzip_members,
    iter_warc_pages,
    iter_warc_records,
    make_warc,
    split_http,
)
from boilerplate_buster_spark.sources.warc import pages_from_warc_bytes

PAGES = [
    ("https://ex.com/a", "2026-08-16T12:00:00Z", b"<p>alpha</p>"),
    ("https://ex.com/b", "2026-08-16T12:00:01Z", b"<p>beta</p>"),
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = make_warc(PAGES, gzip_members=gz)
        got = list(iter_warc_pages(data))
        assert [(g["url"], g["warc_ts"], g["html"]) for g in got] == PAGES
        # warcinfo record present but filtered from pages
        assert len(list(iter_warc_records(data))) == len(PAGES) + 1


def test_content_length_framing_beats_lookalikes():
    # a body containing CRLFCRLF + "WARC/1.0" must not split the record
    tricky = b"<p>\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n</p>"
    data = make_warc([("u", "2026-01-01T00:00:00Z", tricky)])
    (page,) = iter_warc_pages(data)
    assert page["html"] == tricky


def test_http_split_and_status_filter():
    status, headers, body = split_http(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"
    )
    assert status == 404 and headers["content-type"] == "text/html"
    assert body == b"gone"
    # non-HTTP payload passes through with status 0
    assert split_http(b"raw bytes")[::2] == (0, b"raw bytes")


def test_gunzip_concatenated_members():
    def member(b):
        c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return c.compress(b) + c.flush()

    assert _gunzip_members(member(b"one") + member(b"two")) == b"onetwo"


def test_spark_source(spark):
    blob = make_warc(PAGES, gzip_members=True)
    blobs = spark.createDataFrame([(blob,)], "content binary")
    out = pages_from_warc_bytes(blobs).orderBy("url").collect()
    assert [r.url for r in out] == ["https://ex.com/a", "https://ex.com/b"]
    assert bytes(out[0].html) == b"<p>alpha</p>"
    # timestamp parsed as a real instant (session tz is UTC)
    assert out[0].warc_ts.isoformat().startswith("2026-08-16T12:00:00")
    # parse stage is a pure map — no shuffle
    plan = (
        pages_from_warc_bytes(blobs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_spark_source_drops_non_200(spark):
    # hand-build a 404 response record
    html = b"<p>x</p>"
    http = (
        b"HTTP/1.1 404 Not Found\r\nContent-Length: %d\r\n\r\n%s"
        % (len(html), html)
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://ex.com/gone\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: %d\r\n\r\n%s\r\n\r\n" % (len(http), http)
    )
    blobs = spark.createDataFrame([(rec,)], "content binary")
    assert pages_from_warc_bytes(blobs).count() == 0


# ---- property-based fuzz: framing must survive arbitrary binary payloads

from hypothesis import given, settings
from hypothesis import strategies as st

_PAGES = st.lists(
    st.tuples(
        st.text(alphabet="abcdefghij:/.-", min_size=1, max_size=40),
        st.just("2026-01-02T03:04:05Z"),
        st.binary(max_size=400),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=40, deadline=None)
@given(_PAGES, st.booleans())
def test_warc_roundtrip_property(pages, gz):
    data = make_warc(pages, gzip_members=gz)
    got = [(g["url"], g["warc_ts"], g["html"]) for g in iter_warc_pages(data)]
    assert got == pages


def test_warc_header_names_case_insensitive():
    """ISO 28500 field names are case-insensitive; a lowercase
    'content-length' must still frame the record (ADVICE round-3: a
    mis-cased length desynchronized framing and dropped every later
    record)."""
    from boilerplate_buster_spark.core.warcparse import iter_warc_pages

    body = b"<html>ok</html>"
    http = b"HTTP/1.1 200 OK\r\ncontent-length: %d\r\n\r\n%s" % (len(body), body)
    rec = (
        b"WARC/1.0\r\nwarc-type: response\r\n"
        b"WARC-TARGET-URI: https://ex.com/a\r\n"
        b"warc-date: 2026-01-01T00:00:00Z\r\n"
        b"CONTENT-LENGTH: %d\r\n\r\n%s\r\n\r\n" % (len(http), http)
    )
    tail_body = b"<html>second</html>"
    tail_http = b"HTTP/1.1 200 OK\r\n\r\n" + tail_body
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://ex.com/b\r\n"
        b"WARC-Date: 2026-01-01T00:00:01Z\r\n"
        b"Content-Length: %d\r\n\r\n%s\r\n\r\n" % (len(tail_http), tail_http)
    )
    pages = list(iter_warc_pages(rec + rec2))
    assert [p["url"] for p in pages] == ["https://ex.com/a", "https://ex.com/b"]
    assert pages[0]["html"] == body and pages[1]["html"] == tail_body
