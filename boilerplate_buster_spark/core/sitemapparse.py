"""Sitemap (sitemaps.org XML) parsing - the crawl-frontier seed source
next to robots.txt.

Honest subset: ``<urlset>`` documents with ``<url>`` entries carrying
``<loc>`` (required) and optional ``<lastmod>`` / ``<changefreq>`` /
``<priority>``; ``<sitemapindex>`` documents with ``<sitemap><loc>``
child-sitemap entries (flagged ``is_index``).  Namespaced or oddly-cased
tags match by local name.  Entries without a <loc> are dropped.  Parsed
with stdlib HTMLParser (tolerant of XML), same cost profile as the other
page kernels; gzip members are the WARC layer's job, not this one.
"""

from __future__ import annotations

from html.parser import HTMLParser


def _local(tag: str) -> str:
    return tag.rsplit(":", 1)[-1].lower()


class _SitemapParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.entries: list[dict] = []
        self.is_index = False
        self._cur: dict | None = None
        self._field: str | None = None

    def handle_starttag(self, tag, attrs):
        t = _local(tag)
        if t == "sitemapindex":
            self.is_index = True
        elif t in ("url", "sitemap"):
            self._cur = {"loc": "", "lastmod": "", "changefreq": "", "priority": ""}
        elif self._cur is not None and t in (
            "loc", "lastmod", "changefreq", "priority"
        ):
            self._field = t

    def handle_endtag(self, tag):
        t = _local(tag)
        if t in ("url", "sitemap") and self._cur is not None:
            if self._cur["loc"]:
                self.entries.append(self._cur)
            self._cur = None
        elif t == self._field:
            self._field = None

    def handle_data(self, data):
        if self._cur is not None and self._field:
            self._cur[self._field] += data.strip()


def parse_sitemap(raw: bytes | str | None) -> tuple[bool, list[dict]]:
    """(is_index, entries) with entries = [{loc, lastmod, changefreq,
    priority}]; (False, []) for None/unparseable input."""
    if raw is None:
        return False, []
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw).decode("utf-8", errors="replace")
    p = _SitemapParser()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return False, []
    return p.is_index, p.entries
