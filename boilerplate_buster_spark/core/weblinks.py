"""HTML link extraction - the web-graph half of page parsing.

Web-scale corpora derive a link graph from the crawl (in/out degrees feed
spam scoring and crawl frontiers; anchor text feeds retrieval corpora).
This kernel emits, per page, every ``<a href=...>`` as
(resolved_href, anchor_text):

  * href resolution uses stdlib ``urllib.parse.urljoin`` against the page
    url (absolute hrefs pass through, root-relative and relative resolve);
  * anchor text is the whitespace-collapsed text content of the <a>
    element (charrefs decoded by html.parser);
  * <a> without an href contributes nothing; nested <a> (invalid HTML)
    closes the outer link first, matching browser recovery;
  * content inside script/style/template is ignored (same _SKIP set as the
    text parser).

Same stdlib-HTMLParser cost profile as core/domblocks - one parse per
page inside an Arrow batch, no per-link Python round trips.
No reference anchor (the reference is text-only); mirrors public crawl
pipeline practice.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

from boilerplate_buster_spark.core.htmlparse import _SKIP


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._href: str | None = None
        self._anchor: list[str] = []

    def _close_link(self) -> None:
        if self._href is not None:
            self.links.append(
                (self._href, " ".join("".join(self._anchor).split()))
            )
        self._href = None
        self._anchor = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if tag == "a":
            if self._href is not None:  # nested <a>: close the outer first
                self._close_link()
            href = dict(attrs).get("href")
            if href is not None:
                self._href = href
                self._anchor = []

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._close_link()

    def handle_data(self, data):
        if self._skip_depth == 0 and self._href is not None:
            self._anchor.append(data)


def extract_links_html(
    raw: bytes | str | None, base_url: str = ""
) -> list[tuple[str, str]]:
    """[(resolved_href, anchor_text)] in document order; [] for None or
    undecodable input."""
    if raw is None:
        return []
    if isinstance(raw, (bytes, bytearray, memoryview)):
        try:
            raw = bytes(raw).decode("utf-8", errors="replace")
        except Exception:
            return []
    p = _LinkParser()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return []
    p._close_link()  # unterminated trailing <a>
    if base_url:
        return [(urljoin(base_url, h), a) for h, a in p.links]
    return p.links
