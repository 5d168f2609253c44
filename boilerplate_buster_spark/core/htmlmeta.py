"""HTML head-metadata extraction: title, meta description, Open Graph
title, canonical link, document language, declared charset - the page
facts crawl indexes and dedup-by-canonical need, parsed with the same
stdlib HTMLParser cost profile as the text/block/link kernels.

Rules (first occurrence wins for every field, matching browser behavior):
  * ``title``        - text content of the first <title>;
  * ``description``  - <meta name="description" content=...>;
  * ``og_title``     - <meta property="og:title" content=...>;
  * ``canonical``    - <link rel="canonical" href=...>;
  * ``lang``         - the <html lang=...> attribute;
  * ``charset``      - <meta charset=...> or the charset= parameter of
                       <meta http-equiv="Content-Type" content=...>.
Missing fields are empty strings.  name/property/rel matching is
case-insensitive; values are whitespace-collapsed.
"""

from __future__ import annotations

from html.parser import HTMLParser


def _clean(s: str | None) -> str:
    return " ".join((s or "").split())


class _MetaParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta = {
            "title": "",
            "description": "",
            "og_title": "",
            "canonical": "",
            "lang": "",
            "charset": "",
        }
        self._in_title = False

    def _set(self, key: str, val: str | None) -> None:
        if not self.meta[key]:
            self.meta[key] = _clean(val)

    def handle_starttag(self, tag, attrs):
        a = {k.lower(): v for k, v in attrs}
        if tag == "html":
            self._set("lang", a.get("lang"))
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            if name == "description":
                self._set("description", a.get("content"))
            if prop == "og:title":
                self._set("og_title", a.get("content"))
            if a.get("charset"):
                self._set("charset", a.get("charset"))
            elif (a.get("http-equiv") or "").lower() == "content-type":
                content = a.get("content") or ""
                for part in content.split(";"):
                    part = part.strip()
                    if part.lower().startswith("charset="):
                        self._set("charset", part[len("charset="):])
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels:
                self._set("canonical", a.get("href"))

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title and not self.meta["title"]:
            cleaned = _clean(data)
            if cleaned:
                self.meta["title"] = cleaned


def extract_meta(raw: bytes | str | None) -> dict[str, str]:
    """Metadata dict (see module docstring); all-empty for None or
    unparseable input."""
    empty = {
        "title": "", "description": "", "og_title": "",
        "canonical": "", "lang": "", "charset": "",
    }
    if raw is None:
        return dict(empty)
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw).decode("utf-8", errors="replace")
    p = _MetaParser()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return dict(empty)
    return p.meta


class _OutlineParser(HTMLParser):
    """h1-h6 headings in document order with text content."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.headings: list[tuple[int, str]] = []
        self._level = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if len(tag) == 2 and tag[0] == "h" and tag[1] in "123456":
            self._level = int(tag[1])
            self._buf = []

    def handle_data(self, data):
        if self._level:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if self._level and tag == f"h{self._level}":
            self.headings.append((self._level, "".join(self._buf).strip()))
            self._level = 0


def extract_outline(html) -> list[tuple[int, int, str, int]]:
    """(pos, level, text, parent_pos) per h1-h6 heading, document order;
    parent = the nearest PRIOR heading of a strictly smaller level number
    (-1 = root).  Malformed HTML yields whatever headings close properly
    - never raises (html.parser is tolerant by design)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    p = _OutlineParser()
    try:
        p.feed(str(html))
        p.close()
    except Exception:
        pass
    out: list[tuple[int, int, str, int]] = []
    stack: list[tuple[int, int]] = []  # (level, pos)
    for pos, (level, text) in enumerate(p.headings):
        while stack and stack[-1][0] >= level:
            stack.pop()
        parent = stack[-1][1] if stack else -1
        out.append((pos, level, text, parent))
        stack.append((level, pos))
    return out
