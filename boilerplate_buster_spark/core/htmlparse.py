"""HTML -> text-block parsing kernel (stdlib html.parser; the container has no
lxml/selectolax, and the stdlib parser is deterministic and dependency-free).

Spec (used by the page generator round-trip and the Arrow-batched parse stage
in operators/extraction.py):

  * content inside <head>, <script>, <style>, <template>, <noscript> is dropped;
  * every BLOCK-level element boundary flushes the current text block;
  * the page's text representation = blocks joined with a single "\\n".

This is the S2/Stage-1 analog of the reference's byte->text load phase
(/root/reference/corpus-miner/corpus_miner.cpp:417-448) lifted to HTML pages
per the north rule (html binary -> DOM text blocks)."""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP = {"head", "script", "style", "template", "noscript"}
_BLOCK = {
    "p", "div", "nav", "footer", "header", "section", "article", "aside",
    "main", "ul", "ol", "li", "table", "tr", "td", "th", "h1", "h2", "h3",
    "h4", "h5", "h6", "br", "blockquote", "pre", "form", "figure",
}


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._cur: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if self._cur:
            s = "".join(self._cur).strip()
            if s:
                self.blocks.append(s)
            self._cur = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._cur.append(data)


def html_to_text(raw: bytes | str | None) -> str | None:
    """Decode (BOM-sniffing) + parse to the block-joined text representation."""
    if raw is None:
        return None
    if isinstance(raw, (bytes, bytearray, memoryview)):
        from boilerplate_buster_spark.core.tokenize import decode_page_bytes

        raw = decode_page_bytes(bytes(raw))
    p = _BlockParser()
    p.feed(raw)
    p.close()
    p._flush()
    return "\n".join(p.blocks)
