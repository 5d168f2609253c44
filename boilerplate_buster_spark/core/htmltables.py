"""HTML table extraction - structured (row, col, cell) data from <table>
markup, the table-corpus side of web extraction (WebTables-class datasets
are built exactly from this parse).

Semantics (stdlib HTMLParser, same cost profile as the other kernels):
  * one result per <table>, DOCUMENT ORDER, nested tables handled by a
    stack (an inner table's text never leaks into the outer cell);
  * <td>/<th> cells with IMPLIED closes (a new cell, row end, or table
    end closes the open cell, as browsers do);
  * is_header marks <th> cells; text is whitespace-collapsed with
    charrefs decoded; script/style content ignored;
  * rows keep their own lengths (ragged tables are emitted as-is; colspan
    and rowspan attributes are OUTSIDE this honest subset and are treated
    as plain cells - documented, never half-expanded);
  * a cell containing a nested table contributes only its text BEFORE the
    inner table (the inner table is its own result; trailing text after
    it is dropped) - the one divergence from browser cell flattening,
    documented here.
"""

from __future__ import annotations

from html.parser import HTMLParser

from boilerplate_buster_spark.core.htmlparse import _SKIP


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[tuple[str, bool]]]] = []
        self._stack: list[list[list[tuple[str, bool]]]] = []
        self._cell: list[str] | None = None
        self._cell_header = False
        self._skip_depth = 0

    def _close_cell(self) -> None:
        if self._cell is not None and self._stack:
            text = " ".join("".join(self._cell).split())
            rows = self._stack[-1]
            if not rows:
                rows.append([])
            rows[-1].append((text, self._cell_header))
        self._cell = None
        self._cell_header = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if tag == "table":
            self._close_cell()
            self._stack.append([])
        elif tag == "tr" and self._stack:
            self._close_cell()
            self._stack[-1].append([])
        elif tag in ("td", "th") and self._stack:
            self._close_cell()
            if not self._stack[-1]:  # cell before any <tr>: implied row
                self._stack[-1].append([])
            self._cell = []
            self._cell_header = tag == "th"

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr":
            self._close_cell()
        elif tag == "table" and self._stack:
            self._close_cell()
            done = self._stack.pop()
            self.tables.append([r for r in done if r])

    def handle_data(self, data):
        if self._skip_depth == 0 and self._cell is not None:
            self._cell.append(data)


def extract_tables(raw: bytes | str | None) -> list[list[list[tuple[str, bool]]]]:
    """[table][row][cell] = (text, is_header), tables in document order
    (inner tables listed when they CLOSE, browser-style); [] for None or
    unparseable input."""
    if raw is None:
        return []
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw).decode("utf-8", errors="replace")
    p = _TableParser()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return []
    # tolerate an unterminated trailing table
    while p._stack:
        p._close_cell()
        done = p._stack.pop()
        p.tables.append([r for r in done if r])
    return p.tables
