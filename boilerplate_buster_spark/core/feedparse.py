"""RSS 2.0 / Atom 1.0 feed parsing - the crawl-frontier input format
next to sitemaps (core/sitemapparse.py): feeds announce new URLs before
a recrawl would find them.

Real XML parsing (xml.etree, expat) - not regex scraping: namespaces
are handled by localname matching, so namespaced Atom (the common case)
and bare RSS both parse.  Honest boundary: malformed XML returns no
entries (skip, never garble - the pdfparse.py convention); only the
fields every aggregator agrees on are extracted (title, link,
published/pubDate).  Atom links prefer rel="alternate" (or the first
link) per RFC 4287 section 4.2.7.

No reference anchor (the reference reads local files); mirrors public
feed-reader practice.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _child_text(el, name: str) -> str:
    for c in el:
        if _local(c.tag) == name:
            return (c.text or "").strip()
    return ""


def _atom_link(entry) -> str:
    first = ""
    for c in entry:
        if _local(c.tag) != "link":
            continue
        href = (c.get("href") or "").strip()
        if not first:
            first = href
        if c.get("rel", "alternate") == "alternate":
            return href
    return first


def parse_feed(xml_text: str) -> list[tuple[str, str, str]]:
    """[(title, link, published)] for each RSS <item> or Atom <entry>,
    in document order.  Malformed XML or an unrecognized root -> []."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    rname = _local(root.tag)
    out: list[tuple[str, str, str]] = []
    if rname == "rss":
        for ch in root:
            if _local(ch.tag) != "channel":
                continue
            for item in ch:
                if _local(item.tag) != "item":
                    continue
                out.append(
                    (
                        _child_text(item, "title"),
                        _child_text(item, "link"),
                        _child_text(item, "pubDate"),
                    )
                )
    elif rname == "feed":  # Atom
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            out.append(
                (
                    _child_text(entry, "title"),
                    _atom_link(entry),
                    _child_text(entry, "published")
                    or _child_text(entry, "updated"),
                )
            )
    return out
