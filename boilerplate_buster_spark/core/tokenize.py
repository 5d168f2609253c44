"""Reference-exact tokenizer.

Semantics replicated from /root/reference/corpus-miner/tokenizer.h:
  - UTF-8 path (tokenizer.h:48-64): a token is a maximal run of bytes where
    byte > 127 or ASCII isalnum; ASCII 'A'-'Z' lowered to 'a'-'z'; bytes >127
    pass through UNMODIFIED (no Unicode lowercasing).
  - UTF-16 path (tokenizer.h:67-88): any non-ASCII BMP codepoint is treated as
    alphanumeric, ASCII handled as above, then transcoded to UTF-8
    (tokenizer.h:11-45). BOM sniffing selects the path at load
    (corpus_miner.cpp:417-448).

Both paths are equivalent to a single codepoint-level rule on decoded text:
a token is a maximal run of codepoints where cp > 127 or cp is ASCII
alphanumeric, with ASCII-only lowercasing.  (For UTF-8 input: every byte of a
non-ASCII character is >127, so byte runs == codepoint runs; ASCII delimiters
are single bytes.  For UTF-16 input: surrogate halves are both >=0xD800 >127,
so astral codepoints stay inside tokens, matching the surrogate-pair handling
at tokenizer.h:19-26.)

This module is the pure-Python kernel; the Spark expression equivalent lives
in boilerplate_buster_spark.functions.tokenizer (translate + split, JVM-side).
"""

from __future__ import annotations

import re

# Maximal runs of [ASCII alnum | any codepoint > 0x7F].
_TOKEN_RE = re.compile(r"[0-9A-Za-z\u0080-\U0010FFFF]+")

# ASCII-only lowercase map (reference lowers only 'A'-'Z', tokenizer.h:56).
_ASCII_LOWER = {ord(c): ord(c) + 32 for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}


def ascii_lower(s: str) -> str:
    """Lowercase ASCII 'A'-'Z' only; all other codepoints unchanged."""
    return s.translate(_ASCII_LOWER)


def tokenize(text: str) -> list[str]:
    """text -> tokens, reference-exact (tokenizer.h:48-64 semantics)."""
    return [ascii_lower(m) for m in _TOKEN_RE.findall(text)]


def tokenize_with_spans(text: str) -> list[tuple[str, int, int]]:
    """Like :func:`tokenize` but returns (token, start, end) char offsets.

    Needed by the extraction pass: byte-identical output requires mapping
    mined token spans back to original character ranges.
    """
    return [(ascii_lower(m.group()), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def decode_page_bytes(raw: bytes) -> str:
    """BOM-sniffing decode, replicating corpus_miner.cpp:417-448:
    FF FE -> UTF-16LE, FE FF -> UTF-16BE, otherwise UTF-8 (lossy on bad bytes).
    """
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", errors="replace")
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    # utf-8-sig strips an optional UTF-8 BOM like the reference skips it.
    return raw.decode("utf-8-sig", errors="replace")
