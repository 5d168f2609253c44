"""Reference-exact tokenizer as pure Catalyst column expressions (JVM-side,
whole-stage codegen - NO Python on the hot path).

Semantics (= core/tokenize.py, from /root/reference/corpus-miner/tokenizer.h:48-64):
  token = maximal run of [ASCII alnum | any codepoint > 0x7F],
  ASCII-only lowercasing ('A'-'Z' only - Spark's lower() is Unicode-aware and
  would DIVERGE, e.g. on Cyrillic capitals; see SURVEY.md section 1).

Implementation: translate() for the 26-letter ASCII fold, then split() on runs
of ASCII non-alphanumerics.  Codepoints above 0x7F (including each half of a
surrogate pair) are never delimiters, exactly like the reference's byte loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"

# ASCII chars that are NOT [0-9a-z]; uppercase is already folded before the
# split, so including \x41-\x5a here is moot but keeps the class contiguous.
_DELIM_RE = r"[\x00-\x2f\x3a-\x60\x7b-\x7f]+"


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only lowercase (tokenizer.h:56); non-ASCII untouched."""
    return F.translate(col, _UPPER, _LOWER)


def tokens(col: Column | str) -> Column:
    """string -> array<string> of reference-exact tokens (P1 in SURVEY.md)."""
    return F.array_remove(F.split(ascii_lower(col), _DELIM_RE), "")
