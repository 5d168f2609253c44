"""Main-content extraction kernel: strip mined boilerplate phrase spans from a
page's text, byte-exact.

The reference engine only MINES phrases (its results CSV is consumed by a
human/post-processor); the extraction semantics here are the north-rule
completion of that pipeline (BASELINE.json north_star: "the complement of the
marked spans is the main content", SURVEY.md intro).  The spec is defined
precisely so the distributed pass can be verified byte-identical per url:

  1. tokenize the page text with character offsets
     (reference-exact tokenizer, core/tokenize.py);
  2. for every mined phrase P and every token index i where
     tokens[i : i+|P|] == P, mark token indices i .. i+|P|-1 as boilerplate
     (union over all phrases and all occurrences - order-independent,
     hence deterministic);
  3. each maximal run of marked tokens defines a character span
     [start(first token), end(last token));
  4. extracted_text = the original text with those character spans deleted
     (all other bytes, including whitespace and punctuation, preserved
     verbatim).

This mirrors the miner's occupancy-bitmask marking
(/root/reference/corpus-miner/_ours/bloom_gram_miner.cpp:697-702) replayed
over the full corpus as a second pass.

These functions are the per-row kernel of the Arrow-batched second pass
(operators/extraction.py); they are also the pytest golden oracle.
"""

from __future__ import annotations

from collections import defaultdict

from boilerplate_buster_spark.core.tokenize import tokenize_with_spans


def index_phrases(phrases: list[str]) -> dict[int, set[tuple[str, ...]]]:
    """Group phrase token-tuples by length for the matcher."""
    by_len: dict[int, set[tuple[str, ...]]] = defaultdict(set)
    for p in phrases:
        toks = tuple(p.split(" "))
        if toks:
            by_len[len(toks)].add(toks)
    return dict(by_len)


def marked_token_indices(
    tokens: list[str], by_len: dict[int, set[tuple[str, ...]]]
) -> set[int]:
    """Union of token indices covered by any phrase occurrence (spec step 2)."""
    marked: set[int] = set()
    nt = len(tokens)
    for L, phrase_set in by_len.items():
        if L > nt:
            continue
        for i in range(nt - L + 1):
            if tuple(tokens[i : i + L]) in phrase_set:
                marked.update(range(i, i + L))
    return marked


def strip_boilerplate(
    text: str, by_len: dict[int, set[tuple[str, ...]]]
) -> tuple[str, list[tuple[int, int, str]]]:
    """-> (extracted_text, removed_spans [(char_start, char_end, phrase_text)]).

    removed_spans are the maximal marked runs (spec step 3); phrase_text is
    the run's own token text (space-joined), recorded as lineage.
    """
    spans_tok = tokenize_with_spans(text)
    tokens = [t for t, _, _ in spans_tok]
    marked = marked_token_indices(tokens, by_len)
    if not marked:
        return text, []

    removed: list[tuple[int, int, str]] = []
    run_start = None
    prev = None
    for i in sorted(marked):
        if run_start is None:
            run_start = i
        elif i != prev + 1:
            removed.append(_run_span(spans_tok, run_start, prev))
            run_start = i
        prev = i
    removed.append(_run_span(spans_tok, run_start, prev))

    out = []
    cursor = 0
    for s, e, _ in removed:
        out.append(text[cursor:s])
        cursor = e
    out.append(text[cursor:])
    return "".join(out), removed


def _run_span(spans_tok, first_idx: int, last_idx: int) -> tuple[int, int, str]:
    s = spans_tok[first_idx][1]
    e = spans_tok[last_idx][2]
    phrase = " ".join(t for t, _, _ in spans_tok[first_idx : last_idx + 1])
    return (s, e, phrase)
