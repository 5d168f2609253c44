"""Pure-Python reference-exact mining semantics.

This module reimplements, from the behavioral spec in SURVEY.md section 2.5/2.6
(cited to /root/reference file:line), the three miners of the reference engine:

  * ``bloomspan_mine``  - Maximal Frequent Phrases via score-ordered greedy
    right-expansion with a global occupancy bitmask and backward-closure check
    (/root/reference/corpus-miner/_ours/bloom_gram_miner.cpp:245-723).
    Support = UNIQUE-DOC count.
  * ``bide_mine``       - BIDE+ contiguous closed patterns
    (/root/reference/corpus-miner/bide/bide_miner.cpp:43-119).
    Support = OCCURRENCE count.
  * ``clospan_mine``    - CloSpan variant: identical except the backward check
    returns "closed" early when any occurrence sits at document start
    (/root/reference/corpus-miner/clospan/clospan_miner.cpp:17-37).

Roles in the rebuild:
  1. Golden oracle for pytest (tiny corpora, vs observed reference outputs).
  2. Driver-side finalization kernel of the Spark BloomSpan operator: the
     Spark layer does the heavy corpus-scale work (tokenize, n-gram explode,
     salted distinct-doc aggregation, candidate thresholding, occurrence-window
     gathering); the post-threshold candidate set is corpus-statistics-bounded
     (boilerplate templates, not corpus rows), and the inherently sequential
     greedy/bitmask selection runs here over that bounded set.

Determinism deviations vs the reference (documented, SURVEY.md section 5):
  * candidate order: (-score, -support, tokens ASC) - reference uses an
    unstable parallel sort with no final key (bloom_gram_miner.cpp:595-607).
  * expansion tie: max unique-doc support, then LEXICOGRAPHICALLY SMALLEST
    next token - reference lets the later hash-map entry win (":660-661").
  * example docs: first 2 of the SORTED unique doc-identity set - reference
    iterates an unordered_set (corpus_miner.cpp:547-557).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Phrase:
    """Mining result row (reference types.h:12-16)."""

    tokens: list[str]
    support: int
    occs: list[tuple[int, int]] = field(default_factory=list)  # (doc_idx, pos)

    @property
    def text(self) -> str:
        return " ".join(self.tokens)


def word_doc_freq(docs: list[list[str]]) -> dict[str, int]:
    """Per-word distinct-document frequency (corpus_miner.cpp:485-488)."""
    df: dict[str, int] = defaultdict(int)
    for doc in docs:
        for w in set(doc):
            df[w] += 1
    return dict(df)


def ngram_candidates(
    docs: list[list[str]], n: int, min_docs: int
) -> list[tuple[tuple[str, ...], int, list[tuple[int, int]]]]:
    """Exact replacement of the Bloom pass + seed merge (stages A-D,
    bloom_gram_miner.cpp:297-589): every n-gram occurring in >= min_docs
    DISTINCT docs, with its full occurrence list.

    The reference's counting-Bloom gate and per-word-DF gate (":410-421") are
    pure cardinality killers; the surviving set is identical to the exact
    distinct-doc threshold computed here (any n-gram with distinct-doc support
    >= min_docs necessarily has every member token DF >= min_docs and bloom
    counter >= min_docs).
    """
    occs: dict[tuple[str, ...], list[tuple[int, int]]] = defaultdict(list)
    for d, doc in enumerate(docs):
        if len(doc) < n:  # bloom_gram_miner.cpp:391
            continue
        for p in range(len(doc) - n + 1):
            occs[tuple(doc[p : p + n])].append((d, p))
    out = []
    for gram, olist in occs.items():
        support = len({d for d, _ in olist})
        if support >= min_docs:  # ":562"
            out.append((gram, support, olist))
    return out


def bloomspan_mine(
    docs: list[list[str]],
    min_docs: int,
    ngrams: int,
    min_l: int | None = None,
) -> list[Phrase]:
    """Full BloomSpan pipeline on an in-memory corpus (golden oracle path)."""
    if min_l is None:
        min_l = ngrams  # main.cpp:67
    candidates = [
        Phrase(list(g), s, o) for g, s, o in ngram_candidates(docs, ngrams, min_docs)
    ]
    return expand_candidates(docs, candidates, min_docs, min_l)


def expand_candidates(
    docs: list[list[str]],
    candidates: list[Phrase],
    min_docs: int,
    min_l: int,
) -> list[Phrase]:
    """Stages E-F: score sort + greedy expansion + bitmask + backward closure
    (bloom_gram_miner.cpp:595-706).  ``docs`` may be a dict {doc_idx: tokens}
    covering at least every doc that appears in a candidate occurrence.

    Delegates to the shared windowed kernel (core/expand.py) with windows
    built from the full documents (W = doc tail length), which is exactly the
    whole-corpus semantics of the reference.
    """
    from boilerplate_buster_spark.core.expand import WCandidate, WOcc, expand_windowed

    get_doc = docs.__getitem__ if isinstance(docs, dict) else lambda i: docs[i]
    wcands = []
    max_tail = 1
    for c in candidates:
        woccs = []
        for d, p in c.occs:
            doc = get_doc(d)
            woccs.append(WOcc(d, p, doc[p - 1] if p > 0 else None, doc[p:]))
            max_tail = max(max_tail, len(doc) - p)
        wcands.append(WCandidate(list(c.tokens), c.support, woccs))

    out = expand_windowed(wcands, min_docs, min_l, window=max_tail + 1)
    return [
        Phrase(w.tokens, w.support, [(o.doc_id, o.pos) for o in w.occs])
        for w in out
    ]


def _closed_mine(
    docs: list[list[str]],
    min_sup: int,
    min_l: int,
    clospan_early_exit: bool,
) -> list[Phrase]:
    """Shared BIDE+/CloSpan DFS (bide_miner.cpp:43-119, clospan_miner.cpp:40-105).

    Support = occurrence count (bide_miner.cpp:55).  ``matches`` hold the END
    position of the pattern inside each doc (pos advances with each extension),
    so the backward-preceding item lives at pos - len(patt) (":33").
    Iterative (explicit stack) instead of recursion to survive long phrases.
    """
    results: list[Phrase] = []

    def backward_closed(patt_len: int, matches: list[tuple[int, int]]) -> bool:
        current_sup = len(matches)
        back_counts: dict[str, int] = defaultdict(int)
        for d, p in matches:
            if p >= patt_len:
                prev = docs[d][p - patt_len]
                back_counts[prev] += 1
                if back_counts[prev] == current_sup:
                    return False
            elif clospan_early_exit:
                # clospan_miner.cpp:32-35: occurrence at doc start =>
                # no common prefix can exist.
                return True
        return True

    # Root scan (bide_miner.cpp:94-103): posting of every (token, doc, pos).
    root: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, doc in enumerate(docs):
        for p, w in enumerate(doc):
            root[w].append((d, p))

    stack: list[tuple[list[str], list[tuple[int, int]]]] = []
    for item in sorted(root):
        if len(root[item]) >= min_sup:
            stack.append(([item], root[item]))

    while stack:
        patt, matches = stack.pop()
        current_sup = len(matches)
        if not backward_closed(len(patt), matches):
            continue
        # Extensions: immediate next token only (contiguous, ":62-74").
        exts: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for d, p in matches:
            np = p + 1
            if np < len(docs[d]):
                exts[docs[d][np]].append((d, np))
        is_closed = all(len(v) != current_sup for v in exts.values())
        if len(patt) >= min_l and is_closed:
            results.append(Phrase(list(patt), current_sup, list(matches)))
        for item in sorted(exts):
            if len(exts[item]) >= min_sup:
                stack.append((patt + [item], exts[item]))

    return results


def bide_mine(docs, min_docs, min_l=1, **_):
    """BIDE+ contiguous closed-pattern miner (occurrence-count support)."""
    return _closed_mine(docs, min_docs, min_l, clospan_early_exit=False)


def clospan_mine(docs, min_docs, min_l=1, **_):
    """CloSpan contiguous closed-pattern miner (occurrence-count support)."""
    return _closed_mine(docs, min_docs, min_l, clospan_early_exit=True)


def prefixspan_mine(
    docs: list[list[str]],
    min_docs: int,
    min_l: int = 1,
    mode: str = "closed",
) -> list[Phrase]:
    """LCM-seq contiguous PrefixSpan with ALL/CLOSED/MAXIMAL output modes
    (reference: prefixspan/corpus_miner.h:18 MiningMode, decision logic at
    prefixspan/corpus_miner.cpp:128-142; the shipped binary hardcodes
    MODE_CLOSED at corpus_miner.cpp:212).

    Semantics replicated exactly, including the reference's quirks:
      * support = UNIQUE-DOC count (occ_delivery, corpus_miner.cpp:69-93);
      * projections whose match ends at the LAST token of a doc are dropped
        from the projected database (corpus_miner.cpp:170-177), so a pattern
        whose every occurrence ends a document is never emitted (the child
        call guarding output is skipped when next_db is empty, ":180-182");
      * ALL: every frequent prefix; CLOSED: no frequent extension with EQUAL
        support; MAXIMAL: no frequent extension at all (":134-141").
    Support counting itself is unaffected by the end-of-doc drop: the count
    for prefix+token is taken BEFORE the drop.
    """
    mode = mode.lower()
    if mode not in ("all", "closed", "maximal"):
        raise ValueError(f"unknown mode {mode!r}")
    results: list[Phrase] = []
    initial_db = [
        (d, p) for d, doc in enumerate(docs) if doc for p in range(len(doc))
    ]
    initial_support = len({d for d, _ in initial_db})
    # stack entries: (prefix, projected db [(doc, next-pos)], support)
    stack = [([], initial_db, initial_support)]
    while stack:
        prefix, db, cur_sup = stack.pop()
        item_docs: dict[str, set[int]] = defaultdict(set)
        by_token: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for d, p in db:
            doc = docs[d]
            if p < len(doc):
                tok = doc[p]
                item_docs[tok].add(d)
                by_token[tok].append((d, p))
        has_freq_ext = any(len(s) >= min_docs for s in item_docs.values())
        has_equal_sup_ext = any(
            len(s) >= min_docs and len(s) == cur_sup for s in item_docs.values()
        )
        if len(prefix) >= min_l and (
            mode == "all"
            or (mode == "maximal" and not has_freq_ext)
            or (mode == "closed" and not has_equal_sup_ext)
        ):
            results.append(
                Phrase(list(prefix), cur_sup, [(d, p - len(prefix)) for d, p in db])
            )
        for tok in sorted(item_docs):
            sup = len(item_docs[tok])
            if sup >= min_docs:
                next_db = [
                    (d, p + 1) for d, p in by_token[tok] if p + 1 < len(docs[d])
                ]
                if next_db:
                    stack.append((prefix + [tok], next_db, sup))
    return results


def canonical_rows(
    phrases: list[Phrase], doc_names: list[str] | None = None
) -> list[tuple[str, int, int, tuple[str, ...]]]:
    """Deterministic projection of a result set, used by all golden tests:
    rows (phrase, freq, length, example_docs<=2 sorted), sorted by
    (-freq*length, -freq, phrase) - the canonicalized analog of the
    reference CSV sink (corpus_miner.cpp:529-561).
    """
    rows = []
    for ph in phrases:
        docs_in = sorted({d for d, _ in ph.occs})
        names = [doc_names[d] if doc_names else str(d) for d in docs_in][:2]
        rows.append((ph.text, ph.support, len(ph.tokens), tuple(names)))
    rows.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return rows
