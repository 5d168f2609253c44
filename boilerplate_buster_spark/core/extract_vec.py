"""Vectorized batch strip kernel: numpy token-id rolling-hash phrase matching.

Semantically identical to the pure-Python kernel in core/extract.py (which
stays as the golden oracle - tests/test_extract_vec.py compares them on random
corpora, and the byte-identical extraction goldens run through THIS path).
The per-batch algorithm:

  1. tokenize every doc (regex, C speed) and flatten the batch into ONE token
     stream with a doc-index array (windows crossing doc boundaries are
     masked out, so one vectorized pass serves the whole Arrow batch);
  2. factorize tokens to int64 ids (pandas C path);
  3. per phrase length L: polynomial rolling hash of every L-window
     (L vectorized multiply-adds over the batch, uint64 wraparound),
     `np.isin` against the phrase hashes, then EXACT id-level verification of
     candidates (hash collisions only cost a compare, never a wrong mark);
  4. marks accumulate in a difference array -> cumsum -> maximal runs;
     char-span splicing per doc is proportional to the number of RUNS.

Replaces the per-row, per-token, per-phrase-length pure-Python loop that
dominated round-1 extraction wall time (the only Python on the hot path is
now the tokenizer regex and the run splicing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from boilerplate_buster_spark.core.tokenize import tokenize_with_spans

_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit multiplier (golden ratio)


def _weights(length: int) -> np.ndarray:
    """Polynomial weights w[k] = MULT^(L-1-k) mod 2^64.

    Computed with Python ints reduced mod 2^64: numpy uint64 SCALAR
    multiplies wrap correctly but emit a RuntimeWarning per overflow, which
    is log noise (and an error under strict warning filters).  Array-side
    wraparound below stays silent by numpy semantics."""
    mult = int(_MULT)
    vals = [0] * length
    acc = 1
    for k in range(length - 1, -1, -1):
        vals[k] = acc
        acc = (acc * mult) & 0xFFFFFFFFFFFFFFFF
    return np.array(vals, dtype=np.uint64)


def _marked_flags(
    ids: np.ndarray,
    doc_idx: np.ndarray,
    by_len: dict[int, set[tuple[str, ...]]],
    vocab: dict[str, int],
) -> np.ndarray:
    """Boolean mark per token in the flattened batch stream (spec step 2)."""
    n = len(ids)
    diff = np.zeros(n + 1, dtype=np.int32)
    u = ids.astype(np.uint64)
    for L, phrase_set in by_len.items():
        if L <= 0 or L > n:
            continue
        rows = []
        for ptoks in phrase_set:
            pid = [vocab.get(t, -1) for t in ptoks]
            if -1 not in pid:  # a phrase word absent from the batch can't match
                rows.append(pid)
        if not rows:
            continue
        pm = np.asarray(rows, dtype=np.int64)  # (P, L)
        w = _weights(L)
        ph = (pm.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64)
        m = n - L + 1
        hwin = np.zeros(m, dtype=np.uint64)
        for k in range(L):
            hwin += u[k : m + k] * w[k]
        valid = doc_idx[:m] == doc_idx[L - 1 : L - 1 + m]
        cand = np.nonzero(valid & np.isin(hwin, ph))[0]
        if cand.size == 0:
            continue
        # exact verification via the hash-sorted phrase matrix
        order = np.argsort(ph, kind="stable")
        ph_s, pm_s = ph[order], pm[order]
        if len(np.unique(ph_s)) != len(ph_s):
            # two distinct phrases hash-collided (~2^-64): per-candidate set check
            pset = {tuple(r) for r in rows}
            ok = np.fromiter(
                (tuple(ids[c : c + L]) in pset for c in cand), bool, cand.size
            )
        else:
            at = np.searchsorted(ph_s, hwin[cand])
            ok = np.ones(cand.size, dtype=bool)
            for k in range(L):
                ok &= ids[cand + k] == pm_s[at, k]
        hit = cand[ok]
        if hit.size:
            np.add.at(diff, hit, 1)
            np.add.at(diff, hit + L, -1)
    return np.cumsum(diff[:n]) > 0


def strip_batch(
    texts: list[str], by_len: dict[int, set[tuple[str, ...]]]
) -> tuple[list[str], list[list[tuple[int, int, str]]]]:
    """Batch twin of core.extract.strip_boilerplate: -> (texts, spans) lists."""
    spans_per_doc = [tokenize_with_spans(t or "") for t in texts]
    counts = np.fromiter((len(s) for s in spans_per_doc), np.int64, len(texts))
    bounds = np.concatenate([[0], np.cumsum(counts)])
    n = int(bounds[-1])
    if n == 0 or not by_len:
        return [t or "" for t in texts], [[] for _ in texts]

    all_tokens = np.empty(n, dtype=object)
    k = 0
    for st in spans_per_doc:
        for tok, _, _ in st:
            all_tokens[k] = tok
            k += 1
    codes, uniques = pd.factorize(all_tokens)
    ids = codes.astype(np.int64)
    vocab = {u: i for i, u in enumerate(uniques)}
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)

    marked = _marked_flags(ids, doc_idx, by_len, vocab)

    out_texts: list[str] = []
    out_spans: list[list[tuple[int, int, str]]] = []
    for d, text in enumerate(texts):
        text = text or ""
        dm = marked[bounds[d] : bounds[d + 1]]
        idx = np.nonzero(dm)[0]
        if idx.size == 0:
            out_texts.append(text)
            out_spans.append([])
            continue
        spans_tok = spans_per_doc[d]
        brk = np.nonzero(np.diff(idx) > 1)[0]
        run_s = np.concatenate([idx[:1], idx[brk + 1]])
        run_e = np.concatenate([idx[brk], idx[-1:]])
        removed = []
        parts = []
        cursor = 0
        for rs, re_ in zip(run_s, run_e):
            s = spans_tok[rs][1]
            e = spans_tok[re_][2]
            removed.append(
                (s, e, " ".join(t for t, _, _ in spans_tok[rs : re_ + 1]))
            )
            parts.append(text[cursor:s])
            cursor = e
        parts.append(text[cursor:])
        out_texts.append("".join(parts))
        out_spans.append(removed)
    return out_texts, out_spans


