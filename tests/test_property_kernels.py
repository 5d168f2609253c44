"""Property-based tests (hypothesis) over the pure kernels:

  * vectorized strip == pure-Python golden strip, for ARBITRARY unicode texts
    and arbitrary phrase sets (the adversarial inputs hand-written cases miss:
    overlaps, repeats, phrase == whole doc, punctuation-only docs);
  * strip invariants: output is a subsequence of the input, removed spans are
    disjoint ascending, splicing the spans back reconstructs the input;
  * tokenizer: tokens contain no delimiters, concatenating spans reproduces
    the token text, ASCII lowering only.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from boilerplate_buster_spark.core.extract import index_phrases, strip_boilerplate
from boilerplate_buster_spark.core.extract_vec import strip_batch
from boilerplate_buster_spark.core.tokenize import tokenize, tokenize_with_spans

# small vocab -> dense overlaps between docs and phrases
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "Aa", "x1", "日本"])
_sep = st.sampled_from([" ", "  ", ", ", "\n", "! ", " - "])


@st.composite
def doc_text(draw):
    n = draw(st.integers(0, 25))
    words = [draw(_word) for _ in range(n)]
    seps = [draw(_sep) for _ in range(max(n - 1, 0))]
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i < len(seps):
            out.append(seps[i])
    return "".join(out)


@st.composite
def phrase(draw):
    n = draw(st.integers(1, 4))
    return " ".join(draw(_word).lower() for _ in range(n))


@given(
    texts=st.lists(doc_text(), min_size=1, max_size=8),
    phrases=st.lists(phrase(), min_size=0, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_vectorized_strip_equals_golden(texts, phrases):
    by_len = index_phrases(phrases)
    got_t, got_s = strip_batch(texts, by_len)
    for t, gt, gs in zip(texts, got_t, got_s):
        wt, ws = strip_boilerplate(t, by_len)
        assert gt == wt
        assert gs == ws


@given(text=doc_text(), phrases=st.lists(phrase(), min_size=0, max_size=6))
@settings(max_examples=200, deadline=None)
def test_strip_invariants(text, phrases):
    out, spans = strip_boilerplate(text, index_phrases(phrases))
    # spans are disjoint, ascending, in-bounds
    prev_end = -1
    for s, e, _ in spans:
        assert 0 <= s < e <= len(text)
        assert s > prev_end
        prev_end = e
    # splicing removed spans back reconstructs the original byte-exactly
    rebuilt, cursor, oi = [], 0, 0
    for s, e, _ in spans:
        rebuilt.append(out[oi : oi + (s - cursor)])
        oi += s - cursor
        rebuilt.append(text[s:e])
        cursor = e
    rebuilt.append(out[oi:])
    assert "".join(rebuilt) == text


@given(text=st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenizer_spans_consistent(text):
    spans = tokenize_with_spans(text)
    assert [t for t, _, _ in spans] == tokenize(text)
    prev_end = -1
    for tok, s, e in spans:
        assert s > prev_end and s < e <= len(text)
        # span text ASCII-lowered equals the token
        raw = text[s:e]
        assert raw.translate({ord(c): ord(c) + 32 for c in
                              "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}) == tok
        # tokens never contain ASCII delimiters
        assert all(ch > "\x7f" or ch.isalnum() for ch in tok)
        prev_end = e
