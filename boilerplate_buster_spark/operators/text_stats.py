"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, n-gram-heuristic language ID, rolling-hash
document fingerprinting.  All pure Catalyst expressions (JVM-side); every one
has a DuckDB-oracle twin in __spark_entry__.py.

Cross-engine determinism trick used throughout this package: the portable
60-bit hash  H(x) = int(md5(x)[:15 hex], 16)  - identical in Spark
(conv(substr(md5(x),1,15),16,10)) and DuckDB (('0x'||substr(md5(x),1,15))::BIGINT),
always positive (< 2^60), so oracle value-hashes match bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the portable 60-bit md5 hash, Spark dialect
def h60(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) AS bigint)"


STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "que", "y", "en", "un", "ser", "se", "no", "los"],
    "fr": ["le", "la", "et", "un", "que", "pour", "dans", "ce", "une", "sur"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie priority

_FP_MOD = 1 << 40  # rolling-hash modulus: acc*31 + h stays far below 2^63


def _ratio(tokens: str, words: list[str]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return (
        f"(cast(size(filter({tokens}, x -> x IN ({lit}))) AS double) "
        f"/ greatest(size({tokens}), 1))"
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, n_tokens, n_unique, avg_token_len) - token counting op."""
    return docs.select(
        F.col(id_col),
        F.expr(f"size({tokens_col})").alias("n_tokens"),
        F.expr(f"size(array_distinct({tokens_col}))").alias("n_unique"),
        F.expr(
            f"round(cast(length(array_join({tokens_col}, '')) AS double) "
            f"/ greatest(size({tokens_col}), 1), 4)"
        ).alias("avg_token_len"),
    )


def clean_corpus(
    docs: DataFrame,
    min_quality_e6: int = 0,
    langs: tuple[str, ...] = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(doc_id, lang_pred, quality_e6): the composed training-data cleaning
    pass - exact-dedup survivors (min-id per md5 fingerprint) restricted to
    the wanted languages and a minimum quality score.

    Plan shape: one fingerprint groupBy (the dedup shuffle) + one doc_id
    join back; language and quality are pure per-row expressions computed in
    ONE projection and filtered BEFORE the join, so the join's probe side
    carries only already-clean rows."""
    # local import: dedup imports text_stats (h60), so module level would cycle
    from boilerplate_buster_spark.operators.dedup import exact_dedup_groups

    survivors = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    lang_set = ", ".join(f"'{l}'" for l in langs)
    case, _ = _langid_case_expr(tokens_col)
    scored = docs.select(
        F.col(id_col),
        F.expr(case).alias("lang_pred"),
        F.expr(_quality_expr(tokens_col)).alias("quality_e6"),
    )
    return (
        scored.filter(F.expr(f"lang_pred IN ({lang_set})"))
        .filter(F.col("quality_e6") >= min_quality_e6)
        .join(survivors, id_col)
        .select(id_col, "lang_pred", "quality_e6")
    )


# BPE-ish pre-tokenization pattern (GPT-2-style coarse classes, simplified
# to the regex subset Java regex and RE2/DuckDB interpret identically):
# letter runs | single digits | single non-space punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bpeish, n_ws): BPE-ish regex token count next to the plain
    whitespace count - the LLM-pipeline 'how many tokens is this doc' op
    (exact BPE needs a merges table; the regex pre-tokenizer upper-bounds it
    and is JVM-vectorizable)."""
    pat = BPE_PATTERN.replace("\\", "\\\\")
    return docs.select(
        F.col(id_col),
        F.expr(f"size(regexp_extract_all({text_col}, '{pat}', 0))").alias("n_bpeish"),
        F.expr(
            f"size(filter(split(trim({text_col}), '\\\\s+'), t -> t != ''))"
        ).alias("n_ws"),
    )


def _langid_case_expr(tokens_col: str) -> tuple[str, str]:
    """-> (lang CASE expr, best-ratio expr) over per-lang stopword ratios."""
    ratios = {l: _ratio(tokens_col, w) for l, w in STOPWORDS.items()}
    best = " , ".join(ratios[l] for l in _LANG_ORDER)
    case = "CASE "
    for l in _LANG_ORDER:
        others = " AND ".join(
            f"{ratios[l]} >= {ratios[o]}" for o in _LANG_ORDER if o != l
        )
        case += f"WHEN {others} THEN '{l}' "
    case += "ELSE 'und' END"
    return case, f"round(greatest({best}), 4)"


def _quality_expr(tokens_col: str) -> str:
    t = tokens_col
    lit = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return (
        f"(400000 * size(filter({t}, x -> x IN ({lit})))"
        f" + 300000 * size(array_distinct({t}))) DIV greatest(size({t}), 1)"
        f" + 3000 * least(size({t}), 100)"
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Stopword-hit-rate language ID (n-gram heuristic): argmax over per-lang
    stopword ratios, deterministic tie order en>de>es>fr>zh."""
    case, best = _langid_case_expr(tokens_col)
    return docs.select(
        F.col(id_col),
        F.expr(case).alias("lang_pred"),
        F.expr(best).alias("lang_score"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Composite quality in MILLIONTHS (exact integer arithmetic):
      quality_e6 = floor((400000*n_stopwords + 300000*n_unique) / n_tokens)
                   + 3000 * min(n_tokens, 100)
    i.e. 0.4*en-stopword-ratio + 0.3*unique-ratio + 0.3*min(n/100, 1), scaled
    by 1e6.  Integer math because double `round()` semantics differ between
    Spark (shortest-decimal HALF_UP) and other engines at .5 boundaries."""
    return docs.select(
        F.col(id_col), F.expr(_quality_expr(tokens_col)).alias("quality_e6")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (mod 2^40):
    fp = fold(tokens, 0, (acc, t) -> (acc*31 + H(t) % 2^40) % 2^40)."""
    return docs.select(
        F.col(id_col),
        F.expr(
            f"aggregate(transform({tokens_col}, x -> pmod({h60('x')}, {_FP_MOD})), "
            f"cast(0 AS bigint), (acc, h) -> pmod(acc * 31 + h, {_FP_MOD}))"
        ).alias("fp"),
    )


# unicode punctuation folding: curly quotes/apostrophes -> ASCII, en/em
# dash -> '-', NBSP -> space, ellipsis -> '.', ideographic space -> space.
# Single-codepoint maps only (translate's contract in Spark AND DuckDB).
PUNCT_SRC = "‘’‚“”„–— …　"
PUNCT_DST = "'''" + '"""' + "-- . "
assert len(PUNCT_SRC) == len(PUNCT_DST) == 11


def fold_punct_expr(col: str, dialect: str = "spark") -> str:
    """SQL expr folding common unicode punctuation to ASCII - the
    normalization pass dedup shingling runs BEFORE hashing, so typographic
    variants of one sentence collide (CCNet/FineWeb normalize-then-hash
    posture).  translate() is a single codegen pass with identical
    positional-codepoint-map semantics in Spark and DuckDB; only the
    string-literal quote escaping differs per dialect."""
    esc = "''" if dialect == "duckdb" else "\\'"
    src = PUNCT_SRC.replace("'", esc)
    dst = PUNCT_DST.replace("'", esc)
    return f"translate({col}, '{src}', '{dst}')"


def fold_punctuation(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, folded): unicode-punctuation-normalized text."""
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        F.expr(fold_punct_expr(text_col)).alias("folded"),
    )


def extraction_eval(
    pairs: DataFrame,
    id_col: str = "doc_id",
    ext_col: str = "extracted",
    gold_col: str = "gold",
) -> DataFrame:
    """(id, n_ext, n_gold, n_common, p_e6, r_e6, f1_e6): token-multiset
    precision/recall/F1 of an extraction against gold text - the metric
    main-content-extraction papers (Boilerpipe, jusText, Trafilatura
    evals) score on, here as a distributed operator so a 10^12-page
    extraction can be scored against a labeled sample in one job.

    n_common is the MULTISET intersection: per (doc, token) the min of the
    two occurrence counts, summed.  Integer e6 surfaces (exact //
    arithmetic) so a SQL oracle can pin every value.

    Round-7 shape: both texts live on the SAME row, so the counters are a
    pure map - one Arrow-batched Counter intersection per row, ZERO
    shuffles.  The round-6 shape exploded both columns into corpus-wide
    (id, token) hash aggregates plus a join (three exchanges; measured
    3.8 s at 20k pages vs ~1 s for the map).  Per-row == the previous
    per-id aggregation whenever ids are unique, which the operator
    already required (totals were per-ROW while counters aggregated per
    id, so duplicate ids produced incoherent joins before)."""
    import pandas as pd
    from collections import Counter

    id_type = pairs.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            n_ext, n_gold, n_common = [], [], []
            for e, g in zip(pdf[ext_col], pdf[gold_col]):
                et = [t for t in e.split(" ") if t] if e is not None else None
                gt = [t for t in g.split(" ") if t] if g is not None else None
                n_ext.append(len(et) if et is not None else None)
                n_gold.append(len(gt) if gt is not None else None)
                if et is None or gt is None:
                    n_common.append(0)
                else:
                    n_common.append(sum((Counter(et) & Counter(gt)).values()))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_ext": pd.array(n_ext, dtype="Int64"),
                    "n_gold": pd.array(n_gold, dtype="Int64"),
                    "n_common": pd.array(n_common, dtype="Int64"),
                }
            )

    counted = pairs.select(id_col, ext_col, gold_col).mapInPandas(
        run, f"{id_col} {id_type}, n_ext long, n_gold long, n_common long"
    )
    return counted.select(
        id_col,
        "n_ext",
        "n_gold",
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        F.expr(
            "CAST(1000000 * coalesce(n_common, 0) div greatest(n_ext, 1) "
            "AS bigint)"
        ).alias("p_e6"),
        F.expr(
            "CAST(1000000 * coalesce(n_common, 0) div greatest(n_gold, 1) "
            "AS bigint)"
        ).alias("r_e6"),
        F.expr(
            "CAST(2000000 * coalesce(n_common, 0) "
            "div greatest(n_ext + n_gold, 1) AS bigint)"
        ).alias("f1_e6"),
    )


def split_sentences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sent_idx, sentence, n_words): rule-based sentence
    segmentation - split after a terminator run ([.!?]+) followed by a
    space (the terminator stays with its sentence; the final sentence
    needs no trailing space).  Pure map + posexplode, linear output, no
    shuffle.  The rule is regex-class-only so Java regex and RE2 agree
    (abbreviation handling like 'e.g. ' is out of scope - documented;
    real segmenters are dictionary-driven, which is data, not algorithm)."""
    marked = f"regexp_replace({text_col}, '([.!?]+) ', '$1\\u0001')"
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(F.expr(f"split({marked}, '\\u0001')")).alias(
                "sent_idx", "sentence"
            ),
        )
        .select(
            id_col,
            F.col("sent_idx").cast("long").alias("sent_idx"),
            "sentence",
            F.expr(
                "size(filter(split(sentence, ' '), x -> x != ''))"
            ).cast("long").alias("n_words"),
        )
    )


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, fre_e3): Flesch
    reading-ease on an integer surface,

        fre_e3 = 206835 - (1015 * W) div S - (84600 * Syl) div W

    with W = space-separated words, S = terminator runs ([.!?]+, min 1),
    Syl = vowel-group count ([aeiouy]+ on the lowercased text - the
    standard cheap syllable proxy).  Exact integer arithmetic (div, not
    floats), so a SQL oracle matches bit-for-bit; the e3 surface ranks
    identically to the float formula for filtering.  Pure map."""
    t = text_col
    return docs.select(
        F.col(id_col),
        F.expr(f"size(filter(split({t}, ' '), x -> x != ''))")
        .cast("long").alias("n_words"),
        F.expr(f"greatest(size(regexp_extract_all({t}, '[.!?]+', 0)), 1)")
        .cast("long").alias("n_sentences"),
        F.expr(f"size(regexp_extract_all(lower({t}), '[aeiouy]+', 0))")
        .cast("long").alias("n_syllables"),
    ).withColumn(
        "fre_e3",
        F.expr(
            "206835 - (1015 * n_words) div greatest(n_sentences, 1) "
            "- (84600 * n_syllables) div greatest(n_words, 1)"
        ).cast("long"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, pos, fp): winnowing document fingerprints (Schleimer et al.
    2003, the MOSS algorithm): hash every k-token gram, slide a window of
    ``w`` consecutive gram hashes, keep the minimum of each window
    (rightmost position on hash ties - the robust-winnowing choice),
    dedup.  Guarantees every match of length >= w + k - 1 tokens shares
    a fingerprint, with ~2/(w+1) selection density.  (The paper's
    'prefer the previous window's pick' tie rule is stateful; rightmost-
    min is the standard stateless variant and is what we pin.)

    Pure map + explode over the scan: gram hashes, window argmins and
    the dedup all happen inside one projection (no shuffle).  Hashes are
    the portable 60-bit md5, so the SQL oracle reproduces fingerprints
    bit-for-bit.  Documents with fewer than k + w - 1 tokens emit no
    rows (no full window exists)."""
    t = tokens_col
    ng = f"(size({t}) - {k} + 1)"  # gram count
    gram_h = h60(f"array_join(slice({t}, i, {k}), ' ')")
    hs = (
        f"transform(slice(sequence(1, greatest({ng}, 1)), 1, "
        f"greatest({ng}, 0)), i -> {gram_h})"
    )
    nw = f"(size(hs) - {w} + 1)"  # window count
    # per window j (1-based): min struct(hash, -pos) = (min hash,
    # rightmost pos among ties); pos is the 0-based gram position
    sel = (
        f"array_distinct(transform(slice(sequence(1, greatest({nw}, 1)), 1, "
        f"greatest({nw}, 0)), j -> array_min(transform(sequence(0, {w - 1}), "
        f"o -> struct(element_at(hs, j + o) AS h, -(j + o - 1) AS np)))))"
    )
    return (
        docs.select(F.col(id_col), F.expr(hs).alias("hs"))
        .select(id_col, F.explode(F.expr(sel)).alias("s"))
        .select(
            id_col,
            (-F.col("s.np")).cast("long").alias("pos"),
            F.col("s.h").alias("fp"),
        )
    )


# whitespace-normalization targets: C0 controls + DEL + unicode space /
# format variants (NBSP, ogham, en/em spaces + zero-width block, line and
# para separators, narrow/medium spaces, ideographic space, BOM)
_WS_RANGES = [
    (0x0000, 0x001F), (0x007F, 0x007F), (0x00A0, 0x00A0),
    (0x1680, 0x1680), (0x2000, 0x200F), (0x2028, 0x2029),
    (0x202F, 0x202F), (0x205F, 0x205F), (0x3000, 0x3000),
    (0xFEFF, 0xFEFF),
]


def normalize_ws_expr(col: str, dialect: str = "spark") -> str:
    """SQL expr for whitespace normalization: the target chars become
    ASCII spaces, runs collapse to one space, ends trimmed.  The
    canonical pre-tokenization cleanup every pipeline runs after HTML
    stripping.  (Zero-width chars fold to a space and collapse rather
    than vanish - a delete would need a second pass; convention mirrored
    by the oracle.)

    The char class is RENDERED PER DIALECT from one codepoint list:
    Spark's SQL string literal interprets \\uXXXX escapes itself (and
    does NOT know \\x - a '\\x00' literal silently becomes the chars
    'x00' and the class matches letters); DuckDB string literals pass
    backslashes through to RE2, which wants \\x{XXXX}."""

    def esc(cp: int) -> str:
        if dialect == "duckdb":
            return f"\\x{{{cp:04x}}}"
        return f"\\u{cp:04x}"

    cls = "[" + "".join(
        esc(lo) + ("-" + esc(hi) if hi > lo else "")
        for lo, hi in _WS_RANGES
    ) + "]"
    if dialect == "duckdb":
        e = f"regexp_replace({col}, '{cls}', ' ', 'g')"
        e = f"regexp_replace({e}, '  +', ' ', 'g')"
    else:
        e = f"regexp_replace({col}, '{cls}', ' ')"
        e = f"regexp_replace({e}, '  +', ' ')"
    return f"trim({e})"


def normalize_whitespace(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_removed_chars): whitespace/control-char
    normalized text.  Pure map; the chain is computed once (two-step
    select shares the alias)."""
    step = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_n0"),
        F.expr(normalize_ws_expr(text_col)).alias("clean_text"),
    )
    return step.select(
        id_col,
        "clean_text",
        (F.col("_n0") - F.length("clean_text")).cast("long").alias(
            "n_removed_chars"
        ),
    )


def decode_entities(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, decoded_text, n_entities): HTML entity decoding with the
    REAL full table (python stdlib html.unescape - all 2000+ named
    entities plus decimal/hex numeric character references),
    Arrow-batched pure map.  n_entities counts the '&'-lead candidates
    that actually decoded (a length delta is not a count - entities have
    varying widths).  The standard post-HTML-strip stage: stripped text
    still carries &amp; &#233; etc."""
    import html as _html
    import re as _re

    import pandas as pd

    cand = _re.compile(
        r"&[A-Za-z][A-Za-z0-9]*;|&#[0-9]+;|&#[xX][0-9A-Fa-f]+;"
    )

    def run(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            decoded = [_html.unescape(t) for t in texts]
            n_ent = [
                sum(
                    1
                    for m in cand.finditer(t)
                    if _html.unescape(m.group(0)) != m.group(0)
                )
                for t in texts
            ]
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "decoded_text": decoded,
                    "n_entities": pd.Series(n_ent, dtype="int64"),
                }
            )

    id_type = dict(docs.dtypes)[id_col]
    out = docs.select(id_col, text_col).mapInPandas(
        run, f"_id {id_type}, decoded_text string, n_entities long"
    )
    return out.withColumnRenamed("_id", id_col)


# Unicode script ranges for the script-mix signal (BMP core blocks only —
# the dominant blocks per script; supplementary planes would need surrogate
# handling in Java regex and are out of the honest subset)
_SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A)),
    "cyrillic": ((0x400, 0x4FF),),
    "greek": ((0x370, 0x3FF),),
    "arabic": ((0x600, 0x6FF),),
    "cjk": ((0x3040, 0x30FF), (0x4E00, 0x9FFF)),  # kana + unified han
}
_SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic", "cjk")


def script_mix_exprs(text_col: str, dialect: str = "spark") -> list[tuple[str, str]]:
    """Ordered (column, expr) pairs for the Unicode script-mix signal:
    per-script character fractions (millionths of non-whitespace chars)
    plus the deterministic-argmax dominant script — the CCNet-style
    script/language consistency check that catches mislabeled and
    transliterated pages before language-ID runs.

    Char classes are RENDERED PER DIALECT from one codepoint table
    (Spark SQL literals interpret \\uXXXX; DuckDB passes backslashes to
    RE2, which wants \\x{XXXX}) — the normalize_ws_expr convention."""

    def esc(cp: int) -> str:
        if dialect == "duckdb":
            return f"\\x{{{cp:04x}}}"
        return f"\\u{cp:04x}"

    def cls(ranges: tuple[tuple[int, int], ...]) -> str:
        return "[" + "".join(
            esc(lo) + ("-" + esc(hi) if hi > lo else "") for lo, hi in ranges
        ) + "]"

    def n_in(ranges) -> str:
        if dialect == "duckdb":
            rep = f"regexp_replace({text_col}, '{cls(ranges)}', '', 'g')"
        else:
            rep = f"regexp_replace({text_col}, '{cls(ranges)}', '')"
        return f"(length({text_col}) - length({rep}))"

    div = "//" if dialect == "duckdb" else "div"
    nl = "chr(10)" if dialect == "duckdb" else "'\\n'"
    n_chars = f"length(replace(replace({text_col}, {nl}, ''), ' ', ''))"
    counts = {s: n_in(_SCRIPT_RANGES[s]) for s in _SCRIPT_ORDER}
    g1 = f"greatest({n_chars}, 1)"
    cols: list[tuple[str, str]] = [
        ("n_chars", f"CAST({n_chars} AS BIGINT)"),
    ]
    for s in _SCRIPT_ORDER:
        cols.append((f"{s}_frac_e6", f"(1000000 * {counts[s]}) {div} {g1}"))
    # deterministic argmax: first script (in _SCRIPT_ORDER) whose count is
    # >= every other script's count; 'other' when no script char exists
    case = "CASE "
    for s in _SCRIPT_ORDER:
        ge = " AND ".join(
            f"{counts[s]} >= {counts[o]}" for o in _SCRIPT_ORDER if o != s
        )
        case += f"WHEN {counts[s]} > 0 AND {ge} THEN '{s}' "
    case += "ELSE 'other' END"
    cols.append(("dominant_script", case))
    return cols


def script_mix(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, <script>_frac_e6 x5, dominant_script): pure-expression
    script-mix projection — no shuffle, no UDF; scan-speed at 100 TB."""
    return docs.select(
        F.col(id_col),
        *[F.expr(e).alias(n) for n, e in script_mix_exprs(text_col, "spark")],
    )


def topic_boundaries(
    docs: DataFrame,
    block: int = 10,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, gap_idx, n_shared, jaccard_e6): TextTiling-style topic-shift
    signal (Hearst 1997) - tokens split into fixed `block`-token tiles;
    for each adjacent tile pair, the DISTINCT-token overlap count and
    exact integer Jaccard.  Low-similarity gaps mark topic boundaries;
    thresholding stays caller-side (corpora differ).  gap_idx = i means
    the gap between tiles i-1 and i (1-based tiles).

    A PURE PROJECTION + explode - all the information is within one row,
    zero shuffles, same posture as dedup_lines_in_doc."""
    t, b = tokens_col, int(block)
    nb = f"((size({t}) + {b} - 1) div {b})"
    left = f"array_distinct(slice({t}, (j - 1) * {b} + 1, {b}))"
    right = f"array_distinct(slice({t}, j * {b} + 1, {b}))"
    gaps = (
        f"transform(slice(sequence(1, greatest({nb} - 1, 1)), 1, "
        f"greatest({nb} - 1, 0)), j -> named_struct("
        f"'gap_idx', j, "
        f"'n_shared', size(array_intersect({left}, {right})), "
        f"'jaccard_e6', (1000000 * size(array_intersect({left}, {right}))) "
        f"div greatest(size(array_union({left}, {right})), 1)))"
    )
    return docs.select(
        F.col(id_col), F.explode(F.expr(gaps)).alias("g")
    ).select(
        id_col,
        F.col("g.gap_idx").cast("int").alias("gap_idx"),
        F.col("g.n_shared").cast("long").alias("n_shared"),
        F.col("g.jaccard_e6").cast("long").alias("jaccard_e6"),
    )
