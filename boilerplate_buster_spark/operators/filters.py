"""Document-level heuristic quality filter suites: Gopher (Rae et al. 2021,
"Scaling Language Models: ... Gopher", table A1) and C4 (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", section 2.2) — the two canonical
rule sets every web-scale LLM curation pipeline runs between extraction and
dedup.  The reference engine is a phrase miner with no quality stage
(corpus_miner.cpp has no analog); these come from the builder brief's
training-data-pipeline bar.

Design: every rule is ONE integer-exact SQL expression rendered per dialect
("spark" / "duckdb") from a single generator, so the Spark operator and the
DuckDB oracle share their definition verbatim — equality between the two
engines proves the arithmetic, not just the row shape.  All fractions are
millionths under integer `div` (doubles round differently across engines);
all per-line / per-word scans are higher-order array functions over ONE
split, so the whole suite is a pure Catalyst map: no shuffle, no UDF, no
Python on the hot path — at 100 TB these filters are scan-speed.

Conventions (documented, mirrored by the oracle):
  * words  = text with newlines folded to spaces, split on single spaces,
    empties dropped (runs of spaces yield no empty words).
  * lines  = text split on '\n'; blank/whitespace-only lines are dropped
    for the line-fraction rules (a trailing newline is not a bullet line).
  * '...' counting is non-overlapping left-to-right (both engines'
    replace()); the unicode ellipsis is counted separately.
  * C4's "word on a bad-word list" check is space-boundary containment
    over the newline-folded lowercase text (punctuation-adjacent matches
    are missed; the standard token-boundary refinement would tokenize
    first — convention chosen so the rule stays one pure expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher's required-stopword list (Rae et al. A1.1: "contains at least two
# of the following English words: the, be, to, of, and, that, have, with")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Gopher document-level thresholds (fractions in millionths)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_E6 = 3_000_000
GOPHER_MAX_MEAN_WORD_LEN_E6 = 10_000_000
GOPHER_MAX_SYMBOL_RATIO_E6 = 100_000
GOPHER_MAX_BULLET_FRAC_E6 = 900_000
GOPHER_MAX_ELLIPSIS_FRAC_E6 = 300_000
GOPHER_MIN_ALPHA_FRAC_E6 = 800_000
GOPHER_MIN_STOPWORD_TYPES = 2

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _dial(dialect: str) -> dict[str, str]:
    if dialect == "duckdb":
        return dict(
            size="len", flt="list_filter", split="string_split",
            nl="chr(10)", div="//", join="array_to_string",
            has="list_contains",
        )
    if dialect == "spark":
        return dict(
            size="size", flt="filter", split="split",
            nl="'\\n'", div="div", join="array_join",
            has="array_contains",
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def _sql_lit(s: str, dialect: str) -> str:
    """SQL string literal holding `s` verbatim, per dialect: DuckDB doubles
    quotes (backslash is literal there); Spark backslash-escapes both.
    Caller-supplied strings (badword lists, mask tokens) MUST pass through
    here - an apostrophe in a blocklist word is common real-world input."""
    if dialect == "duckdb":
        return "'" + s.replace("'", "''") + "'"
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _rx(dialect: str, operand: str, pattern: str) -> str:
    if dialect == "duckdb":
        return f"regexp_matches({operand}, '{pattern}')"
    return f"{operand} rlike '{pattern}'"


def _count_str(text: str, needle: str) -> str:
    """occurrences of `needle` in `text` (non-overlapping), as an expr."""
    return (
        f"((length({text}) - length(replace({text}, '{needle}', '')))"
        f" / {len(needle)})"
    )


def gopher_exprs(
    text_col: str,
    dialect: str = "spark",
    min_words: int = GOPHER_MIN_WORDS,
    min_stopword_types: int = GOPHER_MIN_STOPWORD_TYPES,
) -> list[tuple[str, str]]:
    """Ordered (column, expr) pairs for the Gopher document-filter suite.
    The same generator renders the Spark plan and the DuckDB oracle.
    `min_words` and `min_stopword_types` are overridable because they are
    the two corpus-shape knobs (Gopher's 50 words / 2 stopword types assume
    full English web pages; chunked or synthetic corpora run shorter and
    narrower) - the fraction thresholds stay fixed."""
    d = _dial(dialect)
    t = text_col
    flat = f"replace({t}, {d['nl']}, ' ')"
    words = f"{d['flt']}({d['split']}({flat}, ' '), x -> x <> '')"
    lines = f"{d['flt']}({d['split']}({t}, {d['nl']}), x -> trim(x) <> '')"
    n_words = f"{d['size']}({words})"
    n_lines = f"{d['size']}({lines})"
    # all-word character mass: every space/newline removed
    word_chars = f"length(replace({flat}, ' ', ''))"
    n_symbols = (
        f"({_count_str(t, '#')} + {_count_str(t, '...')} + {_count_str(t, '…')})"
    )
    bullet_lines = (
        f"{d['size']}({d['flt']}({lines}, "
        f"x -> left(ltrim(x), 1) IN ('-', '*', '•')))"
    )
    ellipsis_lines = (
        f"{d['size']}({d['flt']}({lines}, "
        f"x -> right(rtrim(x), 3) = '...' OR right(rtrim(x), 1) = '…'))"
    )
    alpha_words = (
        f"{d['size']}({d['flt']}({words}, x -> {_rx(dialect, 'x', '[a-zA-Z]')}))"
    )
    stop_lit = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    stop_arr = f"[{stop_lit}]" if dialect == "duckdb" else f"array({stop_lit})"
    stop_types = (
        f"{d['size']}({d['flt']}({stop_arr}, s -> {d['has']}({words}, s)))"
    )
    g1 = f"greatest({n_words}, 1)"
    cols = [
        ("n_words", f"CAST({n_words} AS BIGINT)"),
        ("mean_word_len_e6", f"(1000000 * {word_chars}) {d['div']} {g1}"),
        ("symbol_ratio_e6",
         f"CAST(1000000 * {n_symbols} AS BIGINT) {d['div']} {g1}"),
        ("bullet_frac_e6",
         f"(1000000 * {bullet_lines}) {d['div']} greatest({n_lines}, 1)"),
        ("ellipsis_frac_e6",
         f"(1000000 * {ellipsis_lines}) {d['div']} greatest({n_lines}, 1)"),
        ("alpha_frac_e6", f"(1000000 * {alpha_words}) {d['div']} {g1}"),
        ("stopword_types", f"CAST({stop_types} AS BIGINT)"),
    ]
    by = dict(cols)
    keep = (
        f"({by['n_words']} BETWEEN {min_words} AND {GOPHER_MAX_WORDS})"
        f" AND ({by['mean_word_len_e6']} BETWEEN"
        f" {GOPHER_MIN_MEAN_WORD_LEN_E6} AND {GOPHER_MAX_MEAN_WORD_LEN_E6})"
        f" AND ({by['symbol_ratio_e6']} <= {GOPHER_MAX_SYMBOL_RATIO_E6})"
        f" AND ({by['bullet_frac_e6']} <= {GOPHER_MAX_BULLET_FRAC_E6})"
        f" AND ({by['ellipsis_frac_e6']} <= {GOPHER_MAX_ELLIPSIS_FRAC_E6})"
        f" AND ({by['alpha_frac_e6']} >= {GOPHER_MIN_ALPHA_FRAC_E6})"
        f" AND ({by['stopword_types']} >= {min_stopword_types})"
    )
    return cols + [("keep", keep)]


def c4_exprs(
    text_col: str,
    badwords: tuple[str, ...] = (),
    dialect: str = "spark",
) -> list[tuple[str, str]]:
    """Ordered (column, expr) pairs for the C4 cleaning suite: line-level
    retention (terminal punctuation + >= 5 words + no 'javascript') plus the
    page-level drop rules (braces, 'lorem ipsum', bad words, >= 3 sentences).
    `kept_md5` pins the retained text byte-exactly across engines."""
    d = _dial(dialect)
    t = text_col
    lines = f"{d['split']}({t}, {d['nl']})"
    wc = f"{d['size']}({d['flt']}({d['split']}(trim(x), ' '), y -> y <> ''))"
    kept = (
        f"{d['flt']}({lines}, x -> "
        f"right(rtrim(x), 1) IN ('.', '!', '?', '\"')"
        f" AND {wc} >= {C4_MIN_LINE_WORDS}"
        f" AND NOT contains(lower(x), 'javascript'))"
    )
    kept_text = f"{d['join']}({kept}, {d['nl']})"
    n_sentences = (
        f"CAST({_count_str(kept_text, '.')} + {_count_str(kept_text, '!')}"
        f" + {_count_str(kept_text, '?')} AS BIGINT)"
    )
    padded = f"concat(' ', replace(lower({t}), {d['nl']}, ' '), ' ')"
    if badwords:
        bad_lit = ", ".join(_sql_lit(w, dialect) for w in badwords)
        bad_arr = f"[{bad_lit}]" if dialect == "duckdb" else f"array({bad_lit})"
        has_bad = (
            f"{d['size']}({d['flt']}({bad_arr}, "
            f"s -> contains({padded}, concat(' ', s, ' ')))) > 0"
        )
    else:
        has_bad = "FALSE"
    cols = [
        ("n_lines", f"CAST({d['size']}({lines}) AS BIGINT)"),
        ("n_kept_lines", f"CAST({d['size']}({kept}) AS BIGINT)"),
        ("n_sentences", n_sentences),
        ("has_brace", f"contains({t}, '{{')"),
        ("has_lorem", f"contains(lower({t}), 'lorem ipsum')"),
        ("has_badword", has_bad),
        ("kept_md5", f"md5({kept_text})"),
    ]
    by = dict(cols)
    keep = (
        f"({by['n_sentences']} >= {C4_MIN_SENTENCES})"
        f" AND ({by['n_kept_lines']} >= 1)"
        f" AND NOT ({by['has_brace']})"
        f" AND NOT ({by['has_lorem']})"
        f" AND NOT ({by['has_badword']})"
    )
    return cols + [("keep", keep)]


def gopher_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    min_stopword_types: int = GOPHER_MIN_STOPWORD_TYPES,
) -> DataFrame:
    """(id, n_words, mean_word_len_e6, symbol_ratio_e6, bullet_frac_e6,
    ellipsis_frac_e6, alpha_frac_e6, stopword_types, keep): the Gopher
    document-level quality rules as one pure-expression projection.
    Repetition rules (dup-line / top-n-gram fractions) live in
    `lines.repetition_signals` — Gopher's table splits the same way."""
    return docs.select(
        F.col(id_col),
        *[
            F.expr(e).alias(n)
            for n, e in gopher_exprs(
                text_col, "spark", min_words, min_stopword_types
            )
        ],
    )


def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """(id, n_lines, n_kept_lines, n_sentences, has_brace, has_lorem,
    has_badword, kept_md5, keep): C4 line-level cleaning + page drop rules
    as one pure-expression projection (no shuffle, no UDF)."""
    return docs.select(
        F.col(id_col),
        *[F.expr(e).alias(n) for n, e in c4_exprs(text_col, badwords, "spark")],
    )


CODE_KEYWORDS = [
    "def", "return", "class", "function", "var", "const", "import",
]
CODE_SCORE_MIN_E6 = 100_000  # 10% code-marker density


def code_exprs(text_col: str, dialect: str = "spark") -> list[tuple[str, str]]:
    """Ordered (column, expr) pairs for code-vs-prose detection - the
    RedPajama/StarCoder-style signal family that keeps source code out of
    (or routes it into) a text corpus: brace/semicolon/assignment counts,
    code-keyword token hits, and an integer density score.  The same
    generator renders the Spark plan and the DuckDB oracle (the
    gopher_exprs pattern)."""
    d = _dial(dialect)
    t = text_col

    def cc(ch: str) -> str:
        # single-char occurrence count: a pure length difference, integer
        # in both engines (_count_str's needle-length division is a
        # float in Spark - unusable inside the integer score)
        return f"(length({t}) - length(replace({t}, '{ch}', '')))"

    flat = f"replace({t}, {d['nl']}, ' ')"
    words = f"{d['flt']}({d['split']}({flat}, ' '), x -> x <> '')"
    n_words = f"{d['size']}({words})"
    n_braces = f"({cc('{')} + {cc('}')})"
    n_semis = cc(";")
    n_equals = cc("=")
    kws = ", ".join(f"'{w}'" for w in CODE_KEYWORDS)
    kw_hits = f"{d['size']}({d['flt']}({words}, x -> x IN ({kws})))"
    score = (
        f"(1000000 * ({n_braces} + {n_semis} + {kw_hits}))"
        f" {d['div']} greatest({n_words}, 1)"
    )
    return [
        ("n_words", n_words),
        ("n_braces", n_braces),
        ("n_semicolons", n_semis),
        ("n_equals", n_equals),
        ("kw_hits", kw_hits),
        ("code_score_e6", score),
        ("is_code", f"{score} >= {CODE_SCORE_MIN_E6}"),
    ]


def code_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, n_braces, n_semicolons, n_equals, kw_hits,
    code_score_e6, is_code): pure-projection code detection - a single
    scan-stage map, no shuffle, same 100-TB posture as gopher_filters."""
    return docs.select(
        F.col(id_col),
        *[F.expr(e).alias(n) for n, e in code_exprs(text_col, "spark")],
    )
