"""Phrase-tree post-processing (SURVEY.md section 2.7: T2-T5, P7, P8;
reference: corpus-miner/tree_logic.py, process_results_csv.py).

  * normalize_phrase (P7, tree_logic.py:7-9): lowercase + collapse whitespace
  * viz score (P8, tree_logic.py:84-86):
      sqrt((1 - l/max_l)^2 + (1 - log1p(f)/log1p(max_f))^2)
  * parent linking (T3, tree_logic.py:11-44): for each phrase, the LONGEST
    proper suffix-or-prefix present in the set (suffix preferred at equal
    length, i.e. smaller `drop` first, suffix before prefix); a parent must
    keep >= 2 words (drop < l-1).  Declarative reformulation: self-join on
    generated suffix/prefix candidates, pick min (drop, kind) per child -
    exactly the reference's first-hit scan order.
  * ladder compression + collapsible HTML (T4/T5): driver-side viz over the
    (small) result set, like the reference.

Deviation: phrases are identified by their normalized TEXT (the reference
uses positional ids after an unstable length sort); duplicates collapse."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_phrase(col: str = "phrase") -> F.Column:
    """P7: lower + trim + collapse internal whitespace."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def with_viz_score(df: DataFrame, freq_col: str = "freq", len_col: str = "length") -> DataFrame:
    """P8 ranking score (smaller = more prominent in the viz cap)."""
    mx = df.agg(
        F.max(len_col).alias("max_l"), F.max(freq_col).alias("max_f")
    )
    return df.crossJoin(F.broadcast(mx)).withColumn(
        "score",
        F.expr(
            f"sqrt(pow(1 - {len_col} / max_l, 2) + "
            f"pow(1 - log1p({freq_col}) / log1p(max_f), 2))"
        ),
    ).drop("max_l", "max_f")


def link_parents(phrases: DataFrame, phrase_col: str = "phrase") -> DataFrame:
    """T3 as DataFrame joins: (phrase, parent) with parent = longest proper
    suffix-or-prefix present in the set; NULL when none.

    Candidate generation is per-row (explode over drop = 1..l-2, kind 0 =
    suffix / 1 = prefix); the join against the phrase set is a broadcast
    hash join (result sets are corpus-statistics small); winner per child =
    min (drop, kind)."""
    p = phrases.select(normalize_phrase(phrase_col).alias("phrase")).distinct()
    cand = p.select(
        F.col("phrase").alias("child"),
        F.explode(
            F.expr(
                "transform(slice(sequence(1, greatest(size(split(phrase, ' ')) - 2, 1)), "
                "1, greatest(size(split(phrase, ' ')) - 2, 0)), d -> array("
                "struct(d AS drop, 0 AS kind, "
                "  array_join(slice(split(phrase, ' '), d + 1, size(split(phrase, ' ')) - d), ' ') AS cand),"
                "struct(d AS drop, 1 AS kind, "
                "  array_join(slice(split(phrase, ' '), 1, size(split(phrase, ' ')) - d), ' ') AS cand)))"
            )
        ).alias("pair"),
    ).select("child", F.explode("pair").alias("c")).select(
        "child", "c.drop", "c.kind", "c.cand"
    )
    hits = cand.join(
        F.broadcast(p.withColumnRenamed("phrase", "cand")), "cand"
    )
    best = hits.groupBy("child").agg(
        F.min(F.struct("drop", "kind", "cand")).alias("b")
    )
    return p.join(
        best.select(F.col("child").alias("phrase"), F.col("b.cand").alias("parent")),
        "phrase",
        "left",
    )


def build_tree(rows: list[tuple[str, int, int]]) -> list[dict]:
    """Driver-side exact T3 (+levels) for the viz path: rows of
    (phrase, freq, length) -> node dicts with id/parent_id/level, phrases
    normalized, sorted by (length, phrase) for determinism."""
    import math

    norm = lambda s: " ".join(s.lower().strip().split())
    items = sorted(
        ({"phrase": norm(p), "freq": f, "length": l} for p, f, l in rows),
        key=lambda r: (r["length"], r["phrase"]),
    )
    phrase_to_id = {r["phrase"]: i for i, r in enumerate(items)}
    for i, r in enumerate(items):
        r["id"], r["parent_id"], r["level"] = i, None, 0
        words = r["phrase"].split()
        for drop in range(1, len(words) - 1):
            for candp in (" ".join(words[drop:]), " ".join(words[:-drop])):
                if candp in phrase_to_id and phrase_to_id[candp] != i:
                    pid = phrase_to_id[candp]
                    r["parent_id"] = pid
                    r["level"] = items[pid]["level"] + 1
                    break
            if r["parent_id"] is not None:
                break
    max_l = max((r["length"] for r in items), default=1)
    max_f = max((r["freq"] for r in items), default=1)
    for r in items:
        r["score"] = math.sqrt(
            (1 - r["length"] / max_l) ** 2
            + (1 - math.log1p(r["freq"]) / math.log1p(max_f)) ** 2
        )
    return items


def compress_ladders(nodes: list[dict], parent_phrase: str | None = None) -> list[dict]:
    """T4 (tree_logic.py:46-79): collapse single-child chains; display text
    relative to the parent with a <PARENT> placeholder."""
    out = []
    for node in nodes:
        cur = node
        while len(cur["children"]) == 1:
            cur = cur["children"][0]
        if parent_phrase and parent_phrase in cur["phrase"]:
            disp = cur["phrase"].replace(parent_phrase, " <PARENT> ")
            cur["display_phrase"] = " ".join(disp.split())
        else:
            cur["display_phrase"] = cur["phrase"]
        if cur["children"]:
            cur["children"] = compress_ladders(cur["children"], cur["phrase"])
        out.append(cur)
    return out


def generate_html_tree(rows: list[tuple[str, int, int]], max_nodes: int = 15000) -> str:
    """T5: minimal collapsible HTML tree (top max_nodes by score + ancestor
    closure, tree_logic.py:87-99)."""
    items = build_tree(rows)
    visible = {r["id"] for r in sorted(items, key=lambda r: r["score"])[:max_nodes]}
    for r in items:
        pid = r["parent_id"]
        while pid is not None and pid not in visible:
            visible.add(pid)
            pid = items[pid]["parent_id"]
    nodes = {r["id"]: {**r, "children": []} for r in items if r["id"] in visible}
    roots = []
    for n in nodes.values():
        if n["parent_id"] in nodes:
            nodes[n["parent_id"]]["children"].append(n)
        else:
            roots.append(n)
    roots = compress_ladders(roots)

    def render(ns):
        parts = []
        for n in sorted(ns, key=lambda x: x["score"]):
            label = f"{n.get('display_phrase', n['phrase'])} (f={n['freq']}, l={n['length']})"
            if n["children"]:
                parts.append(
                    f"<details><summary>{label}</summary>{render(n['children'])}</details>"
                )
            else:
                parts.append(f"<div>{label}</div>")
        return "".join(parts)

    return (
        "<html><head><meta charset='utf-8'><title>phrase tree</title></head>"
        f"<body>{render(roots)}</body></html>"
    )
