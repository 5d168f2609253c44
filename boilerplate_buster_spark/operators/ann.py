"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k      - exact baseline; JVM-side zip_with/aggregate
                                    dot products, TakeOrderedAndProject top-k
                                    (no full sort, no Python)
  * random-hyperplane LSH buckets - the scale path: 2^P sign-buckets from
                                    deterministic md5-derived hyperplanes;
                                    query probes its own bucket (+ optional
                                    all-buckets fallback), exact cosine only
                                    within the bucket
  * embedding near-dup pairs      - bounded self-join + cosine >= threshold

At 100 TB the brute-force path stays a single linear scan with a top-k
aggregate (cheap); the LSH path bounds the candidate set per query for
repeated-query serving.  Cosines are rounded to 4 dp wherever a DuckDB oracle
compares values (float-order stability)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector: (vec_id, cos)."""
    q = "array(" + ", ".join(f"cast({float(v)} AS float)" for v in query_vec) + ")"
    return (
        emb.select(
            F.col(id_col),
            F.expr(f"round({cosine_expr(vec_col, q)}, 4)").alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket_expr(vec_col: str, planes: int = 8, dim: int = 64) -> str:
    """2^planes LSH bucket id: bit p = sign of <v, plane_p> where
    plane_p[i] = +1/-1 from the parity of H(concat(p,':',i)) - deterministic,
    no stored model."""
    from boilerplate_buster_spark.operators.text_stats import h60

    terms = []
    for p in range(planes):
        seeded = h60(f"concat('{p}', ':', i)")
        plane = (
            f"transform(sequence(0, {dim - 1}), "
            f"i -> IF(pmod({seeded}, 2) = 0, 1.0D, -1.0D))"
        )
        terms.append(f"IF({_dot(vec_col, plane)} > 0, {1 << p}, 0)")
    return "cast(" + " + ".join(terms) + " AS int)"


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ONLY inside the query's sign-bucket."""
    dim = len(query_vec)
    bucket = hyperplane_bucket_expr(vec_col, planes, dim)
    q = "array(" + ", ".join(f"cast({float(v)} AS float)" for v in query_vec) + ")"
    q_bucket = hyperplane_bucket_expr(q, planes, dim)
    return (
        emb.withColumn("bucket", F.expr(bucket))
        .filter(F.col("bucket") == F.expr(q_bucket))
        .select(
            F.col(id_col),
            F.expr(f"round({cosine_expr(vec_col, q)}, 4)").alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold.

    All-pairs within an id bound (tests/small dims); the LSH bucket variant
    is the scale path: join on equal bucket first, cosine after."""
    e = emb if max_id is None else emb.filter(F.col(id_col) < max_id)
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(f"round({cosine_expr('va', 'vb')}, 4)").alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_bucketed_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-dup: candidates = same sign-bucket (recall grows
    with fewer planes), exact cosine only within buckets."""
    bucket = hyperplane_bucket_expr(vec_col, planes, dim)
    e = emb.withColumn("bucket", F.expr(bucket))
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(f"round({cosine_expr('va', 'vb')}, 4)").alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
