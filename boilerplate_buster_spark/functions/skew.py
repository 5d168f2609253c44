"""Explicit skew-handling primitives (north rule: "handles skew via salted
phrase keys and explicit repartitioning on url hash").

Catalyst's partial aggregation and AQE skew-join splitting cover most cases
automatically (and the engine's own aggregates lean on them - see
test_plans.py), but two shapes still need EXPLICIT salt:

  * distinct-count aggregation where one key holds most of the corpus (head
    boilerplate phrase): `salted_distinct_count` buckets the DISTINCT space
    by id hash - each distinct id lands in exactly one bucket, so per-bucket
    exact distinct counts ADD, turning one giant reducer into `salt`
    uniform ones.  Exact, two shuffles.
  * broadcast-impossible join against a skewed key: `salted_join` splits the
    skewed side's rows across `salt` sub-keys and replicates the other side
    once per sub-key - the classic salt/replicate join, exact for inner
    equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    key_col: str,
    id_col: str,
    salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct-id count with salted reducers.

    Bucket = xxhash64(id) % salt partitions the ID SPACE (not the rows), so
    SUM of per-(key, bucket) exact distinct counts equals the per-key global
    distinct count - no overlap, no approximation."""
    bucketed = df.select(
        F.col(key_col),
        F.col(id_col),
        F.expr(f"pmod(xxhash64({id_col}), {salt})").alias("_salt"),
    )
    per_bucket = bucketed.groupBy(key_col, "_salt").agg(
        F.countDistinct(id_col).alias("_d")
    )
    return per_bucket.groupBy(key_col).agg(F.sum("_d").alias(out_col))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Inner equi-join where `skewed` has hot keys: each skewed row gets a
    deterministic sub-key (xxhash64 over ALL its columns - STABLE under task
    retry; a nondeterministic salt like monotonically_increasing_id can
    re-salt a recomputed map task differently from shuffle files already
    fetched, duplicating or dropping join rows under executor loss), `other`
    is replicated once per sub-key.  Output equals the plain inner join.
    Byte-identical duplicate rows share a salt - spread is over DISTINCT row
    content, which is what matters for hot-KEY skew."""
    cols = ", ".join(f"`{c}`" for c in skewed.columns)
    lhs = skewed.withColumn("_salt", F.expr(f"pmod(xxhash64({cols}), {salt})"))
    rhs = other.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = lhs.join(rhs, [key, "_salt"])
    return out.drop("_salt")
