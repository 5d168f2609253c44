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


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 3
) -> DataFrame:
    """(rank, key, cnt, total_rows, n_keys, share_e6, skew_e6): the
    pre-join skew diagnostic - the top_k heaviest keys with their row
    share (cnt * 1e6 div total) and the skew ratio (cnt * n_keys * 1e6
    div total: 1e6 = perfectly uniform, >> 1e6 = this key is a hot
    reducer).  Read THIS before shipping a corpus-sized equi-join: a
    skew_e6 in the tens of millions is the signal to salt
    (salted_join) or pre-aggregate.

    One hash aggregate on the key + a scalar aggregate; the top_k comes
    from orderBy().limit() - TakeOrderedAndProject, a per-partition heap
    + k-row merge, NEVER a single-partition global window over the key
    table (which can itself be billions of rows)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"), F.count("*").alias("n_keys")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(int(top_k))
    from pyspark.sql import Window

    # rank over the ALREADY-LIMITED k rows (a k-row window, not corpus)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    top = top.withColumn("rank", F.row_number().over(w))
    return top.crossJoin(F.broadcast(totals)).select(
        F.col("rank").cast("int"),
        F.col("key").cast("string").alias("key"),
        F.col("cnt").cast("long"),
        F.col("total_rows").cast("long"),
        F.col("n_keys").cast("long"),
        F.expr("cnt * 1000000 div total_rows").cast("long").alias("share_e6"),
        F.expr("cnt * n_keys * 1000000 div total_rows")
        .cast("long")
        .alias("skew_e6"),
    )
