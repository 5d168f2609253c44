"""Event-stream temporal operators: gap-based sessionization and the
distributed AS-OF join - the two classic time-keyed primitives Spark has
no single built-in for (the builder brief names as-of joins explicitly as
the custom-operator bar; sessionization is the standard web-analytics
companion over the events table).

Scale posture (100 TB):

* `sessionize` / `session_stats`: ONE shuffle on the user key; session
  boundaries come from lag() + a running sum inside the same window sort,
  and the stats are a plain hash aggregate on (user, session_idx).  No
  self-joins, no iteration: the gap rule is prefix-decomposable, so a
  1000-executor run is exactly as correct as a local one.

* `asof_join`: the classic union-carry formulation - tag both sides,
  sort each key's rows by (ts, side-tag), carry the last non-null right
  payload forward with last(ignorenulls) over an unbounded-preceding
  window.  ONE shuffle on the join key, a single sort, linear scan; never
  a range cross-join.  Strictness is encoded purely in the tag order:
  strict (right_ts < left_ts) sorts right rows AFTER left rows at equal
  timestamps so they can't be seen; inclusive (<=) sorts them before.
  Ties among right rows with the SAME (key, ts) resolve to the greatest
  right payload tuple (deterministic; pre-aggregate the right side per
  (key, ts) when a different rule is needed).

Timestamps are compared in exact integer microseconds (unix_micros), so
SQL oracles reproduce every boundary bit-for-bit - no doubles, no
truncating second-level casts.

No reference anchor: the reference (corpus_miner.cpp) has no temporal
surface; these mirror standard streaming/warehouse practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col: str):
    """Exact epoch microseconds of a timestamp column.  Parquet often
    scans as TIMESTAMP_NTZ, which unix_micros rejects - the cast maps NTZ
    wall-clock to the session zone, and the repo session pins
    spark.sql.session.timeZone=UTC, so the value equals DuckDB's
    epoch_us(naive) bit-for-bit."""
    return F.expr(f"unix_micros(cast({col} AS timestamp))")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Input rows + (ts_us, session_idx): a new session starts at a row
    whose gap to the user's previous event exceeds `gap_s` seconds (first
    event = session 1).  Rows with equal timestamps always share a session
    (their mutual gap is 0), so the assignment is deterministic regardless
    of tie order within the sort.

    Boundary semantics: the split is STRICT (gap > gap_s keeps two events
    exactly gap_s apart in ONE session), matching the SQL oracle.  Spark's
    native ``session_window`` is inclusive-exclusive ([start, start+gap)),
    so an event exactly gap_s after its predecessor starts a NEW session
    there.  Cross-checks against session_window must therefore run on data
    with no exact-gap ties (tests/test_streaming.py asserts that
    precondition) or accept off-by-one session counts at the boundary."""
    gap_us = int(gap_s) * 1_000_000
    w = Window.partitionBy(user_col).orderBy("ts_us")
    with_ts = events.withColumn("ts_us", _micros(ts_col))
    is_new = (
        F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(gap_us)
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return with_ts.withColumn(
        "session_idx",
        F.sum(F.coalesce(is_new, F.lit(1))).over(run).cast("long"),
    )


def session_stats(
    sessions: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """(user, session_idx, n_events, start_us, end_us, duration_us):
    per-session aggregate over :func:`sessionize` output - a plain hash
    aggregate on the (user, session) key."""
    return sessions.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 7 * 86400,
) -> DataFrame:
    """(cohort_bucket, bucket_offset, n_users): classic retention matrix -
    a user's cohort is the epoch bucket (default: week) of their FIRST
    event; each (cohort, offset) cell counts DISTINCT users from that
    cohort active `offset` buckets later.  Buckets are exact integer
    epoch-microsecond divisions, so the oracle reproduces every boundary.

    Plan: one shuffle for the per-user min (hash agg), one broadcast-able
    join back (per-user first-bucket table is |users|-sized), one
    count-distinct agg on the (cohort, offset) cell key."""
    b_us = int(bucket_s) * 1_000_000
    with_b = events.select(
        F.col(user_col).alias("u"), _micros(ts_col).alias("ts_us")
    ).withColumn("bucket", F.expr(f"ts_us div {b_us}"))
    first = with_b.groupBy("u").agg(F.min("bucket").alias("cohort_bucket"))
    return (
        with_b.join(first, "u")
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )


def funnel_conversion(
    events: DataFrame,
    first_step: str,
    second_step: str,
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, first_us, next_us, converted): two-step funnel - for every
    user with a `first_step` event, the FIRST such event, the first
    `second_step` event STRICTLY after it (null if none), and whether it
    landed within `within_s` seconds.  One row per user who entered the
    funnel.

    Plan: one conditional hash-agg for the entry step, one matched-rows
    join + min-agg for the follow-up.  The entry table is |users|-sized -
    small enough that AQE broadcasts it on most corpora, but NOT
    constant-bounded, so no broadcast hint is forced (a billion-user
    event log must be allowed to shuffle-join on the user key)."""
    w_us = int(within_s) * 1_000_000
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        _micros(ts_col).alias("ts_us"),
    )
    entry = (
        base.filter(F.col("et") == first_step)
        .groupBy("u")
        .agg(F.min("ts_us").alias("first_us"))
    )
    follow = (
        base.filter(F.col("et") == second_step)
        .join(entry, "u")
        .filter(F.col("ts_us") > F.col("first_us"))
        .groupBy("u")
        .agg(F.min("ts_us").alias("next_us"))
    )
    return entry.join(follow, "u", "left").select(
        F.col("u").alias(user_col),
        "first_us",
        "next_us",
        (
            F.col("next_us").isNotNull()
            & (F.col("next_us") - F.col("first_us") <= F.lit(w_us))
        ).alias("converted"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, event_type, n): the first-order Markov transition
    counts of the per-user event stream (ties on timestamp break by
    `id_col`, so the chain is deterministic).  Each user's first event
    has no predecessor and is excluded.

    One shuffle on the user key (the lag window), then a tiny
    (|types|^2)-group hash aggregate."""
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    base = events.withColumn("ts_us", _micros(ts_col)).withColumn(
        "prev_type", F.lag(type_col).over(w)
    )
    return (
        base.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", type_col)
        .agg(F.count("*").alias("n"))
    )


def hourly_spikes(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    factor_num: int = 3,
    factor_den: int = 1,
    trailing_hours: int = 24,
) -> DataFrame:
    """(event_type, hr, cnt, prev_sum, prev_buckets, is_spike): burst
    detection - an hour is a spike when its count exceeds
    factor_num/factor_den times the mean of the trailing `trailing_hours`
    PRESENT buckets (integer cross-multiplication, no division:
    cnt * prev_buckets * den > num * prev_sum).  Hours with no history
    are never spikes.  The trailing frame is a RANGE over the integer
    hour index ending at 1 PRECEDING, so sparse hours (no events) simply
    don't contribute - the mean is over observed buckets, documented.

    One (type, hour) hash aggregate, then the window runs per type over
    bucket rows (|types| x |hours| - aggregate-sized, never row-sized)."""
    hr = events.select(F.col(type_col), _micros(ts_col).alias("_us")).select(
        type_col, F.expr("_us div 3600000000").alias("hr")
    )
    counts = hr.groupBy(type_col, "hr").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(type_col)
        .orderBy("hr")
        .rangeBetween(-int(trailing_hours), -1)
    )
    out = counts.withColumn(
        "prev_sum", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn("prev_buckets", F.count("cnt").over(w))
    return out.select(
        type_col,
        "hr",
        F.col("cnt").cast("long"),
        F.col("prev_sum").cast("long"),
        F.col("prev_buckets").cast("long"),
        (
            (F.col("prev_buckets") > 0)
            & (
                F.col("cnt") * F.col("prev_buckets") * int(factor_den)
                > int(factor_num) * F.col("prev_sum")
            )
        ).alias("is_spike"),
    )


def rolling_window_sum(
    events: DataFrame,
    value_expr: str,
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Input keys + (ts_us, win_sum, win_n): per event, the sum of
    `value_expr` (an INTEGER SQL expression over the row - e.g. cents)
    and the row count over the user's trailing `window_s`-second window,
    INCLUSIVE of the current row and of equal-timestamp peers (RANGE
    frame semantics - identical in every SQL engine, so the oracle
    matches even on timestamp ties).

    One shuffle on the user key; the RANGE frame runs inside the same
    sort.  The value surface must be integral - float accumulation order
    is not cross-engine stable, which is exactly why this operator takes
    an expression, not a column: push the cents conversion in here."""
    w_us = int(window_s) * 1_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts_us")
        .rangeBetween(-w_us, 0)
    )
    base = events.withColumn("ts_us", _micros(ts_col)).withColumn(
        "_v", F.expr(value_expr).cast("long")
    )
    return base.withColumn("win_sum", F.sum("_v").over(w)).withColumn(
        "win_n", F.count("*").over(w)
    ).drop("_v")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    right_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """LEFT AS-OF join: every left row, plus `right_cols` of the most
    recent right row with the same `on` key and right_ts < left_ts
    (`strict`) or <= (`strict=False`); nulls when no such row exists.
    Output columns: all of left's, then `prefix`+c for c in right_cols.

    `on` + ts + right_cols must not collide with left's column names
    (rename upstream if they do)."""
    lt, rt = (0, 1) if strict else (1, 0)
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("_rpay")
    tagged_l = left.select(
        *[F.col(c).alias(f"_k_{c}") for c in on],
        _micros(left_ts).alias("_ts"),
        F.lit(lt).alias("_tag"),
        lrow,
        F.lit(None).cast(
            right.select(rpay).schema["_rpay"].dataType.simpleString()
        ).alias("_rpay"),
    )
    tagged_r = right.select(
        *[F.col(c).alias(f"_k_{c}") for c in on],
        _micros(right_ts).alias("_ts"),
        F.lit(rt).alias("_tag"),
        F.lit(None).cast(
            left.select(lrow).schema["_lrow"].dataType.simpleString()
        ).alias("_lrow"),
        rpay,
    )
    w = (
        Window.partitionBy(*[f"_k_{c}" for c in on])
        .orderBy("_ts", "_tag", "_rpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).withColumn(
        "_carry", F.last("_rpay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_lrow").isNotNull()).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
