"""Gap sessionization + distributed AS-OF join: hand-computed fixtures,
strict-vs-inclusive boundary semantics, single-shuffle plan shape."""

from datetime import datetime as dt

from boilerplate_buster_spark.operators.sessions import (
    asof_join,
    session_stats,
    sessionize,
)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 0, 0, 0)),
            (2, 10, dt(2024, 1, 1, 0, 10, 0)),
            (3, 10, dt(2024, 1, 1, 2, 0, 0)),  # 110-min gap -> new session
            (4, 11, dt(2024, 1, 1, 0, 0, 0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )


def test_sessionize_gap_boundaries(spark):
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_us)
        for r in session_stats(sessionize(_events(spark), gap_s=1800)).collect()
    }
    assert got[(10, 1)] == (2, 600_000_000)  # events 1+2, 10 minutes
    assert got[(10, 2)] == (1, 0)
    assert got[(11, 1)] == (1, 0)
    # a gap EXACTLY equal to the threshold does NOT split (strictly greater)
    flat = session_stats(sessionize(_events(spark), gap_s=7200)).collect()
    assert {(r.user_id, r.session_idx, r.n_events) for r in flat} == {
        (10, 1, 3), (11, 1, 1)
    }


def test_asof_strict_vs_inclusive(spark):
    right = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 0, 5, 0), 100),
            (10, dt(2024, 1, 1, 2, 0, 0), 200),  # equal-ts with event 3
        ],
        "user_id long, ts timestamp, pid long",
    )
    strict = {
        r.event_id: r.asof_pid
        for r in asof_join(
            _events(spark), right, on=["user_id"], right_cols=["pid"]
        ).collect()
    }
    assert strict == {1: None, 2: 100, 3: 100, 4: None}
    incl = {
        r.event_id: r.asof_pid
        for r in asof_join(
            _events(spark), right, on=["user_id"], right_cols=["pid"],
            strict=False,
        ).collect()
    }
    assert incl == {1: None, 2: 100, 3: 200, 4: None}


def test_asof_right_ts_tie_takes_greatest_payload(spark):
    left = spark.createDataFrame(
        [(1, 10, dt(2024, 1, 1, 1, 0, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, dt(2024, 1, 1, 0, 0, 0), 7), (10, dt(2024, 1, 1, 0, 0, 0), 9)],
        "user_id long, ts timestamp, pid long",
    )
    [row] = asof_join(left, right, on=["user_id"], right_cols=["pid"]).collect()
    assert row.asof_pid == 9


def test_asof_single_shuffle_plan(spark):
    ev, right = _events(spark), _events(spark).selectExpr(
        "user_id", "ts", "event_id AS pid"
    )
    plan = (
        asof_join(ev, right, on=["user_id"], right_cols=["pid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-carry: exactly ONE key-partitioned exchange feeds the window
    # (one Exchange per union branch pre-AQE counts once coalesced; the
    # invariant that matters is no join operator and no extra shuffle)
    assert "Join" not in plan.replace("inner join", "")
    assert plan.count("Exchange hashpartitioning(_k_user_id") <= 2


def test_retention_cohorts_hand_computed(spark):
    from boilerplate_buster_spark.operators.sessions import retention_cohorts

    ev = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 12, 0, 0)),   # day 19723 (cohort)
            (10, dt(2024, 1, 3, 1, 0, 0)),    # offset 2
            (11, dt(2024, 1, 1, 23, 0, 0)),   # same cohort, day 0 only
            (12, dt(2024, 1, 3, 5, 0, 0)),    # later cohort
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r.cohort_bucket, r.bucket_offset): r.n_users
        for r in retention_cohorts(ev, bucket_s=86400).collect()
    }
    d0 = (dt(2024, 1, 1) - dt(1970, 1, 1)).days
    assert got == {(d0, 0): 2, (d0, 2): 1, (d0 + 2, 0): 1}


def test_funnel_conversion_hand_computed(spark):
    from boilerplate_buster_spark.operators.sessions import funnel_conversion

    ev = spark.createDataFrame(
        [
            (10, "signup", dt(2024, 1, 1)),
            (10, "purchase", dt(2024, 1, 5)),     # within 7d -> converted
            (11, "signup", dt(2024, 1, 1)),
            (11, "purchase", dt(2024, 1, 20)),    # too late
            (12, "purchase", dt(2024, 1, 1)),     # purchase BEFORE signup
            (12, "signup", dt(2024, 1, 2)),       # no later purchase
            (13, "error", dt(2024, 1, 1)),        # never enters the funnel
        ],
        "user_id long, event_type string, ts timestamp",
    )
    got = {
        r.user_id: (r.converted, r.next_us is not None)
        for r in funnel_conversion(
            ev, "signup", "purchase", within_s=7 * 86400
        ).collect()
    }
    assert got == {10: (True, True), 11: (False, True), 12: (False, False)}


def test_cooccurrence_window_and_canonical_pairs(spark):
    from boilerplate_buster_spark.operators.corpus_stats import cooccurrence

    docs = spark.createDataFrame(
        [(1, ["b", "a", "c"]), (2, ["a", "b"])], ["doc_id", "tokens"]
    )
    rows = {
        (r.w1, r.w2): (r.n_xy, r.n_x, r.n_y, r.assoc_e6)
        for r in cooccurrence(docs, window=2, min_count=1).collect()
    }
    # doc1 pairs: (b,a)->(a,b), (b,c), (a,c); doc2: (a,b) - canonicalized
    assert rows[("a", "b")][0] == 2 and rows[("b", "c")][0] == 1
    assert rows[("a", "c")][0] == 1
    # unigrams: a=2, b=2, c=1; N=5 -> assoc(a,b) = 2*5*1e6 // 4
    assert rows[("a", "b")] == (2, 2, 2, 2_500_000)
    # single-token doc contributes nothing and nothing crashes
    one = spark.createDataFrame([(3, ["solo"])], ["doc_id", "tokens"])
    assert cooccurrence(one, min_count=1).count() == 0


def test_sessionize_agrees_with_spark_native_session_window(spark):
    """Cross-validation against Spark's OWN session_window aggregation:
    the gap rule is the same (new session when gap > threshold), so the
    per-user session count and each session's event count must match."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ours = (
        session_stats(sessionize(ev, gap_s=28800))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    native = (
        ev.groupBy("user_id", F.session_window("ts", "8 hours"))
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    o = {r.user_id: (r.n_sessions, r.n_events) for r in ours.collect()}
    n = {r.user_id: (r.n_sessions, r.n_events) for r in native.collect()}
    assert o == n


def test_rolling_window_sum_range_semantics(spark):
    from boilerplate_buster_spark.operators.sessions import rolling_window_sum

    ev = spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 0, 0, 0), 100),
            (2, 10, dt(2024, 1, 1, 0, 30, 0), 200),
            (3, 10, dt(2024, 1, 1, 2, 0, 0), 400),   # 1st falls out of 1h window
            (4, 10, dt(2024, 1, 1, 2, 0, 0), 800),   # equal-ts PEER: included in #3 too
        ],
        "event_id long, user_id long, ts timestamp, cents long",
    )
    got = {r.event_id: (r.win_sum, r.win_n)
           for r in rolling_window_sum(ev, "cents", window_s=3600).collect()}
    assert got[1] == (100, 1)
    assert got[2] == (300, 2)
    # RANGE frame: equal-ts rows are peers - both see both
    assert got[3] == (1200, 2) and got[4] == (1200, 2)


def test_top_terms_per_group_ties_lexicographic(spark):
    from boilerplate_buster_spark.operators.corpus_stats import (
        top_terms_per_group,
    )

    docs = spark.createDataFrame(
        [("h1", ["b", "a", "a", "b", "c"]), ("h2", ["z"])],
        ["host", "tokens"],
    )
    got = [(r.host, r.term, r.cnt, r.rank)
           for r in top_terms_per_group(docs, "host", k=2)
           .orderBy("host", "rank").collect()]
    # a and b tie at 2 -> 'a' ranks first
    assert got == [("h1", "a", 2, 1), ("h1", "b", 2, 2), ("h2", "z", 1, 1)]


def test_event_transitions_chain_and_ties(spark):
    from boilerplate_buster_spark.operators.sessions import event_transitions

    ev = spark.createDataFrame(
        [
            (1, 10, "a", dt(2024, 1, 1, 0, 0, 0)),
            (2, 10, "b", dt(2024, 1, 1, 0, 1, 0)),
            (3, 10, "b", dt(2024, 1, 1, 0, 1, 0)),  # tie: id 2 precedes 3
            (4, 10, "c", dt(2024, 1, 1, 0, 2, 0)),
            (5, 11, "a", dt(2024, 1, 1, 0, 0, 0)),  # lone event: no row
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {(r.prev_type, r.event_type): r.n
           for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1}


def test_hourly_spikes_flags_burst_only_with_history(spark):
    from boilerplate_buster_spark.operators.sessions import hourly_spikes

    rows = []
    # hours 0-3: 2 events each; hour 4: 20 events (a 10x burst)
    for h in range(4):
        rows += [(f"e{h}_{i}", dt(2024, 1, 1, h, i, 0)) for i in range(2)]
    rows += [(f"e4_{i}", dt(2024, 1, 1, 4, i, 0)) for i in range(20)]
    ev = spark.createDataFrame(
        [(i, "click", t) for i, (_, t) in enumerate(rows)],
        "event_id long, event_type string, ts timestamp",
    )
    got = {r.hr % 24: r for r in hourly_spikes(ev).collect()}
    assert not got[0].is_spike  # no history -> never a spike
    assert not got[1].is_spike and not got[3].is_spike
    assert got[4].is_spike      # 20 vs mean 2 over 4 buckets
    assert (got[4].prev_sum, got[4].prev_buckets) == (8, 4)
