"""Deterministic HLL + Count-Min sketches: estimate accuracy against known
cardinalities, the never-underestimate guarantee, merge/duplicate
insensitivity."""

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.sketches import (
    cms_estimates,
    cms_sketch,
    estimate_hll,
    hll_registers,
)


def test_hll_estimate_within_tolerance(spark):
    vals = spark.range(5000).select(
        F.expr("concat('item', id)").alias("value")
    )
    regs = [r.register for r in hll_registers(vals, p=6).collect()]
    assert len(regs) == 64  # complete register table, zero-filled
    est = estimate_hll(regs)
    # p=6 -> sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.39


def test_hll_duplicate_insensitive(spark):
    once = spark.range(300).select(F.expr("concat('v', id)").alias("value"))
    tripled = once.unionAll(once).unionAll(once)
    a = sorted(tuple(r) for r in hll_registers(once, p=5).collect())
    b = sorted(tuple(r) for r in hll_registers(tripled, p=5).collect())
    assert a == b  # the sketch sees SETS, multiplicity is invisible


def test_cms_never_underestimates_and_counts_total(spark):
    vals = spark.range(900).select(
        F.expr("concat('t', CAST(id % 30 AS string))").alias("value")
    )
    terms = [f"t{i}" for i in range(30)] + ["absent"]
    rows = cms_estimates(vals, terms, w=16).collect()  # tiny w forces collisions
    assert len(rows) == 31
    assert all(r.overestimate >= 0 for r in rows)  # the defining guarantee
    assert {r.term: r.exact for r in rows}["absent"] == 0
    # every counter row sums to the stream size (cnt conservation per hash)
    sk = cms_sketch(vals, w=16)
    per_row = {r.r: r.total for r in sk.groupBy("r").agg(
        F.sum("cnt").alias("total")).collect()}
    assert set(per_row.values()) == {900}


def test_bloom_no_false_negatives_and_fp_exists(spark):
    from boilerplate_buster_spark.operators.sketches import bloom_membership

    vals = spark.range(200).select(
        F.expr("concat('w', id)").alias("value")
    )
    present = [f"w{i}" for i in range(0, 200, 20)]
    absent = [f"zz{i}" for i in range(60)]  # tiny m makes an FP likely
    rows = bloom_membership(vals, present + absent, k=3, m=64).collect()
    by = {r.term: r for r in rows}
    # no false negatives: every present term must be maybe_member
    assert all(by[t].maybe_member for t in present)
    assert all(by[t].exact_present for t in present)
    # absent terms are never exact_present; with m=64 and 200 inserts the
    # filter is saturated enough that at least one FP shows up
    assert not any(by[t].exact_present for t in absent)
    assert any(by[t].maybe_member for t in absent)


def test_jl_projection_hand_computed(spark):
    import hashlib

    from boilerplate_buster_spark.operators.ann import jl_sign_projection

    emb = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125])], "vec_id long, embedding array<float>"
    )
    got = {r.j: r.y for r in jl_sign_projection(emb, out_dim=4).collect()}
    q = [500, -250, 125]  # floor(x * 1000); all exact in float32

    def sign(i, j):
        h = int(hashlib.md5(f"{i}#jl{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    for j in range(4):
        assert got[j] == sum(sign(i, j) * q[i] for i in range(3))
