"""NK dedup strategy parity, join enrichment, fact builders and DQ gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import dedup, enrich, facts


def test_dedup_window_vs_max_by_parity(spark, sf_dir):
    """The two physical strategies must produce the identical row set."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    order_cols = ["l_shipdate", "l_quantity", "l_extendedprice", "l_partkey",
                  "l_suppkey", "l_linenumber", "l_discount", "l_tax",
                  "l_returnflag", "l_linestatus"]
    a = dedup.dedup_by_key(li, ["l_orderkey"], [F.desc(c) for c in order_cols])
    b = dedup.dedup_max_by(li, ["l_orderkey"], order_cols)
    cols = sorted(li.columns)
    rows_a = sorted([tuple(r) for r in a.select(*cols).collect()])
    rows_b = sorted([tuple(r) for r in b.select(*cols).collect()])
    assert rows_a == rows_b
    assert len(rows_a) == li.select("l_orderkey").distinct().count()


def test_dedup_null_ordering_parity(spark):
    """NULL order keys: max_by struct comparison == desc_nulls_last window."""
    df = spark.createDataFrame(
        [("k", None, "a"), ("k", 5, "b"), ("k", 3, "c")],
        "nk string, ts int, payload string",
    )
    w = dedup.dedup_by_key(df, ["nk"], [F.desc_nulls_last("ts")])
    m = dedup.dedup_max_by(df, ["nk"], ["ts"])
    assert w.collect()[0].payload == "b"
    assert m.collect()[0].payload == "b"


def test_enrich_left_defaults(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], "id int, dim_id int")
    dim = spark.createDataFrame([(10, "x")], "dim_id int, label string")
    out = enrich.enrich_left(fact, dim, on="dim_id", defaults={"label": "Unknown"})
    got = {r.id: r.label for r in out.collect()}
    assert got == {1: "x", 2: "Unknown"}


def test_referential_filter_no_amplification(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    ref = spark.createDataFrame([(1,), (1,), (1,)], "k int")  # dup keys in ref
    out = enrich.referential_filter(df, ref, on="k")
    # left_semi: both k=1 rows kept, NOT multiplied by ref's 3 copies
    assert out.count() == 2


def test_orphans_anti(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    ref = spark.createDataFrame([(1,)], "k int")
    assert [r.k for r in enrich.orphans(df, ref, on="k").collect()] == [2]


def test_conditional_aggregate_balance(spark):
    df = spark.createDataFrame(
        [("o1", True), ("o1", False), ("o1", True), ("o2", False)],
        "owner string, is_private boolean",
    )
    out = facts.conditional_aggregate(
        df,
        ["owner"],
        {
            "private_count": F.col("is_private"),
            "public_count": ~F.col("is_private"),
        },
        count_name="datasets_count",
    )
    for r in out.collect():
        # the reference's mandatory invariant: total = private + public
        assert r.datasets_count == r.private_count + r.public_count


def test_resolve_fk_fallback_and_stats(spark):
    fact = spark.createDataFrame([(1,), (2,), (3,)], "uid int")
    dim = spark.createDataFrame([(1, 101), (2, 102)], "uid_nk int, user_sk int")
    resolved = facts.resolve_fk(fact, dim, "uid", "uid_nk", "user_sk")
    got = {r.uid: r.user_sk for r in resolved.collect()}
    assert got == {1: 101, 2: 102, 3: 0}  # miss -> SK=0 sentinel
    stats = facts.fk_miss_stats(resolved)
    assert stats["total"] == 3 and stats["misses"] == 1
    assert abs(stats["map_rate"] - 2 / 3) < 1e-12


def test_check_grain_raises(spark):
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    facts.check_grain(ok, ["k"])  # must not raise
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with pytest.raises(facts.GrainViolation):
        facts.check_grain(dup, ["k"])


def test_check_balance_and_negative(spark):
    ok = spark.createDataFrame([(3, 1, 2)], "total int, a int, b int")
    facts.check_balance(ok, "total", ["a", "b"])
    bad = spark.createDataFrame([(4, 1, 2)], "total int, a int, b int")
    with pytest.raises(facts.BalanceViolation):
        facts.check_balance(bad, "total", ["a", "b"])
    with pytest.raises(facts.BalanceViolation):
        facts.check_non_negative(
            spark.createDataFrame([(-1,)], "m int"), ["m"]
        )


def test_salted_join_equivalent_to_plain(spark):
    """Salting must not change join semantics — only key distribution."""
    # heavily skewed fact: 10k rows on one key, a handful elsewhere
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(5).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    fact = hot.unionByName(cold)
    dim = spark.createDataFrame([(1, "hot"), (3, "c3"), (99, "unused")], "k long, label string")

    plain = fact.join(dim, "k", "left")
    salted = enrich.salted_join(fact, dim, "k", n_salts=8)
    cols = ["k", "v", "label"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )
    assert "__salt" not in salted.columns
    # the join key actually includes the salt (the skew-sharding mechanism)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_broadcast_in_enrich_plan(spark):
    """enrich_left must broadcast the dim: no shuffle of the fact side."""
    fact = spark.range(1000).withColumnRenamed("id", "dim_id")
    dim = spark.createDataFrame([(1, "x")], "dim_id long, label string")
    out = enrich.enrich_left(fact, dim, on="dim_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_usage_with_first_seen_invariant_and_values(spark):
    rows = [
        # (tag, entity, day): u1 first uses 'a' on d1, again d2; u2 joins d2
        ("a", "u1", "2024-01-01"),
        ("a", "u1", "2024-01-02"),
        ("a", "u2", "2024-01-02"),
        ("b", "u1", "2024-01-02"),
    ]
    df = spark.createDataFrame(rows, "tag string, entity string, day string")
    out = facts.usage_with_first_seen(df, "tag", "entity", "day")
    got = {(r.tag, r.day): (r.usage_count, r.new_usage_count) for r in out.collect()}
    assert got == {
        ("a", "2024-01-01"): (1, 1),
        ("a", "2024-01-02"): (2, 1),  # u1 returning, u2 new
        ("b", "2024-01-02"): (1, 1),
    }
    # invariant holds by construction
    facts.check_row_invariant(
        out, F.col("usage_count") >= F.col("new_usage_count"), "usage>=new"
    )


def test_check_row_invariant_raises(spark):
    bad = spark.createDataFrame([(1, 2)], "usage_count int, new_usage_count int")
    with pytest.raises(facts.BalanceViolation):
        facts.check_row_invariant(
            bad, F.col("usage_count") >= F.col("new_usage_count"), "usage>=new"
        )


def _asof_frames(spark):
    left = spark.createDataFrame(
        [("u", 1, 10), ("u", 2, 20), ("u", 3, 30), ("v", 1, 40)],
        "k string, t int, lv int",
    )
    right = spark.createDataFrame(
        [("u", 1, 100.0), ("u", 3, 300.0), ("w", 2, 999.0)],
        "k string, rt int, rv double",
    )
    return left, right


def test_asof_join_backward_inclusive_and_strict(spark):
    left, right = _asof_frames(spark)
    out = enrich.asof_join(left, right, ["k"], "t", "rt").collect()
    got = {(r.k, r.t): (r.rt, r.rv) for r in out}
    assert got == {
        ("u", 1): (1, 100.0),   # inclusive: equal ts matches
        ("u", 2): (1, 100.0),
        ("u", 3): (3, 300.0),
        ("v", 1): (None, None),  # no right rows for key
    }
    strict = enrich.asof_join(left, right, ["k"], "t", "rt", strict=True).collect()
    got = {(r.k, r.t): r.rt for r in strict}
    assert got[("u", 1)] is None    # strict: equal ts excluded
    assert got[("u", 3)] == 1


def test_asof_join_forward_and_tolerance(spark):
    left, right = _asof_frames(spark)
    fwd = enrich.asof_join(left, right, ["k"], "t", "rt", direction="forward")
    got = {(r.k, r.t): r.rt for r in fwd.collect()}
    assert got == {("u", 1): 1, ("u", 2): 3, ("u", 3): 3, ("v", 1): None}
    tol = enrich.asof_join(
        left, right, ["k"], "t", "rt", tolerance=F.lit(1)
    )
    got = {(r.k, r.t): r.rt for r in tol.collect()}
    assert got[("u", 2)] == 1       # distance 1 <= tolerance
    assert got[("u", 3)] == 3
    tol0 = enrich.asof_join(left, right, ["k"], "t", "rt", tolerance=F.lit(0))
    got = {(r.k, r.t): r.rt for r in tol0.collect()}
    assert got[("u", 2)] is None    # distance 1 > 0 nulled


def test_range_join_binned_matches_broadcast(spark):
    vals = spark.range(1000).select((F.col("id") * 7 % 997).alias("v"))
    bands = spark.createDataFrame(
        [(0, 0.0, 250.0), (1, 250.0, 500.0), (2, 500.0, 997.0)],
        "band_id int, lo double, hi double",
    )
    a = enrich.range_join(vals, bands, "v", "lo", "hi")
    b = enrich.range_join(vals, bands, "v", "lo", "hi", bin_size=100.0)
    ra = sorted((r.v, r.band_id) for r in a.collect())
    rb = sorted((r.v, r.band_id) for r in b.collect())
    assert ra == rb and len(ra) == 1000


def test_sessionize_gap_numbering(spark):
    from aws_medallion_etl_spark.operators import kpi

    rows = [
        ("u", 1, "2024-01-01 10:00:00"),
        ("u", 2, "2024-01-01 10:10:00"),   # same session (10 min gap)
        ("u", 3, "2024-01-01 11:30:00"),   # new session (80 min gap)
        ("v", 4, "2024-01-01 10:00:00"),   # other key, own numbering
    ]
    df = spark.createDataFrame(rows, "k string, eid int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = kpi.sessionize(df, ["k"], "ts", gap_seconds=1800, order_tiebreak=["eid"])
    got = {r.eid: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}

    stats = kpi.session_stats(df, ["k"], "ts", 1800, ["eid"]).collect()
    s = {(r.k, r.session_idx): r.n_events for r in stats}
    assert s == {("u", 1): 2, ("u", 2): 1, ("v", 1): 1}


def test_funnel_strict_ordering(spark):
    from aws_medallion_etl_spark.operators import kpi

    rows = [
        # u1 completes in order: view@1, click@2, purchase@3
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        # u2 clicks BEFORE first view: click must not count
        (2, "click", 1.0), (2, "view", 2.0), (2, "purchase", 3.0),
        # u3 views only
        (3, "view", 5.0),
        # u4: second click after view counts even though first was before
        (4, "click", 1.0), (4, "view", 2.0), (4, "click", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    f = kpi.funnel(
        df, "user_id", "ts",
        [("view", F.col("event_type") == "view"),
         ("click", F.col("event_type") == "click"),
         ("purchase", F.col("event_type") == "purchase")],
    )
    got = {r.user_id: (r.t_view, r.t_click, r.t_purchase) for r in f.collect()}
    assert got[1] == (1.0, 2.0, 3.0)
    # u2: click@1 precedes view@2 -> no click stage -> purchase can't count
    assert got[2] == (2.0, None, None)
    assert got[3] == (5.0, None, None)
    assert got[4] == (2.0, 4.0, None)


def test_merge_rollup_overlap_and_new_keys(spark):
    from aws_medallion_etl_spark.operators import facts

    existing = spark.createDataFrame(
        [(1, 2, 100), (2, 1, 50)], ["k", "n", "total"]
    )
    delta = spark.createDataFrame(
        [(2, 3, 25), (3, 1, 10)], ["k", "n", "total"]
    )
    got = {r.k: (r.n, r.total) for r in facts.merge_rollup(
        existing, delta, ["k"], ["n", "total"]).collect()}
    assert got == {1: (2, 100), 2: (4, 75), 3: (1, 10)}
