"""Sketch monitoring, CDC upsert, edit-distance match, stratified
sampling — operator-level pins beyond the oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import corpus, fuzzy, scd, sketches


def test_hll_bounds_hold_and_merge_property(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 1000).alias("v")
    )
    out = sketches.distinct_bounds(df, ["g"], "v", rel_bound=0.05)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["hll_within_bound"] for r in rows)
    # gcd(3, 1000) = 1, so every group cycles through all 1000 values
    assert all(r["n_exact"] == 1000 for r in rows)


def test_cms_bounds(spark):
    df = spark.range(5_000).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k")
    )
    report = sketches.frequency_bounds(df, "k", ["k0", "k5", "missing"])
    by_val = {r["value"]: r for r in report}
    assert by_val["k0"]["n_exact"] == 500
    assert by_val["missing"]["n_exact"] == 0
    assert all(r["cms_within_bound"] for r in report)


def _skewed_keys(spark):
    # 500 light keys (10 rows each) + two heavy keys (200 / 150 rows)
    light = spark.range(5_000).select((F.col("id") % 500).alias("k"))
    h1 = spark.range(200).select(F.lit(900_001).alias("k"))
    h2 = spark.range(150).select(F.lit(900_002).alias("k"))
    return light.unionAll(h1).unionAll(h2)


def test_heavy_hitters_screened_exact_under_collisions(spark):
    df = _skewed_keys(spark)
    # width=64 over 502 keys forces bucket collisions: the screen
    # admits false positives, the exact verify must kill them all
    out = sketches.heavy_hitters_screened(
        df, "k", threshold=100, depth=3, width=64
    ).collect()
    got = {r["k"]: r["n_occurrences"] for r in out}
    assert got == {900_001: 200, 900_002: 150}


def test_heavy_hitters_screen_no_false_negatives_at_threshold_edge(spark):
    df = _skewed_keys(spark)
    # threshold exactly at the light-key count: every key qualifies
    # and the screen must pass them all through (count-min never
    # under-counts), so the output is the full exact answer
    out = sketches.heavy_hitters_screened(
        df, "k", threshold=10, depth=4, width=32
    )
    exact = (
        df.groupBy("k").count().where(F.col("count") >= 10).count()
    )
    assert out.count() == exact == 502


def test_heavy_hitters_rejects_degenerate_sketch_params(spark):
    import pytest as _pytest

    df = _skewed_keys(spark)
    # width=0 would make pmod(hash, 0) NULL — every semi-join matches
    # nothing and the operator would silently return EMPTY; refuse.
    with _pytest.raises(ValueError, match="width"):
        sketches.heavy_hitters_screened(df, "k", threshold=100, width=0)
    with _pytest.raises(ValueError, match="width"):
        sketches.heavy_hitters_screened(df, "k", threshold=100, width=-8)
    with _pytest.raises(ValueError, match="depth"):
        sketches.heavy_hitters_screened(df, "k", threshold=100, depth=0)


def test_heavy_hitters_blind_screen_falls_back_to_plain_groupby(spark):
    # threshold=1 with 300k rows: even the clamped 2^18 width leaves
    # the expected bucket load >= threshold, so the screen is provably
    # blind — the operator must skip the sketch (no broadcast screens
    # in the plan) and still return the exact answer
    df = spark.range(300_000).select((F.col("id") % 1_000).alias("k"))
    hh = sketches.heavy_hitters_screened(df, "k", threshold=1)
    assert hh.count() == 1_000
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_heavy_hitters_screen_is_broadcast_only(spark):
    df = _skewed_keys(spark)
    hh = sketches.heavy_hitters_screened(df, "k", threshold=100, depth=3)
    hh.collect()
    plan = hh._jdf.queryExecution().executedPlan().toString()
    # all 3 screens are broadcast semi joins; the big side never
    # rides a join exchange
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("ShuffledHashJoin") == 0
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_scd1_upsert_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["k", "v", "ts"]
    )
    feed = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 20)], ["k", "v", "ts"]
    )
    out = {r["k"]: (r["v"], r["ts"])
           for r in scd.scd1_upsert(snap, feed, ["k"], ["ts"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 20), 3: ("c", 10), 4: ("d", 20)}


def test_scd1_upsert_stale_change_loses(spark):
    snap = spark.createDataFrame([(1, "new", 30)], ["k", "v", "ts"])
    feed = spark.createDataFrame([(1, "old", 20)], ["k", "v", "ts"])
    out = scd.scd1_upsert(snap, feed, ["k"], ["ts"]).collect()
    assert out[0]["v"] == "new"


def test_levenshtein_pairs_blocking_and_distance(spark):
    df = spark.createDataFrame(
        [("red widget",), ("rod widget",), ("red gadget",), ("red widget",)],
        ["name"],
    )
    pairs = {(r["name_a"], r["name_b"]): r["distance"]
             for r in fuzzy.levenshtein_pairs(df, "name", 3).collect()}
    # same block (widget), distance 1; duplicates collapse first
    assert pairs == {("red widget", "rod widget"): 1}
    # gadget-block singleton pairs with nothing even though distance
    # to "red widget" is 3 — the documented blocking recall contract
    assert not any("gadget" in a or "gadget" in b for a, b in pairs)


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    s1 = corpus.stratified_sample(df, "lang", "doc_id", {"en": 0.5}, 0.1)
    s2 = corpus.stratified_sample(df, "lang", "doc_id", {"en": 0.5}, 0.1)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    counts = dict(s1.groupBy("lang").count().collect())
    # 1000 en at 50%, 1000 fr at 10% — binomial, generous windows
    assert 400 <= counts["en"] <= 600
    assert 50 <= counts["fr"] <= 200
    # sample is a subset of the input
    assert s1.join(df, ["doc_id", "lang"], "left_anti").count() == 0


def test_rolling_distinct_bounds_window_math(spark):
    """Trailing-3-day union: hand-checkable exact counts, bound flag
    true, and the estimate path merges rather than re-scans."""
    import datetime as dt

    from aws_medallion_etl_spark.operators import sketches

    rows = []
    # day 1: users {1,2}; day 2: {2,3}; day 4: {9}
    for d, us in [(1, [1, 2]), (2, [2, 3]), (4, [9])]:
        for u in us:
            rows.append((dt.datetime(2024, 3, d, 12, 0), u, u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, x long")
    out = {
        str(r["day"]): (r["n_exact"], r["hll_within_bound"])
        for r in sketches.rolling_distinct_bounds(
            df, "ts", "user_id", days=3
        ).collect()
    }
    assert out == {
        "2024-03-01": (2, True),   # {1,2}
        "2024-03-02": (3, True),   # {1,2,3}
        "2024-03-04": (3, True),   # window [2,4]: day2 {2,3} + day4 {9}
    }


# ---------------------------------------------------------------------------
# Bloom filter membership screen
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_deterministic(spark):
    members = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(200)], ["g"]
    )
    bits = sketches.build_bloom(members, "g", width_bits=1 << 12, k=3)
    again = sketches.build_bloom(members, "g", width_bits=1 << 12, k=3)
    assert bits == again                       # md5 buckets, no RNG
    assert len(bits) == (1 << 12) // 64
    # every member must pass: Bloom filters have NO false negatives
    n_pass = members.where(sketches.bloom_contains("g", bits, k=3)).count()
    assert n_pass == 200


def test_bloom_screen_supersets_exact_contamination(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 5 == 0)
    tr = docs.where(F.col("doc_id") % 5 != 0)
    from aws_medallion_etl_spark.operators import text

    eg = text.word_ngrams(ev, "doc_id", "text", n=13, out_col="g")
    bits = sketches.build_bloom(
        eg.select("g").distinct(), "g", width_bits=1 << 17, k=3
    )
    tg = text.word_ngrams(tr, "doc_id", "text", n=13, out_col="g").distinct()
    flagged = {
        r["doc_id"]
        for r in tg.where(sketches.bloom_contains("g", bits, k=3))
        .select("doc_id").distinct().collect()
    }
    exact = {
        r["doc_id"]
        for r in corpus.contamination_hits(
            tr, "doc_id", "text", ev, "doc_id", "text", n=13
        ).collect()
    }
    assert exact <= flagged   # the screen never loses a true hit


def test_bloom_rejects_bad_params(spark):
    df = spark.createDataFrame([("x",)], ["g"])
    import pytest

    with pytest.raises(ValueError, match="multiple of 64"):
        sketches.build_bloom(df, "g", width_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        sketches.build_bloom(df, "g", width_bits=64, k=0)


def test_quantile_bounds_exact_disc_and_contract(spark):
    # group A: 1..100 -> p50 disc = 50 (min v with count_le/n >= .5),
    # p95 disc = 95; group B: constant -> both percentiles = 7
    rows = [("A", i) for i in range(1, 101)] + [("B", 7)] * 10
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        (r["g"], r["pct"]): (r["n_rows"], r["exact_disc"],
                             r["approx_within_rank_bound"])
        for r in sketches.quantile_bounds(
            df, ["g"], "v", probs=(0.5, 0.95)
        ).collect()
    }
    assert out[("A", 50)] == (100, 50, True)
    assert out[("A", 95)] == (100, 95, True)
    assert out[("B", 50)] == (10, 7, True)
    assert out[("B", 95)] == (10, 7, True)


def test_quantile_bounds_ties_use_cumulative_rank(spark):
    # heavy ties: [1,1,1,1,9] -> p50 disc is 1 (count_le(1)/5 = 0.8)
    df = spark.createDataFrame(
        [("g", v) for v in (1, 1, 1, 1, 9)], ["g", "v"]
    )
    r = sketches.quantile_bounds(df, ["g"], "v", probs=(0.5,)).collect()[0]
    assert (r["pct"], r["exact_disc"], r["approx_within_rank_bound"]) == (
        50, 1, True,
    )


def test_record_linkage_scores_fields_and_threshold(spark):
    a = spark.createDataFrame(
        [(1, "B", "john smith", "gold", 100.0),
         (2, "B", "mary jones", "blue", 50.0)],
        ["id", "blk", "name", "seg", "bal"],
    )
    b = spark.createDataFrame(
        [(11, "B", "john smyth", "gold", 100.4),   # 1 edit, seg ok, bal ok
         (12, "B", "completely other", "gold", 100.0),  # only seg+bal hit
         (13, "C", "john smith", "gold", 100.0)],  # right row, wrong block
        ["id", "blk", "name", "seg", "bal"],
    )
    fields = [("name", "levenshtein", 20, 20, 2),
              ("seg", "exact", 5, 5, None),
              ("bal", "abs_diff", 10, 10, 1.0)]
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in fuzzy.record_linkage_scores(
            a, b, "id", "blk", fields, threshold=10
        ).collect()
    }
    # (1,11): +20+5+10 = 35; (1,12): -20+5+10 = -5 (below threshold);
    # (2,11): -20-5-10; (1,13) never scored — blocking contract
    assert got == {(1, 11): 35}
    # NULL on a fuzzy field disagrees; on exact, null-safe equality
    an = spark.createDataFrame(
        [(1, "B", None, None)],
        "id bigint, blk string, name string, seg string",
    )
    bn = spark.createDataFrame(
        [(21, "B", None, None)],
        "id bigint, blk string, name string, seg string",
    )
    fn = [("name", "levenshtein", 20, 20, 2), ("seg", "exact", 5, 5, None)]
    rows = fuzzy.record_linkage_scores(
        an, bn, "id", "blk", fn, threshold=-100
    ).collect()
    assert [(r["id_a"], r["id_b"], r["score"]) for r in rows] == [
        (1, 21, -20 + 5)
    ]
    import pytest

    with pytest.raises(ValueError, match="unknown kinds"):
        fuzzy.record_linkage_scores(
            a, b, "id", "blk", [("name", "soundex", 1, 1, None)], 0
        )
