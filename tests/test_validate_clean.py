"""Validation split / circuit breaker / silver cleaning strategies —
mirrors the reference's bronze-gate and silver-strategy tests
(``Meta_Guideline.md:930-986``, ``1623-1650``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import clean, validate


@pytest.fixture()
def users(spark):
    return spark.createDataFrame(
        [
            ("u1", "alice", "US"),
            ("u2", None, "VN"),      # missing name -> reject
            ("u3", "  ", "DE"),      # blank name -> reject
            ("u4", "dave", "X"),     # bad country length -> reject
            ("u5", "eve", None),     # optional country NULL -> valid
        ],
        "user_id string, user_name string, country_code string",
    )


def _rules():
    return [
        validate.Rule("missing_user_name", validate.null_or_blank("user_name")),
        validate.Rule(
            "bad_country_code",
            F.col("country_code").isNotNull() & (F.length("country_code") != 2),
        ),
    ]


def test_split_valid_invalid(spark, users):
    valid, rejects = validate.split_valid_invalid(users, _rules())
    assert {r.user_id for r in valid.collect()} == {"u1", "u5"}
    got = {r.user_id: r.reject_reason for r in rejects.collect()}
    assert got == {
        "u2": "missing_user_name",
        "u3": "missing_user_name",
        "u4": "bad_country_code",
    }
    assert validate.REJECT_REASON not in valid.columns


def test_first_match_wins(spark):
    df = spark.createDataFrame([("", "XXX")], "user_name string, country_code string")
    tagged = validate.tag_rejects(
        df,
        [
            validate.Rule("missing_user_name", validate.null_or_blank("user_name")),
            validate.Rule("bad_country_code", F.length("country_code") != 2),
        ],
    )
    assert tagged.collect()[0].reject_reason == "missing_user_name"


def test_validation_stats_and_breaker_trip(spark, users):
    tagged = validate.tag_rejects(users, _rules())
    stats = validate.validation_stats(tagged)
    assert stats["total"] == 5
    assert stats["rejected"] == 3
    assert stats["valid"] == 2
    assert stats["by_reason"] == {"missing_user_name": 2, "bad_country_code": 1}
    with pytest.raises(validate.CircuitBreakerError):
        validate.circuit_breaker(stats, threshold=0.10)
    # 60% rejection passes a 70% threshold: gate must NOT trip
    validate.circuit_breaker(stats, threshold=0.70)


def test_impute_missing_with_flags(spark):
    df = spark.createDataFrame(
        [("u1", "US", 5), ("u2", None, None), ("u3", " ", 7)],
        "user_id string, country string, score int",
    )
    out = clean.impute_missing(df, {"country": "XX", "score": 0})
    rows = {r.user_id: r for r in out.collect()}
    assert rows["u2"].country == "XX" and rows["u2"].country_was_imputed
    assert rows["u3"].country == "XX"  # blank string counts as missing
    assert rows["u2"].score == 0 and rows["u2"].score_was_imputed
    assert rows["u1"].country == "US" and not rows["u1"].country_was_imputed
    counts = clean.strategy_counts(out, ["country_was_imputed", "score_was_imputed"])
    assert counts == {"total": 3, "country_was_imputed": 2, "score_was_imputed": 1}


def test_drop_missing(spark):
    df = spark.createDataFrame(
        [("u1", "a"), (None, "b"), ("u3", None)], "user_id string, v string"
    )
    out = clean.drop_missing(df, ["user_id", "v"])
    assert [r.user_id for r in out.collect()] == ["u1"]


def test_explode_tags_json_path(spark):
    df = spark.createDataFrame(
        [
            (1, '["Machine-Learning", "  nlp ", "NLP", ""]'),
            (2, '["vision"]'),
            (3, None),
        ],
        "dataset_id int, tags string",
    )
    out = clean.explode_tags(df, "tags", ["dataset_id"])
    got = {(r.dataset_id, r.tag) for r in out.collect()}
    # normalized, blanks dropped, (id, tag) exact-deduped, NULL json dropped
    assert got == {(1, "machine-learning"), (1, "nlp"), (2, "vision")}


def test_parse_boolean(spark):
    df = spark.createDataFrame(
        [("TRUE",), ("false",), (" True ",), ("yes",), (None,)], "v string"
    )
    out = df.select(clean.parse_boolean("v").alias("b")).collect()
    assert [r.b for r in out] == [True, False, True, None, None]


def test_frequency_classify(spark):
    vals = [("a",)] * 60 + [("b",)] * 38 + [("c",)] * 2
    df = spark.createDataFrame(vals, "v string")
    out = {r.v: r.frequency_class for r in clean.frequency_classify(df, "v", popular_pct=50.0, rare_count=2).collect()}
    assert out == {"a": "popular", "b": "common", "c": "rare"}


def test_histogram_bins_and_clamp(spark):
    from aws_medallion_etl_spark.operators import dq

    # values 0..10 with nbins=5, width 2: 0-1 -> bin0 ... 8-9 -> bin4,
    # and the max value 10 CLAMPS into bin 4 instead of spilling to 5
    df = spark.createDataFrame([(float(i),) for i in range(11)], ["v"])
    got = {r.bin: (r.n, r.bin_min, r.bin_max)
           for r in dq.histogram(df, "v", nbins=5).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0] == (2, 0.0, 1.0)
    assert got[4] == (3, 8.0, 10.0)  # 8, 9, and clamped 10
    assert sum(n for n, _, _ in got.values()) == 11


def test_histogram_degenerate_single_value(spark):
    from aws_medallion_etl_spark.operators import dq

    df = spark.createDataFrame([(5.0,)] * 7, ["v"])
    got = dq.histogram(df, "v", nbins=4).collect()
    assert len(got) == 1
    assert (got[0].bin, got[0].n, got[0].bin_min, got[0].bin_max) == (
        0, 7, 5.0, 5.0,
    )


def test_winsorize_clamps_and_preserves_grain(spark):
    """Winsorize must clamp exactly to the percentile band, keep every
    row, and leave interior values untouched."""
    from aws_medallion_etl_spark.operators import dq

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])],
        "id long, x double",
    )
    out = dq.winsorize(df, "x", 0.10, 0.90, out_col="xw")
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 10
    import numpy as np

    xs = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    lo = float(np.percentile(xs, 10))
    hi = float(np.percentile(xs, 90))
    for i, v in enumerate(xs):
        assert rows[i]["xw"] == min(max(float(v), lo), hi)
    # interior values untouched, tail clamped
    assert rows[9]["xw"] == hi and rows[9]["x"] == 1000.0
    assert rows[4]["xw"] == 5.0


def test_winsorize_approx_close_to_exact(spark):
    """The sketch-based variant lands within the accuracy envelope."""
    from aws_medallion_etl_spark.operators import dq

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = dq.winsorize(orders, "o_totalprice", out_col="w")
    approx = dq.winsorize(orders, "o_totalprice", out_col="w", approx=True)
    e = exact.agg(F.sum("w")).first()[0]
    a = approx.agg(F.sum("w")).first()[0]
    assert abs(e - a) / e < 0.01


def test_date_gaps_islands(spark):
    """Hand-built calendar with two gaps: ranges, sizes, and a
    gapless frame yields zero rows."""
    import datetime as dt

    from aws_medallion_etl_spark.operators import dq

    days = [1, 2, 3, 6, 7, 10]  # gaps: 4-5 (2 days), 8-9 (2 days)
    df = spark.createDataFrame(
        [(dt.date(2024, 5, d),) for d in days], "d date"
    )
    got = {
        str(r["gap_start"]): (str(r["gap_end"]), r["n_days"])
        for r in dq.date_gaps(df, "d").collect()
    }
    assert got == {
        "2024-05-04": ("2024-05-05", 2),
        "2024-05-08": ("2024-05-09", 2),
    }
    dense = spark.createDataFrame(
        [(dt.date(2024, 5, d),) for d in (1, 2, 3)], "d date"
    )
    assert dq.date_gaps(dense, "d").count() == 0


def test_clean_path_conversions_blocker_and_window(spark):
    """Hand-built sequences: blocker between A and B kills the match,
    out-of-window B kills it, blocker after B does not."""
    import datetime as dt

    from aws_medallion_etl_spark.operators import kpi

    T = dt.datetime
    rows = [
        # u1: view -> purchase in 10 min, error AFTER purchase: clean
        (1, 1, "view", T(2024, 1, 1, 10, 0)),
        (2, 1, "purchase", T(2024, 1, 1, 10, 10)),
        (3, 1, "error", T(2024, 1, 1, 10, 20)),
        # u2: view -> error -> purchase: blocked
        (4, 2, "view", T(2024, 1, 1, 10, 0)),
        (5, 2, "error", T(2024, 1, 1, 10, 5)),
        (6, 2, "purchase", T(2024, 1, 1, 10, 10)),
        # u3: view -> purchase after 40 min: out of window
        (7, 3, "view", T(2024, 1, 1, 10, 0)),
        (8, 3, "purchase", T(2024, 1, 1, 10, 40)),
        # u4: view, never purchases
        (9, 4, "view", T(2024, 1, 1, 10, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        r["user_id"]: (r["n_starts"], r["n_clean"], r["total_latency_us"])
        for r in kpi.clean_path_conversions(
            df, "user_id", "ts", "event_type", "view", "purchase", "error",
            within_seconds=1800,
        ).collect()
    }
    assert out[1] == (1, 1, 600 * 1_000_000)
    assert out[2] == (1, 0, 0)
    assert out[3] == (1, 0, 0)
    assert out[4] == (1, 0, 0)


def test_grouped_median_udaf_matches_builtin(spark):
    """UDAF median == builtin percentile(0.5) on odd and even groups."""
    from aws_medallion_etl_spark.operators import udx

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 100.0),
         ("b", 2.0), ("b", 4.0)],
        "k string, v double",
    )
    got = {r["k"]: r["median"]
           for r in udx.grouped_median(df, ["k"], "v").collect()}
    assert got == {"a": 5.0, "b": 3.0}
    builtin = {
        r["k"]: r["m"]
        for r in df.groupBy("k")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    assert got == builtin


def test_winsorize_and_gaps_degenerate_inputs(spark):
    """Single-value winsorize is identity; single-day frame has no gaps."""
    import datetime as dt

    from aws_medallion_etl_spark.operators import dq

    one = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, x double")
    out = dq.winsorize(one, "x", out_col="w").collect()
    assert all(r["w"] == 7.0 for r in out)
    d1 = spark.createDataFrame([(dt.date(2024, 1, 1),)], "d date")
    assert dq.date_gaps(d1, "d").count() == 0


def test_dataset_fingerprint_properties(spark):
    """Additivity over disjoint parts, order/partitioning invariance,
    and single-row sensitivity — the contract that makes the 1-row
    checksum usable as an incremental-vs-rebuild gate."""
    from aws_medallion_etl_spark.operators import dq

    rows = [(i, f"v{i}", None if i % 3 == 0 else f"w{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a string, b string")

    whole = dq.dataset_fingerprint(df).collect()[0]
    assert whole["n_rows"] == 100

    # order/partitioning invariance
    shuffled = dq.dataset_fingerprint(
        df.orderBy(F.desc("a")).repartition(7)).collect()[0]
    assert shuffled["fingerprint"] == whole["fingerprint"]

    # additivity: disjoint halves sum to the whole
    lo = dq.dataset_fingerprint(df.where("id < 50")).collect()[0]
    hi = dq.dataset_fingerprint(df.where("id >= 50")).collect()[0]
    assert lo["fingerprint"] + hi["fingerprint"] == whole["fingerprint"]

    # sensitivity: one changed value moves the sum
    tweaked = df.withColumn(
        "b", F.when(F.col("id") == 42, F.lit("CHANGED")).otherwise(F.col("b"))
    )
    assert (dq.dataset_fingerprint(tweaked).collect()[0]["fingerprint"]
            != whole["fingerprint"])

    # NULL is distinct from the empty string (0x00 canonical token)
    empt = spark.createDataFrame([(1, "", "x")], "id long, a string, b string")
    null = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    assert (dq.dataset_fingerprint(empt).collect()[0]["fingerprint"]
            != dq.dataset_fingerprint(null).collect()[0]["fingerprint"])

    # the additive identity: an empty frame is (0, 0), so folding it
    # into any shard sum is a no-op (and str() of it parses)
    zero = dq.dataset_fingerprint(df.where(F.lit(False))).collect()[0]
    assert (zero["n_rows"], int(zero["fingerprint"])) == (0, 0)


def test_skew_report_salt_recommendation(spark):
    """A key 10x hotter than the mean gets salt ~= its count/mean;
    uniform keys get salt 1 — directly usable as enrich.salted_join's
    salt argument."""
    from aws_medallion_etl_spark.operators import dq

    rows = [(1,)] * 40 + [(k,) for k in range(2, 10) for _ in range(5)]
    df = spark.createDataFrame(rows, "k long")
    out = {r["k"]: r for r in dq.skew_report(df, "k", k=9).collect()}
    # mean = 80/9 ≈ 8.9; hot key 40 -> ceil(40/8.9) = 5
    assert out[1]["recommended_salt"] == 5
    assert all(out[k]["recommended_salt"] == 1 for k in range(2, 10))
    assert out[1]["skew_ratio"] > 4
