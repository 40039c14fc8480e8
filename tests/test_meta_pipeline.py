"""The reference's own 5-table medallion flow, end-to-end on synthetic
raw CSVs: contract read → typed bronze (validate+quarantine) → silver
(NK dedup) → gold (SCD2 dim_user, fact_dataset_owner_daily with the
total=private+public invariant, bridge_dataset_tag, top_tags KPI).

This mirrors the reference's integration test intent
(``copilot-instructions.md:138-143``: full bronze→silver→gold flows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark import io, pipeline, schemas
from aws_medallion_etl_spark.operators import clean, dedup, facts, kpi, scd

RUN = "2024-06-01"


@pytest.fixture()
def raw_dir(tmp_path):
    (tmp_path / "Users.csv").write_text(
        "Id,UserName,RegisterDate,Country\n"
        "1,alice,2020-01-05 10:00:00,US\n"
        "1,alice,2021-03-01 09:00:00,VN\n"      # dup NK — newer signup wins
        "2,bob,2020-02-01 08:00:00,USA\n"       # bad country -> reject
        "3,carol,2020-03-01 07:00:00,\n"        # optional country empty -> valid
        "4,,2020-04-01 06:00:00,DE\n"           # missing name -> reject
    )
    (tmp_path / "Datasets.csv").write_text(
        "Id,Title,OwnerUserId,CreationDate,LastActivityDate,IsPrivate,TotalViews,TotalDownloads\n"
        "d1,Numbers,1,2022-01-01 00:00:00,2022-06-01 00:00:00,TRUE,100,10\n"
        "d2,Words,1,2022-02-01 00:00:00,2022-07-01 00:00:00,FALSE,50,5\n"
        "d3,Sounds,3,2022-03-01 00:00:00,2022-01-01 00:00:00,FALSE,10,1\n"  # updated<created -> reject
        "d4,Images,9,2022-04-01 00:00:00,2022-08-01 00:00:00,false,75,2\n"  # owner 9 unknown
    )
    (tmp_path / "Tags.csv").write_text(
        'DatasetId,Tags\n'
        'd1,"[""Machine-Learning"", ""NLP "", ""nlp""]"\n'
        'd2,"[""vision""]"\n'
    )
    return str(tmp_path)


def test_meta_flow_end_to_end(spark, raw_dir, tmp_path):
    lake = str(tmp_path / "lake")

    # --- bronze: contract CSV -> typed -> validated/quarantined
    sources = {}
    for name, fname in [("users", "Users.csv"), ("datasets", "Datasets.csv"), ("tags", "Tags.csv")]:
        contract = schemas.TABLES[name]
        raw = io.read_csv_contract(
            spark, f"{raw_dir}/{fname}", contract.raw_schema, rename=contract.rename
        )
        sources[name] = schemas.apply_types(raw, contract)

    specs = {n: schemas.to_table_spec(schemas.TABLES[n]) for n in sources}
    for s in specs.values():
        s.reject_threshold = 0.5  # the 5-row fixture is deliberately 40% dirty

    reports = {"bronze": {}, "silver": {}}
    for n, spec in specs.items():
        reports["bronze"][n] = pipeline.run_bronze_table(spark, spec, sources[n], lake, RUN)
        reports["silver"][n] = pipeline.run_silver_table(spark, spec, lake, RUN)

    assert reports["bronze"]["users"]["rejected"] == 2  # USA + missing name
    assert reports["bronze"]["users"]["by_reason"] == {
        "bad_country_code": 1, "missing_user_name": 1,
    }
    assert reports["bronze"]["datasets"]["by_reason"] == {"updated_before_created": 1}
    # quarantine carries the reason column (S6)
    rej = spark.read.parquet(f"{lake}/bronze/_rejects/users/run_date={RUN}")
    assert {r.reject_reason for r in rej.collect()} == {"bad_country_code", "missing_user_name"}
    # silver users deduped the NK-duplicate (keep newest signup)
    silver_users = spark.read.parquet(f"{lake}/silver/users")
    u1 = silver_users.filter(F.col("user_id") == "1").collect()
    assert len(u1) == 1 and u1[0].country_code == "VN"

    # --- gold: SCD2 dim_user from history + Unknown row
    hist = spark.read.parquet(f"{lake}/silver/users")
    dim_user = scd.scd2_from_history(
        hist.select("user_id", "user_name", "country_code", "signup_ts"),
        nk=["user_id"], attrs=["user_name", "country_code"], order_col="signup_ts",
    )
    dim_user = scd.hash_surrogate_key(dim_user, "user_sk", ["user_id", "effective_start_ts"])
    import datetime
    dim_user = scd.with_unknown_row(dim_user, {
        "user_sk": 0, "user_id": "-1", "user_name": "Unknown", "country_code": "XX",
        "effective_start_ts": datetime.datetime(1900, 1, 1),
        "effective_end_ts": datetime.datetime(9999, 12, 31),
        "is_current": True,
    })
    assert dim_user.filter("user_sk = 0").count() == 1

    # --- fact_dataset_owner_daily: conditional aggregate + SK=0 FK fallback
    silver_ds = spark.read.parquet(f"{lake}/silver/datasets")
    fact = facts.conditional_aggregate(
        silver_ds, ["owner_user_id"],
        {"private_datasets_count": F.col("is_private"),
         "public_datasets_count": ~F.col("is_private")},
        extra_aggs=[F.sum("total_views").alias("total_views")],
        count_name="datasets_count",
    )
    facts.check_balance(fact, "datasets_count",
                        ["private_datasets_count", "public_datasets_count"])
    resolved = facts.resolve_fk(
        fact, dim_user.filter("is_current"), "owner_user_id", "user_id", "user_sk"
    )
    stats = facts.fk_miss_stats(resolved)
    assert stats["misses"] == 1  # owner 9 has no dim row -> SK=0
    assert resolved.filter("owner_user_id = '9'").collect()[0].user_sk == 0
    facts.check_grain(resolved, ["owner_user_id"])

    # --- bridge_dataset_tag + top_tags KPI (JSON tags path)
    silver_tags = spark.read.parquet(f"{lake}/silver/tags")
    bridge = clean.explode_tags(silver_tags, "tags", ["dataset_id"])
    got = {(r.dataset_id, r.tag) for r in bridge.collect()}
    assert got == {("d1", "machine-learning"), ("d1", "nlp"), ("d2", "vision")}
    top = kpi.top_k(bridge, ["tag"], 2)
    assert [r.tag for r in top.collect()][0] in {"machine-learning", "nlp", "vision"}

    # --- gold layer written + queryable through the SQL endpoint (S10/S12)
    io.write_parquet(resolved.withColumn("run_date", F.lit(RUN)),
                     f"{lake}/gold/fact_dataset_owner_daily", partition_by=["run_date"])
    io.register_layer(spark, f"{lake}/gold", ["fact_dataset_owner_daily"], prefix="gold_")
    n = io.sql(spark, "SELECT sum(datasets_count) AS n FROM gold_fact_dataset_owner_daily").collect()[0].n
    assert n == 3  # d1, d2, d4 (d3 rejected)
