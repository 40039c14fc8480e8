"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-operator query on sf0.001;
``queries()`` exposes the full declared inventory (one entry per
operator family from SURVEY.md §2 plus the training-data extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry (the rest get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_medallion_etl_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: validate -> dedup -> enrich -> conditional agg -> share.

    Revenue per market segment over valid lineitems: the spine of the
    medallion pipeline (P5/P6 validation, W1 dedup, J1 broadcast
    enrichment, A2 conditional aggregation, A9/W7 share-of-total) on
    the sf0.001 star schema.
    """
    from aws_medallion_etl_spark.operators import validate
    from aws_medallion_etl_spark.queries import lineitem_rules

    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    valid, _rejects = validate.split_valid_invalid(li, lineitem_rules())
    enriched = (
        valid.join(orders.select("o_orderkey", "o_custkey"),
                   valid["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    by_segment = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned"),
    )
    from pyspark.sql import Window

    total = F.sum("revenue").over(Window.partitionBy())
    return by_segment.withColumn(
        "revenue_share_pct", F.round(F.col("revenue") * 100.0 / total, 4)
    ).orderBy(F.desc("revenue"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Ordered so queries WITHOUT an established green correctness
    history run FIRST — the harness records ~50 verdicts per round, so
    if the run is ever cut short, the cut should land on entries
    proven green in prior rounds, not on the ones still needing their
    first verdict. Round 15 head (exactly 50 uniques, sized to the
    ~50-verdict rotation budget): first the 17 queries whose CODE the
    round-15 optimization pass restructured (results proven identical
    against the local oracle at sf0.01, the touched set additionally
    at sf0.1 — but changed code should sit under driver scrutiny: the
    MV refresh family's fused at-risk probe / create-time Observation
    / hinted touched-file split, the DML family's driver-side DV
    totals, the overlapped medallion layers and MinHash lifecycle,
    and the state-store sizing of the bounded-key streams), then the
    16 queries whose last driver verdict is round 10 (the stale
    ladder the r14 head deferred; str8/str12/str13/s33/s34/s35 in
    that tranche ALSO sit on round-15-touched DML/index paths), then
    17 of the r11-verdict tranche (alphabetical). The remaining
    r11-verdict queries lead the next ladder. Everything behind the
    head has a verdict from r11-r14; the r14-changed trio
    (str9/sim_topk_ivf_pq/_indexed) and s47/s48/s49's registrations
    all got fresh r14 verdicts and their round-15 code deltas are
    covered by the head's MV-family entries.
    """
    first = [
        # round-15 restructured paths (results oracle-identical):
        # MV refresh family — fused probe, create Observation,
        # hinted touched-file split, driver-side DV totals
        "s47_join_mv_minmax", "s48_rollup_coarsen",
        "s49_cube_from_rollup", "s42_incremental_mv",
        "s43_mv_minmax_avg", "s44_join_mv",
        "str14_stream_mv_refresh",
        # DML commits on the driver-side DV-totals path
        "s25_delete_vectors", "s27_update_restore",
        "s40_row_tracking", "s46_merge_conditional",
        "str11_stream_merge_snapshot",
        # overlapped medallion layers / MinHash index lifecycle
        "e2e_medallion_gold", "dedup_incremental_lsh",
        "dedup_incremental_lsh_appended",
        # bounded-key stateful streams (state-store sizing)
        "str3_stream_running_totals", "str10_stream_pack",
        # the 16 r10-verdict queries (stale ladder; str8/str12/str13/
        # s33/s34/s35 also sit on round-15-touched paths)
        "s33_cdf_rename_continuity", "s34_multi_table_txn",
        "s35_shallow_clone", "s36_table_history",
        "sketch_rolling_distinct", "str12_stream_snapshot_tail",
        "str13_stream_cdf", "str8_stream_incremental_dedup",
        "t_bigram_logprob", "t_js_divergence", "t_oov_rate",
        "t_strip_html", "ts_gapfill_interp", "ts_trend_slope",
        "w13_clean_path_conversions", "w14_max_drawdown",
        # 17 of the r11-verdict tranche (alphabetical)
        "a10_rollup_status_year", "a11_pivot_status_by_year",
        "a12_percentiles", "a7_exact_dedup", "a9_share_of_total",
        "c1_circuit_breaker_stats", "corpus_bm25",
        "corpus_contamination_report", "corpus_decontaminate",
        "corpus_dsir_select", "corpus_mix_sources_tokens",
        "corpus_pack_greedy", "corpus_split_leakage_safe",
        "corpus_trim_dup_spans", "dedup_simhash_rotations",
        "dim_date_calendar", "dq_dataset_fingerprint",
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
