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
    first verdict. Round 11 head (exactly 50 uniques, sized to the
    ~50-verdict rotation budget): the ten queries with NO driver
    verdict yet (registered after the round-10 tranche ran), then 40
    of the 50 queries whose latest driver green is round 7 — the
    freshness ladder (VERDICT r10 "Next round" #1). The ten r7
    stragglers displaced by the new queries lead the r12 ladder.
    Everything behind the head has a verdict from r8-r10.
    """
    first = [
        # no driver verdict yet (registered after the r10 tranche)
        "s37_convert_in_place", "corpus_trim_dup_spans",
        "s38_deep_clone", "s39_insert_overwrite",
        "corpus_dsir_select", "s40_row_tracking", "s41_replace_where",
        "s42_incremental_mv", "mm_decode_pixels", "mm_decode_audio",
        # 40 of the 50 queries whose latest green is round 7
        "a10_rollup_status_year", "a11_pivot_status_by_year",
        "a12_percentiles", "a7_exact_dedup", "a9_share_of_total",
        "c1_circuit_breaker_stats", "corpus_bm25",
        "corpus_contamination_report", "corpus_decontaminate",
        "corpus_mix_sources_tokens", "corpus_pack_greedy",
        "corpus_split_leakage_safe", "dedup_incremental_lsh_appended",
        "dedup_simhash_rotations", "dim_date_calendar",
        "dq_dataset_fingerprint", "dq_mad_outliers", "f_array_funcs",
        "f_boolean_parse", "f_date_funcs", "f_math_funcs",
        "f_string_funcs", "f_url_funcs", "j1_enrich_left_defaults",
        "j2_referential_semi", "j3_orphans_anti", "j4_fk_resolve_fallback",
        "j5_scd2_apply_changes", "j6_joinback_aggregate",
        "j7_scalar_stats_zscore", "o2_rank_multikey",
        "o3_diagnostics_sample", "p5_validation_reject_reasons",
        "p6_validation_split_rejects", "p_projection_family",
        "s11_jdbc_publish_roundtrip", "s12_sql_endpoint",
        "s14_bucketed_join", "s16_file_skipping_scan", "s17_zorder_scan",
        # r7 stragglers displaced into the r12 ladder:
        # s8_provenance_by_file, sim_topk_bruteforce, sim_topk_ivf_appended, sketch_heavy_hitters,
        # str10_stream_pack, str4_stream_dedup, str5_stream_static_join,
        # str6_stream_stream_join, str7_stream_jsonl_ingest,
        # t_unigram_logprob
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
