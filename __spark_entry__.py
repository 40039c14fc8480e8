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
    first verdict. Head of the list for round 5: the 9 events
    consumers broken by round 4's loader bug (the two never-green ones
    — ``w8_sessionize``, ``fact_tag_usage_daily`` — first, loader fix
    landed this round); then every query whose only green is round 3
    (longest-unrefreshed); the round-4-refreshed rows sit at the back.
    """
    first = [
        # never green in ANY round (events loader broke them in r4),
        # plus the round-5 additions awaiting their first verdict — first
        "w8_sessionize", "fact_tag_usage_daily", "sim_topk_ivf_indexed",
        "t_repetition_ngrams", "corpus_source_cap", "dedup_incremental",
        "str2_stream_sessionize", "str3_stream_running_totals",
        # schema extended this round (BPE token column) — re-prove
        "t_token_count", "dq_profile_orders", "emb_quantize_int8",
        "j12_snapshot_diff", "corpus_mix_sources", "w12_funnel_conversion",
        "dedup_incremental_lsh", "s15_sorted_compact_roundtrip",
        # red in r4 via the same loader bug, fixed this round
        "a8_dq_null_stats", "w6_trailing_average", "f_json_extract",
        # stale-broken: green in r3 but events consumers, must re-prove
        "j8_asof_prior_event", "w2w3_scd2_from_history", "w11_range_frame",
        "str1_stream_windowed_counts",
        # green only in round 3 — longest-unrefreshed verdicts next
        "e2e_medallion_gold", "s1_csv_roundtrip", "s45_sink_roundtrip",
        "s6_reject_quarantine_roundtrip", "s13_sql_subqueries",
        "corpus_hash_split", "corpus_pack_sequences", "corpus_tfidf_top_terms",
        "corpus_vocab_topk", "corpus_redact_pii", "corpus_cluster_representatives",
        "corpus_stratified_sample", "corpus_prepare_shards",
        "mm_binary_features", "mm_frame_sampling",
        "j9_range_join_price_bands", "j10_upsert_snapshot", "j11_salted_skew_join",
        "a13_grouping_sets", "w9_ntile_quartiles", "w10_distribution_ranks",
        "u4_intersect_except", "sketch_distinct_bounds",
        "dedup_levenshtein_names",
        # green only in round 2 — oldest verdicts of all
        "dedup_minhash_lsh", "dedup_simhash", "sim_topk_lsh",
        # single r3 green for the A-row family
        "a1_topk_customers", "a2_conditional_agg_owner", "a3_yearly_rollup",
        "a4_distinct_counts", "a5_global_minmax", "a6_frequency_classify",
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
