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
    first verdict. Round 10 head: new round-10 queries (no verdict
    yet), then the two snapshot streaming queries whose readers were
    reimplemented on the partitioned DataSourceStreamReader API this
    round (their latest verdicts predate the rewrite), then the final
    43 queries whose latest driver green is round 6 (VERDICT r9
    "Next round" #1 — this tranche retires the entire rotation debt).
    """
    first = [
        # new round-10 queries — no verdict yet
        "s35_shallow_clone", "s36_table_history",
        "s32_auto_optimize", "s33_cdf_rename_continuity",
        "s34_multi_table_txn",
        # semantic dedup re-contracted this round (auto-scaled seed
        # count, oracle LIMIT formula changed) — re-verdict wanted
        "dedup_semantic_clusters", "e2e_semantic_curation",
        # readers rewritten this round (driver-side -> partitioned);
        # latest greens (r9) predate the rewrite
        "str12_stream_snapshot_tail", "str13_stream_cdf",
        # the 43 round-6-stale queries — the whole remaining debt
        "a3_yearly_rollup", "a4_distinct_counts", "a5_global_minmax",
        "a6_frequency_classify", "corpus_dedup_chunks",
        "corpus_shuffle_shards", "corpus_weighted_sample",
        "dedup_audit_cluster_sizes", "dedup_clusters_merged",
        "dedup_containment", "dedup_cross_source_matrix",
        "dedup_semantic_clusters", "dedup_url_canonical", "dq_date_gaps",
        "dq_skew_report", "dq_winsorize", "e2e_corpus_curation",
        "e2e_semantic_curation", "emb_centroid_coherence", "f_map_funcs",
        "f_pandas_udaf_median", "f_sql_udf", "f_variant_extract",
        "graph_pagerank_hubs", "inc_rollup_merge", "j14_inferred_members",
        "mm_image_metadata", "s18_orc_roundtrip", "s19_jsonl_roundtrip",
        "s20_python_datasource", "s21_binaryfile_scan",
        "s22_schema_evolution_scan", "sketch_rolling_distinct",
        "str8_stream_incremental_dedup", "str9_stream_incremental_clusters",
        "t_bigram_logprob", "t_js_divergence", "t_oov_rate", "t_strip_html",
        "ts_gapfill_interp", "ts_trend_slope", "w13_clean_path_conversions",
        "w14_max_drawdown"
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
