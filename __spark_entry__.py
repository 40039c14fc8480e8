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
    first verdict. Round 14 head (exactly 50 uniques, sized to the
    ~50-verdict rotation budget): the three queries registered this
    round (s47_join_mv_minmax — min/max over the join MV;
    s48_rollup_coarsen — the cube-lattice rewrite;
    s49_cube_from_rollup — the full CUBE from the MV), then the three
    queries the OPTIMIZATION pass restructured or re-parameterized
    (str9_stream_incremental_clusters — batch-restricted pair
    generation; sim_topk_ivf_pq / sim_topk_ivf_pq_indexed — shortlist
    512 fixing the measured sf0.1 ADC boundary; all three oracle-
    re-proven locally at sf0.001/0.01/0.1), then the 11 remaining
    r9-verdict queries (the r13 verdict's named leftovers:
    a1/a2/a14/a15/a16, s1_csv, u4, w8/w9/w10/w11), then 33 of the 50
    r10-verdict queries (alphabetical; the 17 left over —
    s33_cdf_rename_continuity, s34_multi_table_txn, s35_shallow_clone,
    s36_table_history, sketch_rolling_distinct, str12/str13/str8,
    t_bigram_logprob, t_js_divergence, t_oov_rate, t_strip_html,
    ts_gapfill_interp, ts_trend_slope, w13, w14 (str9 promoted above)
    — lead the r15 ladder). s44_join_mv / s43 / s42 / s46 changed CODE
    this round (broadcast guard, min/max machinery, create-time NULL
    check) but their RESULTS are unchanged (re-contracted against the
    oracle locally) and all carry fresh r13 verdicts, so they stay
    behind the head; likewise dedup_clusters_merged (restructured,
    oracle-re-proven, in the head via the r10 tranche) and the
    remaining IVF / MV / LSH queries whose optimized paths were
    oracle-verified result-identical this round. Everything behind
    the head has a verdict from r11-r13.
    """
    first = [
        # the three queries registered this round — no driver verdict yet
        "s47_join_mv_minmax", "s48_rollup_coarsen",
        "s49_cube_from_rollup",
        # the three queries the optimization pass restructured /
        # re-parameterized (oracle-re-proven at all three SFs)
        "str9_stream_incremental_clusters",
        "sim_topk_ivf_pq", "sim_topk_ivf_pq_indexed",
        # the 11 remaining r9-verdict queries
        "a14_histogram", "a15_cube", "a16_unpivot",
        "a1_topk_customers", "a2_conditional_agg_owner",
        "s1_csv_roundtrip", "u4_intersect_except",
        "w10_distribution_ranks", "w11_range_frame",
        "w8_sessionize", "w9_ntile_quartiles",
        # 33 of the 50 r10-verdict queries
        "a3_yearly_rollup", "a4_distinct_counts", "a5_global_minmax",
        "a6_frequency_classify", "corpus_dedup_chunks",
        "corpus_shuffle_shards", "corpus_weighted_sample",
        "dedup_audit_cluster_sizes", "dedup_clusters_merged",
        "dedup_containment", "dedup_cross_source_matrix",
        "dedup_semantic_clusters", "dedup_url_canonical",
        "dq_date_gaps", "dq_skew_report", "dq_winsorize",
        "e2e_corpus_curation", "e2e_semantic_curation",
        "emb_centroid_coherence", "f_map_funcs",
        "f_pandas_udaf_median", "f_sql_udf", "f_variant_extract",
        "graph_pagerank_hubs", "inc_rollup_merge",
        "j14_inferred_members", "mm_image_metadata",
        "s18_orc_roundtrip", "s19_jsonl_roundtrip",
        "s20_python_datasource", "s21_binaryfile_scan",
        "s22_schema_evolution_scan", "s32_auto_optimize",
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
