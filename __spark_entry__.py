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
    first verdict. Round 12 head (exactly 50 uniques, sized to the
    ~50-verdict rotation budget): the two queries registered this
    round (s43, str14) and the five IVF queries whose RESULTS changed
    this round (n_centroids="auto" + hash-spread k-means init +
    nprobe 7 — all re-contracted against the exact oracle locally),
    then the ten r7 stragglers displaced by the r11 tranche, then 34
    of the 49 queries whose latest driver green is round 8
    (sim_topk_ivf, also r8, rides the changed-results group — 35 of
    the 49 total). The 14 r8-verdict queries left over lead the r13
    ladder. Everything
    behind the head has a verdict from r9-r11.
    """
    first = [
        # registered this round — no driver verdict yet
        "s43_mv_minmax_avg", "str14_stream_mv_refresh",
        # results changed this round (auto centroids / init / nprobe)
        "sim_topk_ivf", "sim_topk_ivf_pq", "sim_topk_ivf_indexed",
        "sim_topk_ivf_pq_indexed", "sim_topk_ivf_appended",
        # the ten r7 stragglers (sim_topk_ivf_appended above is one)
        "s8_provenance_by_file", "sim_topk_bruteforce",
        "sketch_heavy_hitters", "str10_stream_pack",
        "str4_stream_dedup", "str5_stream_static_join",
        "str6_stream_stream_join", "str7_stream_jsonl_ingest",
        "t_unigram_logprob",
        # 34 of the 49 queries whose latest green is round 8
        "a13_grouping_sets", "a8_dq_null_stats",
        "corpus_cluster_representatives", "corpus_hash_split",
        "corpus_mix_sources", "corpus_pack_greedy_subword",
        "corpus_pack_sequences", "corpus_prepare_shards",
        "corpus_redact_pii", "corpus_source_cap",
        "corpus_stratified_sample", "corpus_tfidf_top_terms",
        "corpus_vocab_topk", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_exact_docs",
        "dedup_incremental", "dedup_incremental_lsh",
        "dedup_levenshtein_names", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "dq_profile_orders",
        "e2e_medallion_gold", "emb_quantize_int8", "f_json_extract",
        "fact_tag_usage_daily", "j10_upsert_snapshot",
        "j11_salted_skew_join", "j12_snapshot_diff",
        "j8_asof_prior_event", "j9_range_join_price_bands",
        "mm_binary_features", "mm_frame_sampling",
        # r8 queries deferred to the r13 ladder: s13_sql_subqueries,
        # s23_merge_snapshot, t_document_filter, t_fingerprint,
        # t_lang_id, t_quality_score, t_subword_tokens,
        # tags_explode_normalize, u2_unknown_row, u3_union_all_report,
        # w1_dedup_keep_newest, w1b_dedup_max_by, w4_hash_sk_distinct,
        # w5_yoy_growth
    ]
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {name: QUERIES[name] for name in first}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
