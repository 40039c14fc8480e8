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
    first verdict. Head of the list for round 4: the 8 queries with no
    recorded verdict in ANY round, plus the round-3 red
    (``s14_bucketed_join``, idempotency fix landed); then everything
    whose only green is round 2 (longest-unrefreshed); twice-green
    rows sit at the back.
    """
    first = [
        # no driver verdict in any round — first priority
        "w8_sessionize", "a10_rollup_status_year", "a11_pivot_status_by_year",
        "a12_percentiles", "dedup_clusters", "sim_topk_ivf",
        "fact_tag_usage_daily", "t_document_filter",
        # round-3 red, fixed this round
        "s14_bucketed_join",
        # green only in round 2 — longest-unrefreshed verdicts next
        "a7_exact_dedup", "a8_dq_null_stats", "a9_share_of_total",
        "dedup_embedding_cosine", "dedup_exact_docs", "dedup_ngram_jaccard",
        "dim_date_calendar", "f_array_funcs", "f_boolean_parse",
        "f_date_funcs", "f_json_extract", "f_math_funcs", "f_string_funcs",
        "o2_rank_multikey", "o3_diagnostics_sample", "p_projection_family",
        "s12_sql_endpoint", "s8_provenance_by_file", "sim_topk_bruteforce",
        "t_fingerprint", "t_lang_id", "t_quality_score", "t_token_count",
        "tags_explode_normalize", "u2_unknown_row", "u3_union_all_report",
        "w4_hash_sk_distinct", "w5_yoy_growth", "w6_trailing_average",
    ]
    ordered = {name: QUERIES[name] for name in first if name in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
