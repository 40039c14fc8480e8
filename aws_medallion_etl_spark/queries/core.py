"""Core relational families: validation/circuit-breaker (P/C), W1 dedup,
joins (J), aggregations (A), windows (W), set ops (U), scalar function
families + dim_date, and the S/O/P provenance/SQL-endpoint surfaces.

Split from the monolithic queries.py in round 10; registration order
is preserved by the package __init__ importing families in original
file order."""

from __future__ import annotations

from aws_medallion_etl_spark.queries._base import (
    F,
    _scratch,
    _t,
    clean,
    dedup,
    dims,
    enrich,
    facts,
    kpi,
    query,
    scd,
    text,
    validate,
)

# ---------------------------------------------------------------------------
# P5/P6/C1 — validation rules, reject split, circuit-breaker stats
# ---------------------------------------------------------------------------

def lineitem_rules() -> list[validate.Rule]:
    # Built lazily: Column expressions need an active SparkContext.
    return [
        validate.Rule("excessive_discount", F.col("l_discount") > 0.08),
        validate.Rule("excessive_tax", F.col("l_tax") > 0.06),
        validate.Rule("bulk_quantity", F.col("l_quantity") > 45),
    ]

_LINEITEM_REASON_SQL = """
    CASE WHEN l_discount > 0.08 THEN 'excessive_discount'
         WHEN l_tax > 0.06 THEN 'excessive_tax'
         WHEN l_quantity > 45 THEN 'bulk_quantity'
    END
"""


@query(
    "p5_validation_reject_reasons",
    f"""
    SELECT coalesce({_LINEITEM_REASON_SQL}, 'valid') AS reason,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def p5_validation_reject_reasons(spark, sf_dir):
    """CASE-WHEN reject-reason chain (P5): rows per first-match reason."""
    tagged = validate.tag_rejects(_t(spark, sf_dir, "lineitem"), lineitem_rules())
    return tagged.groupBy(
        F.coalesce(F.col(validate.REJECT_REASON), F.lit("valid")).alias("reason")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "p6_validation_split_rejects",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
           {_LINEITEM_REASON_SQL} AS reject_reason
    FROM lineitem
    WHERE {_LINEITEM_REASON_SQL} IS NOT NULL
    """,
)
def p6_validation_split_rejects(spark, sf_dir):
    """Valid/invalid split (P6): the quarantine side with its reason."""
    _, rejects = validate.split_valid_invalid(
        _t(spark, sf_dir, "lineitem"), lineitem_rules()
    )
    return rejects.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax",
        validate.REJECT_REASON,
    )


@query(
    "c1_circuit_breaker_stats",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS total,
           CAST(count({_LINEITEM_REASON_SQL}) AS BIGINT) AS rejected,
           CAST(count(*) - count({_LINEITEM_REASON_SQL}) AS BIGINT) AS valid,
           round(count({_LINEITEM_REASON_SQL}) * 1.0 / count(*), 6) AS rejection_rate
    FROM lineitem
    """,
)
def c1_circuit_breaker_stats(spark, sf_dir):
    """Gate metrics (C1) as one wide aggregate — a single scan."""
    tagged = validate.tag_rejects(_t(spark, sf_dir, "lineitem"), lineitem_rules())
    rej = F.col(validate.REJECT_REASON).isNotNull()
    return tagged.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(rej.cast("long")).alias("rejected"),
        F.sum((~rej).cast("long")).alias("valid"),
        F.round(F.sum(rej.cast("long")) / F.count(F.lit(1)), 6).alias("rejection_rate"),
    )


# ---------------------------------------------------------------------------
# W1 — natural-key dedup keep-newest (window and max_by strategies)
# ---------------------------------------------------------------------------

_W1_ORDER = [
    "l_shipdate", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey",
    "l_linenumber", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
]
_W1_SQL = """
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_shipdate DESC, l_quantity DESC, l_extendedprice DESC,
                 l_partkey DESC, l_suppkey DESC, l_linenumber DESC,
                 l_discount DESC, l_tax DESC, l_returnflag DESC, l_linestatus DESC
    ) = 1
"""


@query("w1_dedup_keep_newest", _W1_SQL)
def w1_dedup_keep_newest(spark, sf_dir):
    """Window-strategy NK dedup (W1): newest lineitem per order."""
    out = dedup.dedup_by_key(
        _t(spark, sf_dir, "lineitem"), ["l_orderkey"], [F.desc(c) for c in _W1_ORDER]
    )
    return out.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


@query("w1b_dedup_max_by", _W1_SQL)
def w1b_dedup_max_by(spark, sf_dir):
    """Aggregation-strategy NK dedup (W1 scale path): same answer via max_by."""
    out = dedup.dedup_max_by(_t(spark, sf_dir, "lineitem"), ["l_orderkey"], _W1_ORDER)
    return out.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


# ---------------------------------------------------------------------------
# J — join family
# ---------------------------------------------------------------------------


@query(
    "j1_enrich_left_defaults",
    """
    SELECT o.o_orderkey, o.o_custkey,
           coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
           coalesce(c.c_nationkey, -1) AS c_nationkey
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal >= 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def j1_enrich_left_defaults(spark, sf_dir):
    """Left-join enrichment + Unknown defaults (J1/P10): broadcast dim."""
    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .select("c_custkey", "c_mktsegment", "c_nationkey")
    )
    orders = _t(spark, sf_dir, "orders")
    out = enrich.enrich_left(
        orders,
        dim,
        on=orders["o_custkey"] == dim["c_custkey"],
        defaults={"c_mktsegment": "UNKNOWN", "c_nationkey": -1},
    )
    return out.select("o_orderkey", "o_custkey", "c_mktsegment", "c_nationkey")


@query(
    "j2_referential_semi",
    """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
    GROUP BY l_returnflag
    """,
)
def j2_referential_semi(spark, sf_dir):
    """Referential filter (J2) as LEFT SEMI — no duplicate amplification."""
    li = _t(spark, sf_dir, "lineitem")
    fo = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    kept = enrich.referential_filter(li, fo, on=li["l_orderkey"] == fo["o_orderkey"])
    return kept.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


@query(
    "j3_orphans_anti",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def j3_orphans_anti(spark, sf_dir):
    """FK-integrity / orphans (J3) as LEFT ANTI."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    out = enrich.orphans(cust, recent, on=cust["c_custkey"] == recent["o_custkey"])
    return out.select("c_custkey", "c_mktsegment")


@query(
    "j4_fk_resolve_fallback",
    """
    SELECT CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS misses,
           CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS mapped
    FROM orders o
    LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 2500) d
      ON o.o_custkey = d.c_custkey
    """,
)
def j4_fk_resolve_fallback(spark, sf_dir):
    """Late-arriving FK lookup (J4): SK=0 fallback + miss accounting in one scan."""
    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 2500)
        .select("c_custkey", (F.col("c_custkey") + 1).alias("customer_sk"))
    )
    resolved = facts.resolve_fk(
        _t(spark, sf_dir, "orders"), dim, "o_custkey", "c_custkey", "customer_sk"
    )
    return resolved.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("__fk_miss").cast("long")).alias("misses"),
        F.sum((~F.col("__fk_miss")).cast("long")).alias("mapped"),
    )


@query(
    "j5_scd2_apply_changes",
    """
    WITH dim0 AS (
        SELECT c_custkey, c_mktsegment, c_nationkey,
               TIMESTAMP '2020-01-01' AS st, TIMESTAMP '9999-12-31' AS en, TRUE AS cur
        FROM customer
    ),
    upd AS (
        SELECT CASE WHEN c_custkey % 3 = 2 THEN c_custkey + 1000000 ELSE c_custkey END AS c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN 'PREMIUM' ELSE c_mktsegment END AS c_mktsegment,
               c_nationkey, TIMESTAMP '2024-06-01' AS ch
        FROM customer
    ),
    j AS (
        SELECT d.c_custkey, d.c_mktsegment, d.c_nationkey, d.st, d.en, d.cur,
               u.c_mktsegment AS um, u.c_nationkey AS un, u.ch
        FROM dim0 d LEFT JOIN upd u USING (c_custkey)
    ),
    merged AS (
        SELECT c_custkey, c_mktsegment, c_nationkey, st, en, cur
        FROM j
        WHERE ch IS NULL
           OR (c_mktsegment IS NOT DISTINCT FROM um AND c_nationkey IS NOT DISTINCT FROM un)
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_nationkey, st, ch, FALSE
        FROM j
        WHERE ch IS NOT NULL
          AND NOT (c_mktsegment IS NOT DISTINCT FROM um AND c_nationkey IS NOT DISTINCT FROM un)
        UNION ALL
        SELECT u.c_custkey, u.c_mktsegment, u.c_nationkey, u.ch, TIMESTAMP '9999-12-31', TRUE
        FROM upd u LEFT JOIN dim0 d USING (c_custkey)
        WHERE d.st IS NULL
           OR NOT (d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment
                   AND d.c_nationkey IS NOT DISTINCT FROM u.c_nationkey)
    )
    SELECT c_custkey, c_mktsegment, c_nationkey,
           strftime(st, '%Y-%m-%d %H:%M:%S') AS effective_start_ts,
           strftime(en, '%Y-%m-%d %H:%M:%S') AS effective_end_ts,
           cur AS is_current
    FROM merged
    """,
)
def j5_scd2_apply_changes(spark, sf_dir):
    """Incremental SCD2 merge (J5/U1): close-out + new versions + new keys."""
    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.lit("2020-01-01").cast("timestamp").alias("effective_start_ts"),
        F.lit(scd.HIGH_DATE).cast("timestamp").alias("effective_end_ts"),
        F.lit(True).alias("is_current"),
    )
    upd = cust.select(
        F.when(F.col("c_custkey") % 3 == 2, F.col("c_custkey") + 1000000)
        .otherwise(F.col("c_custkey"))
        .alias("c_custkey"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("PREMIUM"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_nationkey",
        F.lit("2024-06-01").cast("timestamp").alias("change_ts"),
    )
    out = scd.scd2_apply_changes(
        dim, upd, ["c_custkey"], ["c_mktsegment", "c_nationkey"], "change_ts"
    )
    # The declared output carries effective dates as strings: the SCD2
    # HIGH_DATE sentinel (9999-12-31) is outside pandas datetime64[ns]
    # range (max 2262-04-11), so a timestamp output would overflow the
    # harness's pandas conversion. Operator semantics stay timestamp.
    return out.select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.date_format("effective_start_ts", "yyyy-MM-dd HH:mm:ss").alias("effective_start_ts"),
        F.date_format("effective_end_ts", "yyyy-MM-dd HH:mm:ss").alias("effective_end_ts"),
        "is_current",
    )


@query(
    "j6_joinback_aggregate",
    """
    SELECT l.l_partkey, CAST(count(*) AS BIGINT) AS n_above
    FROM lineitem l
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY 1) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity > a.avg_qty
    GROUP BY l.l_partkey
    """,
)
def j6_joinback_aggregate(spark, sf_dir):
    """Join-back of an aggregate (J6): rows above their group mean."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    out = enrich.enrich_left(li, avg_qty, on="l_partkey")
    return (
        out.filter(F.col("l_quantity") > F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@query(
    "j7_scalar_stats_zscore",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_outliers
    FROM orders
    CROSS JOIN (SELECT avg(o_totalprice) AS mu, stddev(o_totalprice) AS sigma FROM orders) s
    WHERE abs((o_totalprice - mu) / sigma) > 2
    GROUP BY o_orderstatus
    """,
)
def j7_scalar_stats_zscore(spark, sf_dir):
    """1-row stats cross join (J7): z-score outliers per status."""
    orders = _t(spark, sf_dir, "orders")
    stats = orders.agg(
        F.avg("o_totalprice").alias("mu"), F.stddev("o_totalprice").alias("sigma")
    )
    out = enrich.with_scalar_stats(orders, stats)
    z = (F.col("o_totalprice") - F.col("mu")) / F.col("sigma")
    return (
        out.filter(F.abs(z) > 2)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )


@query(
    "j8_asof_prior_event",
    """
    WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
               max_by(value, event_id) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           c.cts AS prior_click_ts, c.click_value AS prior_click_value
    FROM events e
    ASOF LEFT JOIN clicks c
        ON e.user_id = c.user_id AND CAST(e.ts AS TIMESTAMP) > c.cts
    """,
)
def j8_asof_prior_event(spark, sf_dir):
    """As-of join (extension): attribute each event to the user's most
    recent STRICTLY-earlier click. Oracle is DuckDB's native ASOF JOIN;
    the Spark side is the union + running-last plan in
    ``enrich.asof_join`` (one shuffle, no candidate-pair blowup).
    Right side is pre-deduped per (user, ts) so ties are deterministic.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("cts"))
        .agg(F.max_by("value", "event_id").alias("click_value"))
        .select("user_id", "cts", "click_value")
    )
    out = enrich.asof_join(
        ev.select("event_id", "user_id", "ts"),
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="cts",
        direction="backward",
        strict=True,
        prefix="prior_click_",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("prior_click_cts").alias("prior_click_ts"),
        F.col("prior_click_click_value").alias("prior_click_value"),
    )


@query(
    "j9_range_join_price_bands",
    """
    WITH bands AS (
        SELECT CAST(i AS BIGINT) AS band_id, i * 50000.0 AS lo,
               (i + 1) * 50000.0 AS hi
        FROM range(10) t(i)
    )
    SELECT band_id, lo, hi,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS sum_price
    FROM bands LEFT JOIN orders
        ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY 1, 2, 3
    """,
)
def j9_range_join_price_bands(spark, sf_dir):
    """Range (interval) join: orders bucketed into price bands.

    ``enrich.range_join`` broadcasts the 10-row interval table (BNLJ —
    the right plan for dim-sized intervals; the binned equi-join path
    is the scale lever, pinned equal by pytest).
    """
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = enrich.range_join(orders, bands, "o_totalprice", "lo", "hi")
    per_band = joined.groupBy("band_id", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    return (
        bands.join(per_band.drop("lo", "hi"), "band_id", "left")
        .select(
            "band_id", "lo", "hi",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("sum_price", F.lit(0.0)).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# A — aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_topk_customers",
    """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_custkey
    ORDER BY cnt DESC, o_custkey LIMIT 10
    """,
)
def a1_topk_customers(spark, sf_dir):
    """Group-count top-k (A1/O1): TakeOrderedAndProject, deterministic ties."""
    return kpi.top_k(_t(spark, sf_dir, "orders"), ["o_custkey"], 10)


@query(
    "a2_conditional_agg_owner",
    """
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS orders_count,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_count,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders GROUP BY o_custkey
    """,
)
def a2_conditional_agg_owner(spark, sf_dir):
    """Conditional multi-aggregate (A2) — the fact_dataset_owner_daily shape."""
    return facts.conditional_aggregate(
        _t(spark, sf_dir, "orders"),
        ["o_custkey"],
        {
            "urgent_count": F.col("o_orderpriority") == "1-URGENT",
            "open_count": F.col("o_orderstatus") == "O",
        },
        extra_aggs=[F.round(F.sum("o_totalprice"), 2).alias("total_spend")],
        count_name="orders_count",
    )


@query(
    "a3_yearly_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(sum(o_totalprice), 2) AS sum_price,
           round(avg(o_totalprice), 2) AS avg_price,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders GROUP BY 1
    """,
)
def a3_yearly_rollup(spark, sf_dir):
    """Yearly multi-metric rollup (A3/A5)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "a4_distinct_counts",
    """
    SELECT CAST(a AS BIGINT) AS n_parts, CAST(b AS BIGINT) AS n_part_supp
    FROM (SELECT count(DISTINCT l_partkey) AS a FROM lineitem),
         (SELECT count(*) AS b FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
    """,
)
def a4_distinct_counts(spark, sf_dir):
    """Exact distinct counts (A4), single- and multi-column."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


@query(
    "a5_global_minmax",
    """
    SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_discount), 4) AS avg_discount
    FROM lineitem
    """,
)
def a5_global_minmax(spark, sf_dir):
    """Global min/max/sum/avg aggregates (A5)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_discount"),
    )


@query(
    "a6_frequency_classify",
    """
    WITH f AS (SELECT p_brand, count(*) AS cnt FROM part GROUP BY 1),
         t AS (SELECT sum(cnt) AS tot FROM f)
    SELECT p_brand, CAST(cnt AS BIGINT) AS cnt,
           CASE WHEN cnt * 100.0 >= tot * 5.0 THEN 'popular'
                WHEN cnt <= 2 THEN 'rare'
                ELSE 'common' END AS frequency_class
    FROM f, t
    """,
)
def a6_frequency_classify(spark, sf_dir):
    """Frequency + threshold classification (A6)."""
    return clean.frequency_classify(
        _t(spark, sf_dir, "part"), "p_brand", popular_pct=5.0, rare_count=2
    )


@query(
    "a7_exact_dedup",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
)
def a7_exact_dedup(spark, sf_dir):
    """Exact duplicate removal (A7): dropDuplicates == SELECT DISTINCT."""
    return dedup.exact_dedup(
        _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    )


@query(
    "a8_dq_null_stats",
    """
    SELECT CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
           CAST(sum(CASE WHEN trim(event_type) = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_event_type
    FROM events
    """,
)
def a8_dq_null_stats(spark, sf_dir):
    """DQ grouped stats (A8): per-field null/blank counts in ONE aggregate."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_id"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.sum((F.trim("event_type") == "").cast("long")).alias("blank_event_type"),
    )


@query(
    "j12_snapshot_diff",
    """
    WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    new AS (
        SELECT o_orderkey,
               o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN round(o_totalprice + 10.0, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_keys
    FROM (
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ) GROUP BY change_type
    """,
)
def j12_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation (extension J12): classify every key of
    two table materializations as added / removed / changed /
    unchanged via ONE full outer join with null-safe comparison
    (``scd.snapshot_diff``) — the CDC audit that validates an upsert
    actually landed. The 'new' snapshot is derived in-query
    (price bump on keys % 11, drop keys % 97, add shifted keys % 101)
    so the expected mix is deterministic."""
    old = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = old.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.round(F.col("o_totalprice") + 10.0, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    added = old.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100000000
    )
    new = base.unionByName(added)
    diff = scd.snapshot_diff(old, new, ["o_orderkey"])
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_keys"))


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
            AS null_frac,
        CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
    for c in _PROFILE_COLS
)


@query("dq_profile_orders", _PROFILE_SQL)
def dq_profile_orders(spark, sf_dir):
    """Whole-table column profile (DQ framework summary): null counts,
    null fraction, and exact distinct cardinality for every profiled
    column in ONE scan + one aggregate (``dq.profile``); the oracle
    pays one scan per column to say the same thing."""
    from aws_medallion_etl_spark.operators import dq

    return dq.profile(_t(spark, sf_dir, "orders"), _PROFILE_COLS)


@query(
    "a9_share_of_total",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct_of_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def a9_share_of_total(spark, sf_dir):
    """Percentage-of-total via unbounded window (A9/W7)."""
    return kpi.share_of_total(_t(spark, sf_dir, "orders"), ["o_orderstatus"])


# ---------------------------------------------------------------------------
# W — windows
# ---------------------------------------------------------------------------


@query(
    "w2w3_scd2_from_history",
    """
    WITH e AS (
        SELECT user_id, event_type, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    h AS (
        SELECT user_id, event_type, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    v AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS ver
        FROM h
    ),
    c AS (
        SELECT user_id, ver, min(ts) AS effective_start_ts,
               max(event_type) AS event_type
        FROM v GROUP BY 1, 2
    )
    SELECT user_id, event_type,
           strftime(effective_start_ts, '%Y-%m-%d %H:%M:%S') AS effective_start_ts,
           strftime(coalesce(lead(effective_start_ts) OVER (PARTITION BY user_id
                    ORDER BY effective_start_ts), TIMESTAMP '9999-12-31'),
                    '%Y-%m-%d %H:%M:%S') AS effective_end_ts,
           lead(effective_start_ts) OVER (PARTITION BY user_id
                    ORDER BY effective_start_ts) IS NULL AS is_current
    FROM c
    """,
)
def w2w3_scd2_from_history(spark, sf_dir):
    """SCD2 initial load (W2+W3): lag change detection + lead date chaining."""
    ev = dedup.dedup_max_by(
        _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id"),
        ["user_id", "ts"],
        ["event_id"],
    )
    out = scd.scd2_from_history(
        ev.select("user_id", "event_type", "ts"),
        nk=["user_id"],
        attrs=["event_type"],
        order_col="ts",
    )
    # String-cast the effective dates (HIGH_DATE overflows pandas
    # datetime64[ns] in the harness compare; see j5 note).
    return out.select(
        "user_id", "event_type",
        F.date_format("effective_start_ts", "yyyy-MM-dd HH:mm:ss").alias("effective_start_ts"),
        F.date_format("effective_end_ts", "yyyy-MM-dd HH:mm:ss").alias("effective_end_ts"),
        F.col("is_current"),
    )


@query(
    "w4_hash_sk_distinct",
    "SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys FROM customer",
)
def w4_hash_sk_distinct(spark, sf_dir):
    """Hash surrogate keys (W4 scale path): distinct SKs == distinct NKs."""
    dim = scd.hash_surrogate_key(
        _t(spark, sf_dir, "customer"), "customer_sk", ["c_custkey"]
    )
    return dim.agg(F.count_distinct("customer_sk").alias("n_keys"))


@query(
    "w5_yoy_growth",
    """
    WITH y AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT order_year, n_orders,
           CASE WHEN lag(n_orders) OVER (ORDER BY order_year) IS NOT NULL
                     AND lag(n_orders) OVER (ORDER BY order_year) != 0
                THEN round((n_orders - lag(n_orders) OVER (ORDER BY order_year)) * 100.0
                           / lag(n_orders) OVER (ORDER BY order_year), 4)
           END AS yoy_growth_pct
    FROM y
    """,
)
def w5_yoy_growth(spark, sf_dir):
    """YoY growth via lag (W5) over the yearly rollup."""
    yearly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return kpi.yoy_growth(yearly, "order_year", "n_orders")


@query(
    "w6_trailing_average",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    )
    SELECT day, n,
           round(avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 4)
               AS trailing_avg
    FROM d
    """,
)
def w6_trailing_average(spark, sf_dir):
    """Trailing-frame average (W6): the anomaly baseline window."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return kpi.trailing_average(daily, "day", "n", preceding=6, closing=1)


@query(
    "w8_sessionize",
    """
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    flags AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flags
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY 1, 2
    """,
)
def w8_sessionize(spark, sf_dir):
    """Batch sessionization (extension): 30-minute-gap sessions per user,
    rolled up to session bounds + event counts. One shuffle total —
    the lag flag, the running session number, and the rollup all share
    the user_id partitioning."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return kpi.session_stats(
        ev, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    ).select("user_id", "session_idx", "n_events", "session_start", "session_end")


@query(
    "a10_rollup_status_year",
    """
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(grouping(o_orderstatus) * 2 + grouping(year(o_orderdate)) AS BIGINT)
               AS grouping_level
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))
    """,
)
def a10_rollup_status_year(spark, sf_dir):
    """ROLLUP hierarchy totals: (status, year) → (status) → grand total
    in ONE pass. Spark plans rollup as a single expanded aggregate —
    map-side partial aggregation still applies, so the extra grouping
    sets cost one Expand, not extra scans. grouping_level
    disambiguates NULLs from subtotal rows vs data NULLs."""
    orders = _t(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    return (
        orders.rollup(F.col("o_orderstatus"), year.alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.grouping_id().alias("grouping_level"),
        )
        .select(
            "o_orderstatus",
            F.col("order_year").cast("int").alias("order_year"),
            "n_orders", "revenue", "grouping_level",
        )
    )


@query(
    "a12_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 2) AS p90
    FROM orders GROUP BY 1
    """,
)
def a12_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (one sort-based
    aggregate). The scale path is ``percentile_approx`` (mergeable
    KLL-style sketch, no per-group sort buffer) — its error bound vs
    this exact result is pinned by pytest."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 2).alias("p90"),
    )


@query(
    "a11_pivot_status_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending
    FROM orders GROUP BY 1
    """,
)
def a11_pivot_status_by_year(spark, sf_dir):
    """Pivot (long → wide): order counts per year by status. Explicit
    pivot values keep it ONE aggregate pass (no extra distinct-values
    job) — always list the values when the domain is known."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


@query(
    "o2_rank_multikey",
    """
    SELECT p_partkey, p_retailprice,
           CAST(row_number() OVER (ORDER BY p_retailprice DESC NULLS LAST, p_partkey) AS INT)
               AS rank
    FROM part
    """,
)
def o2_rank_multikey(spark, sf_dir):
    """Multi-key sort w/ null placement (O2) surfaced as a rank column."""
    return kpi.rank_rows(
        _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice"),
        [F.desc_nulls_last("p_retailprice"), F.asc("p_partkey")],
    )


# ---------------------------------------------------------------------------
# U — set operations
# ---------------------------------------------------------------------------


@query(
    "u2_unknown_row",
    """
    SELECT CAST(n_nationkey + 1 AS INT) AS nation_sk, n_name AS nation_name, n_regionkey
    FROM nation
    UNION ALL SELECT 0, 'Unknown', -1
    """,
)
def u2_unknown_row(spark, sf_dir):
    """Unknown-member injection (U2): SK=0 sentinel row."""
    dim = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 1).cast("int").alias("nation_sk"),
        F.col("n_name").alias("nation_name"),
        "n_regionkey",
    )
    return scd.with_unknown_row(
        dim, {"nation_sk": 0, "nation_name": "Unknown", "n_regionkey": -1}
    )


@query(
    "u3_union_all_report",
    """
    SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n FROM customer
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'region', count(*) FROM region
    """,
)
def u3_union_all_report(spark, sf_dir):
    """Multi-table UNION ALL freshness report (U3)."""
    parts = [
        _t(spark, sf_dir, name).agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n")
        )
        for name in ["customer", "orders", "lineitem", "part", "supplier", "nation", "region"]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Scalar function families + dim_date
# ---------------------------------------------------------------------------


@query(
    "f_string_funcs",
    r"""
    SELECT p_partkey,
           regexp_replace(lower(trim(p_name)), '[^a-z0-9\- ]', '', 'g') AS norm_name,
           CAST(length(p_name) AS INT) AS name_len,
           upper(p_brand) AS brand_upper,
           CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
           substring(p_type, 1, 1) AS type_initial,
           concat_ws('|', p_type, p_brand) AS combined
    FROM part
    """,
)
def f_string_funcs(spark, sf_dir):
    """String family: lower/trim/regexp/length/substring/concat."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        clean.normalize_string("p_name").alias("norm_name"),
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.substring("p_type", 1, 1).alias("type_initial"),
        F.concat_ws("|", "p_type", "p_brand").alias("combined"),
    )


@query(
    "f_date_funcs",
    """
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_sk,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_epoch_start,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def f_date_funcs(spark, sf_dir):
    """Timestamp/date family: date_sk, parts, datediff, trunc, last_day."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias("date_sk"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.trunc(F.to_date("o_orderdate"), "month").alias("month_start"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
    )


@query(
    "f_math_funcs",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charge,
           round(avg(CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity END), 4)
               AS avg_unit_price,
           round(max(abs(l_extendedprice - 1000)), 2) AS max_abs_dev
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f_math_funcs(spark, sf_dir):
    """Math/logic family: ratios, guarded division, abs."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.round(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("charge"),
        F.round(
            F.avg(
                F.when(
                    F.col("l_quantity") > 0, F.col("l_extendedprice") / F.col("l_quantity")
                )
            ),
            4,
        ).alias("avg_unit_price"),
        F.round(F.max(F.abs(F.col("l_extendedprice") - 1000)), 2).alias("max_abs_dev"),
    )


@query(
    "f_array_funcs",
    """
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           string_split(p_name, ' ')[-1] AS last_word,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words
    FROM part
    """,
)
def f_array_funcs(spark, sf_dir):
    """Array family: split, size, element_at, array_sort, array_join."""
    words = F.split(F.col("p_name"), " ")
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
    )


@query(
    "f_json_extract",
    r"""
    SELECT event_type,
           CAST(sum(CAST(regexp_extract(props, '(\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def f_json_extract(spark, sf_dir):
    """JSON family: from_json a struct field, aggregate it."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return ev.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@query(
    "tags_explode_normalize",
    r"""
    SELECT DISTINCT p_partkey, tag FROM (
        SELECT p_partkey,
               regexp_replace(lower(trim(t.tag)), '[^a-z0-9\- ]', '', 'g') AS tag
        FROM part, unnest([p_type, p_brand, '  Mixed CASE!!  ']) AS t(tag)
    ) WHERE tag <> ''
    """,
)
def tags_explode_normalize(spark, sf_dir):
    """The reference tags path: JSON array -> from_json -> explode -> normalize."""
    df = _t(spark, sf_dir, "part").withColumn(
        "tags_json",
        F.to_json(F.array(F.col("p_type"), F.col("p_brand"), F.lit("  Mixed CASE!!  "))),
    )
    return clean.explode_tags(df, "tags_json", ["p_partkey"])


@query(
    "f_boolean_parse",
    """
    SELECT raw_flag,
           CASE WHEN upper(trim(raw_flag)) = 'TRUE' THEN TRUE
                WHEN upper(trim(raw_flag)) = 'FALSE' THEN FALSE
           END AS parsed,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT CASE o_orderstatus WHEN 'O' THEN ' true ' WHEN 'F' THEN 'FALSE'
                                  ELSE 'maybe' END AS raw_flag
        FROM orders
    ) GROUP BY 1, 2
    """,
)
def f_boolean_parse(spark, sf_dir):
    """Strict boolean parse (the reference's when-chain, NOT cast):
    'true'/'FALSE' map, garbage -> NULL."""
    flags = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "O", " true ")
        .when(F.col("o_orderstatus") == "F", "FALSE")
        .otherwise("maybe")
        .alias("raw_flag")
    )
    return flags.withColumn("parsed", clean.parse_boolean("raw_flag")).groupBy(
        "raw_flag", "parsed"
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "dim_date_calendar",
    """
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
           CAST(d AS DATE) AS date,
           strftime(d, '%Y-%m-%d') AS date_string,
           CAST(year(d) AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(month(d) AS INT) AS month,
           monthname(d) AS month_name,
           strftime(d, '%b') AS month_name_short,
           CAST(weekofyear(d) AS INT) AS week_of_year,
           CAST(dayofyear(d) AS INT) AS day_of_year,
           CAST(day(d) AS INT) AS day_of_month,
           CAST(isodow(d) AS INT) AS day_of_week,
           dayname(d) AS day_name,
           strftime(d, '%a') AS day_name_short,
           isodow(d) >= 6 AS is_weekend,
           isodow(d) < 6 AS is_weekday,
           (month(d), day(d)) IN ((1, 1), (4, 30), (5, 1), (9, 2)) AS is_holiday,
           CAST(CASE WHEN month(d) >= 7 THEN year(d) ELSE year(d) - 1 END AS INT)
               AS fiscal_year,
           CAST(((month(d) + 5) % 12) // 3 + 1 AS INT) AS fiscal_quarter,
           strftime(d, '%Y%m') AS year_month,
           CAST(day(last_day(d)) AS INT) AS days_in_month
    FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)
    """,
)
def dim_date_calendar(spark, sf_dir):
    """dim_date generator at full reference-attribute parity
    (``Meta_Guideline.md:2798-2860``): sequence()+explode, no driver
    loop; ISO day-of-week, July fiscal calendar, Vietnam fixed-date
    holiday rule."""
    return dims.dim_date(spark, "2024-01-01", "2024-12-31")


# ---------------------------------------------------------------------------
# S/O/P surfaces — provenance, SQL endpoint, diagnostics, projections
# ---------------------------------------------------------------------------


@query(
    "s8_provenance_by_file",
    # DuckDB views carry no file metadata, but the driver's layout is
    # one file per table named <table>.parquet at EVERY scale factor —
    # so the expected provenance basename is a constant and the oracle
    # needs no sf-specific path (grades identically at any sf_dir).
    """
    SELECT 'lineitem.parquet' AS source_file,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY 1
    """,
)
def s8_provenance_by_file(spark, sf_dir):
    """File provenance (S8): rows per source file via input_file_name()."""
    from aws_medallion_etl_spark import io as eio

    df = eio.with_provenance(_t(spark, sf_dir, "lineitem"), run_date="2024-01-01")
    return df.groupBy(
        F.regexp_extract("source_file", r"([^/]+)$", 1).alias("source_file")
    ).agg(F.count(F.lit(1)).alias("n_rows"))


_S12_SQL = """
    WITH rev AS (
        SELECT c.c_nationkey, sum(o.o_totalprice) AS nation_rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    )
    SELECT n.n_name AS nation, round(rev.nation_rev, 2) AS revenue,
           round(rev.nation_rev * 100.0 / sum(rev.nation_rev) OVER (), 4) AS pct
    FROM rev JOIN nation n ON n.n_nationkey = rev.c_nationkey
    ORDER BY revenue DESC, nation
    LIMIT 5
"""


@query("s12_sql_endpoint", _S12_SQL)
def s12_sql_endpoint(spark, sf_dir):
    """SQL endpoint (S12): register the star schema, answer in pure SQL.

    One engine serves both the reference's Glue-job AND Athena roles
    (``Meta_Guideline.md:2318-2345``) — the same session runs
    DataFrame pipelines and interactive SQL over the same tables.
    """
    from aws_medallion_etl_spark import io as eio

    for t in ["orders", "customer", "nation"]:
        eio.register_table(spark, _t(spark, sf_dir, t), t)
    return eio.sql(spark, _S12_SQL)


@query(
    "s11_jdbc_publish_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY 1
    """,
)
def s11_jdbc_publish_roundtrip(spark, sf_dir):
    """S11 warehouse publish proven by oracle: gold rollup ->
    ``io.publish_jdbc`` (Spark's parallel JDBC writer, the reference's
    Redshift DDL->COPY manager ``boto3_deployment/managers/
    redshift_manager.py:76-348``) -> read BACK through JDBC ->
    compare. The warehouse is the EMBEDDED Derby engine Spark ships
    for its metastore — zero external dependencies, same code path as
    a real warehouse up to the url/driver pair. The db lives in a
    per-process dir: embedded Derby admits one JVM per database, and
    a fresh path per process sidesteps stale-lock handoff entirely
    (``mode=overwrite`` handles re-runs within a session).
    """
    import os as _os

    from aws_medallion_etl_spark import io as eio

    gold = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    db = f"{_scratch(f's11db_{_os.getpid()}', sf_dir)}/warehouse"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    eio.publish_jdbc(
        gold, f"jdbc:derby:{db};create=true", "fact_order_status",
        properties=props, num_partitions=1,
    )
    return (
        spark.read.format("jdbc")
        .option("url", f"jdbc:derby:{db}")
        .option("dbtable", "fact_order_status")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )


@query(
    "o3_diagnostics_sample",
    f"""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           {_LINEITEM_REASON_SQL} AS reject_reason
    FROM lineitem
    WHERE {_LINEITEM_REASON_SQL} IS NOT NULL
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 5
    """,
)
def o3_diagnostics_sample(spark, sf_dir):
    """Reject diagnostics sample (O3): deterministic limit(5) over rejects."""
    _, rejects = validate.split_valid_invalid(
        _t(spark, sf_dir, "lineitem"), lineitem_rules()
    )
    return (
        rejects.select(
            "l_orderkey", "l_linenumber", "l_extendedprice", validate.REJECT_REASON
        )
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(5)
    )


@query(
    "p_projection_family",
    """
    SELECT s_suppkey AS supplier_id,
           s_name AS supplier_name,
           coalesce(CASE WHEN s_acctbal > 2500 THEN 'gold' END, 'standard') AS tier,
           'tpch' AS source_system
    FROM supplier
    WHERE s_acctbal BETWEEN 0 AND 5000
    """,
)
def p_projection_family(spark, sf_dir):
    """P1/P7/P8/P9/P10 in one pass: rename, drop, constant, range, fillna."""
    sup = _t(spark, sf_dir, "supplier")
    return (
        clean.rename_columns(
            sup, {"s_suppkey": "supplier_id", "s_name": "supplier_name"}
        )
        .filter(F.col("s_acctbal").between(0, 5000))                     # P9
        .withColumn("source_system", F.lit("tpch"))                       # P8
        .withColumn("tier", F.when(F.col("s_acctbal") > 2500, "gold"))    # P5-ish
        .fillna({"tier": "standard"})                                     # P10
        .drop("s_nationkey", "s_acctbal")                                 # P7
    )


# ---------------------------------------------------------------------------
# Text analysis (documents table)
# ---------------------------------------------------------------------------


@query(
    "t_token_count",
    r"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
           round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
           CAST(sum(len(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')))
               AS BIGINT) AS sum_bpe_tokens
    FROM documents GROUP BY lang
    """,
)
def t_token_count(spark, sf_dir):
    """Token counting per language: whitespace tokens AND the GPT-2
    pre-tokenizer (BPE-ish) estimate — the same regex runs on both
    engines (Java regex / RE2 portable subset)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .withColumn("n_tok", text.token_count("text"))
        .withColumn("n_bpe", text.token_count_bpe("text"))
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.sum("n_bpe").alias("sum_bpe_tokens"),
    )


@query(
    "t_quality_score",
    r"""
    WITH q AS (
        SELECT lang,
               len(string_split_regex(trim(text), '\s+')) AS n_tok,
               length(regexp_replace(text, '\s', '', 'g')) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS awl,
               len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS swr
        FROM documents
    )
    SELECT lang, round(avg(n_tok), 4) AS avg_tokens,
           round(avg(round(awl, 4)), 4) AS avg_word_len,
           round(avg(round(swr, 4)), 4) AS avg_stopword_ratio
    FROM q GROUP BY lang
    """,
)
def t_quality_score(spark, sf_dir):
    """Quality scoring: word length + stopword-ratio signals per language."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        text.token_count("text").alias("n_tok"),
        text.avg_word_length("text").alias("awl"),
        text.stopword_ratio("text").alias("swr"),
    )
    return docs.groupBy("lang").agg(
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.round(F.avg("awl"), 4).alias("avg_word_len"),
        F.round(F.avg("swr"), 4).alias("avg_stopword_ratio"),
    )


@query(
    "t_fingerprint",
    r"""
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of whitespace-normalized text."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.fingerprint("text").alias("fingerprint")
    )


@query(
    "t_lang_id",
    r"""
    WITH s AS (
        SELECT lang,
               len(regexp_extract_all(text, '\b(the|of|and|to|a|in)\b')) AS s_en,
               len(regexp_extract_all(text, '\b(el|la|de|que|los|las)\b')) AS s_es,
               len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b')) AS s_de,
               len(regexp_extract_all(text, '\b(le|les|des|est|une|dans)\b')) AS s_fr,
               len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
        FROM documents
    )
    SELECT lang,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
                WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
                WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
                WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2
    """,
)
def t_lang_id(spark, sf_dir):
    """Heuristic language-ID confusion counts (labeled lang vs predicted)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "predicted_lang", text.language_id("text")
    )
    return docs.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n"))


