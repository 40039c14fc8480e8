"""Organic sf1 tier: a TRUE 10x dataset generated from sf0.1's
MEASURED marginals — not block replication.

The replicated stress tiers (tools/stress_bench.py) preserve workload
density by construction (shifted keys, suffixed tokens, sign-masked
vectors), which leaves one honest caveat: every structure inside a
replica is an exact copy of sf0.1's. This tool retires that caveat
for the heavy queries by generating ORGANIC data at 10x — fresh key
spaces, hash-drawn values matching the measured sf0.1 marginals, and
fresh (not copied) near-dup structure:

* documents: 31-token vocabulary with the measured zipf weights,
  lengths 10-100 (mean ~54), ~5%% of docs are 8%%-mutated copies of a
  nearby doc (the measured >=0.8-containment pair rate), ~0.15%%
  exact copies;
* embeddings: random unit vectors in dim 64 (background cos>=0.35
  density ~0.2%%, matching sf0.1) plus ~5%% planted near-dups at
  cos~0.95;
* star schema: organic keys at 10x cardinality, uniform status/flag/
  segment marginals, li-per-order mean 4 (measured), same date spans.

Every draw is ``xxhash64``-deterministic — no RNG, reproducible.

Usage: python tools/organic_bench.py [query ...]  (default: heavy set)
Records under ``queries_organic_sf1`` in STRESS_local.json
(base_sec = sf0.1, scaled_sec = organic sf1, data ratio 10) — rows to
compare side-by-side with the replicated ``queries`` (10x) section:
matching ratios mean the replica methodology did not flatter us.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/mdl_organic_sf1"

HEAVY = [
    "dedup_incremental_lsh",
    "dedup_incremental_lsh_appended",
    "dedup_minhash_lsh",
    "dedup_clusters_merged",
    "dedup_semantic_clusters",
    "e2e_semantic_curation",
    "sim_topk_ivf_pq",
    "sim_topk_ivf_pq_indexed",
    "e2e_medallion_gold",
    "str8_stream_incremental_dedup",
    "str9_stream_incremental_clusters",
    "str10_stream_pack",
]

# measured sf0.1 vocabulary with zipf weights (counts/255, min 1 slot)
_VOCAB = [
    ("spark", 36), ("window", 14), ("merge", 13), ("table", 13),
    ("column", 12), ("vector", 12), ("stream", 11), ("value", 11),
    ("data", 10), ("small", 10), ("join", 9), ("filter", 9), ("big", 8),
    ("group", 8), ("hash", 7), ("customer", 7), ("sort", 6), ("order", 6),
    ("slow", 5), ("line", 5), ("part", 4), ("fast", 4), ("the", 4),
    ("row", 3), ("agg", 3), ("key", 3), ("query", 2), ("a", 2),
    ("scan", 2), ("batch", 1), ("dup", 1),
]

N_DOCS = 50_000
N_VECS = 20_000
N_CUST = 150_000
N_ORD = 1_500_000
N_EVT = 1_000_000


def build_embeddings(spark, out_dir: str, n_vecs: int,
                     with_label: bool = False) -> None:
    """The organic embedding recipe alone, at any size: random unit
    vectors (Irwin-Hall(4) components, xxhash64-deterministic) with
    ~5%% planted near-dups at cos~0.95. Factored out (round 14) so the
    cap-bound recall tier (tools/recall_audit.py ``capbound_organic``)
    can build a 200k-vector corpus with planted TRUE neighbors without
    dragging the documents/star-schema build along."""
    from pyspark.sql import functions as F

    def H(salt, *cols):
        return F.xxhash64(F.lit(salt), *cols)

    def U(salt, *cols):
        return F.pmod(H(salt, *cols), F.lit(1_000_000)) / 1_000_000.0

    def comp(idc, salt):  # Irwin-Hall(4) - 2: symmetric, ~N(0, 1/sqrt(3))
        return F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                U(salt + "1", idc, j) + U(salt + "2", idc, j)
                + U(salt + "3", idc, j) + U(salt + "4", idc, j) - 2.0
            ),
        )

    e = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    vnear = (F.col("vec_id") % 20 == 13) & (F.col("vec_id") >= 20)
    raw_vb = F.col("vec_id") - 1 - F.pmod(H("vb", F.col("vec_id")), F.lit(20))
    vbase = raw_vb - F.when(raw_vb % 20 == 13, 1).otherwise(0)
    e = e.select(
        "vec_id",
        F.when(
            vnear,
            F.zip_with(
                comp(vbase, "g"), comp(F.col("vec_id"), "g"),
                lambda a, b: a + 0.33 * b,
            ),
        ).otherwise(comp(F.col("vec_id"), "g")).alias("v"),
    )
    e = e.withColumn(
        "nrm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    cols = [
        "vec_id",
        F.transform("v", lambda x: x / F.col("nrm"))
        .cast("array<float>").alias("embedding"),
    ]
    if with_label:
        lbl = F.array(*[F.lit(o) for o in ["l0", "l1", "l2", "l3"]])
        cols.append(F.element_at(
            lbl,
            (F.pmod(H("lbl", F.col("vec_id")), F.lit(4)) + 1).cast("int"),
        ).alias("label"))
    emb = e.select(*cols)
    emb.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet")


def _build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    marker = os.path.join(OUT, "_built")
    if os.path.exists(marker):
        return

    def H(salt, *cols):
        return F.xxhash64(F.lit(salt), *cols)

    def U(salt, *cols):  # deterministic uniform [0, 1)
        return F.pmod(H(salt, *cols), F.lit(1_000_000)) / 1_000_000.0

    def pick(salt, options, *cols):  # uniform choice from literals
        arr = F.array(*[F.lit(o) for o in options])
        return F.element_at(
            arr, (F.pmod(H(salt, *cols), F.lit(len(options))) + 1).cast("int")
        )

    # ---- documents -------------------------------------------------
    slots = [t for t, w in _VOCAB for _ in range(w)]
    slot_arr = F.array(*[F.lit(t) for t in slots])
    n_slots = len(slots)

    def tok(idc, p):
        return F.element_at(
            slot_arr,
            (F.pmod(H("tok", idc, p), F.lit(n_slots)) + 1).cast("int"),
        )

    d = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    is_exact = (F.col("doc_id") % 640 == 5) & (F.col("doc_id") >= 64)
    is_near = (
        (F.col("doc_id") % 20 == 13) & (F.col("doc_id") >= 64) & ~is_exact
    )
    # bases must be NON-dup docs: a dup of a dup chains mutations into
    # long connected components the measured sf0.1 structure does not
    # have (256 isolated >=0.8-containment PAIRS among 5000 docs).
    # doc ids =13 (mod 20) and =5 (mod 640) are the dup classes; step
    # a colliding candidate down one (5-1 and 13-1 are both clean).
    raw_base = (
        F.col("doc_id") - 1 - F.pmod(H("bsrc", F.col("doc_id")), F.lit(50))
    )
    raw_base = raw_base - F.when(raw_base % 20 == 13, 1).otherwise(0)
    base_id = raw_base - F.when(raw_base % 640 == 5, 1).otherwise(0)
    d = d.select(
        "doc_id",
        is_near.alias("near"),
        F.when(is_exact | is_near, base_id)
        .otherwise(F.col("doc_id")).alias("src_id"),
    )
    length = (F.lit(10) + F.pmod(H("len", F.col("src_id")), F.lit(91))).cast("int")
    token_at = lambda p: F.when(  # noqa: E731 — local plan builder
        F.col("near") & (F.pmod(H("mut", F.col("doc_id"), p), F.lit(100)) < 8),
        tok(F.col("doc_id"), p),
    ).otherwise(tok(F.col("src_id"), p))
    lang_slots = ["en"] * 8 + ["de"] * 3 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3
    docs = d.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), length - 1), token_at), " "
        ).alias("text"),
        pick("lang", lang_slots, F.col("doc_id")).alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))
    docs.repartition(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # ---- embeddings (ONE recipe — build_embeddings — shared with the
    # cap-bound recall tier so the corpora can never desynchronize) ---
    build_embeddings(spark, OUT, N_VECS, with_label=True)

    # ---- star schema -------------------------------------------------
    c = spark.range(N_CUST).select(F.col("id").alias("c_custkey"))
    cust = c.select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        F.pmod(H("nat", F.col("c_custkey")), F.lit(25)).cast("int").alias(
            "c_nationkey"
        ),
        F.round(-1000.0 + U("bal", F.col("c_custkey")) * 11000.0, 2).alias(
            "c_acctbal"
        ),
        pick(
            "seg",
            ["HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY", "AUTOMOBILE"],
            F.col("c_custkey"),
        ).alias("c_mktsegment"),
    )
    cust.repartition(4).write.mode("overwrite").parquet(f"{OUT}/customer.parquet")

    o = spark.range(N_ORD).select(F.col("id").alias("o_orderkey"))
    odate = F.to_timestamp(
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            F.pmod(H("od", F.col("o_orderkey")), F.lit(2404)).cast("int"),
        )
    )
    orders = o.select(
        "o_orderkey",
        F.pmod(H("oc", F.col("o_orderkey")), F.lit(N_CUST)).alias("o_custkey"),
        pick("ost", ["O", "P", "F"], F.col("o_orderkey")).alias("o_orderstatus"),
        F.round(1000.0 + U("otp", F.col("o_orderkey")) * 499000.0, 2).alias(
            "o_totalprice"
        ),
        odate.alias("o_orderdate"),
        pick(
            "opr",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            F.col("o_orderkey"),
        ).alias("o_orderpriority"),
    )
    orders.repartition(8).write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    # lineitems: 1 + h%4 + h%4 per order (1..7, mean 4 — measured)
    li = orders.select(
        "o_orderkey", "o_orderdate",
        (
            F.lit(1)
            + F.pmod(H("nl1", F.col("o_orderkey")), F.lit(4))
            + F.pmod(H("nl2", F.col("o_orderkey")), F.lit(4))
        ).cast("int").alias("n_li"),
    ).select(
        "o_orderkey", "o_orderdate",
        F.explode(F.sequence(F.lit(1), F.col("n_li"))).alias("l_linenumber"),
    )
    k = [F.col("o_orderkey"), F.col("l_linenumber")]
    lineitem = li.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(H("pk", *k), F.lit(20_000)).alias("l_partkey"),
        F.pmod(H("sk", *k), F.lit(1_000)).alias("l_suppkey"),
        "l_linenumber",
        (1.0 + F.pmod(H("qt", *k), F.lit(50))).cast("double").alias("l_quantity"),
        F.round(1000.0 + U("ep", *k) * 99000.0, 2).alias("l_extendedprice"),
        # round(u * max, 2): halves the boundary-bin mass exactly like
        # the measured distribution (P(0.10) ~= 5%, not 1/11) — the
        # e2e circuit breaker's ~8.6% reject contract depends on it
        F.round(U("dc", *k) * 0.10, 2).alias("l_discount"),
        F.round(U("tx", *k) * 0.08, 2).alias("l_tax"),
        pick("rf", ["R", "A", "N"], *k).alias("l_returnflag"),
        pick("ls", ["O", "F"], *k).alias("l_linestatus"),
        F.to_timestamp(
            F.date_add(
                F.col("o_orderdate").cast("date"),
                (1 + F.pmod(H("sd", *k), F.lit(90))).cast("int"),
            )
        ).alias("l_shipdate"),
    )
    lineitem.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/lineitem.parquet"
    )

    ev = spark.range(N_EVT).select(F.col("id").alias("event_id"))
    events = ev.select(
        "event_id",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(
                days=F.lit(0), hours=F.lit(0), mins=F.lit(0),
                secs=U("ts", F.col("event_id")) * (30 * 86400.0),
            )
        ).alias("ts"),
        F.pmod(H("eu", F.col("event_id")), F.lit(15_000)).alias("user_id"),
        pick(
            "et", ["view", "click", "purchase", "signup", "error"],
            F.col("event_id"),
        ).alias("event_type"),
        F.round(U("ev", F.col("event_id")) * 100.0, 2).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(H("pk2", F.col("event_id")), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )
    events.repartition(8).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    for small in ("region", "nation", "supplier", "part"):
        link = f"{OUT}/{small}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{small}.parquet", link)
    open(marker, "w").write("ok")


def main() -> int:
    names = sys.argv[1:] or HEAVY

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
    )

    import __spark_entry__ as entrymod
    from aws_medallion_etl_spark import get_spark

    spark = get_spark(app_name="organic-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    _build(spark)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, SRC).write.mode("overwrite").format("noop").save()  # warmup
        res = {}
        for tag, sf_dir in (("base", SRC), ("scaled", OUT)):
            best = None
            for _ in range(2):
                t1 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.time() - t1
                best = dt if best is None else min(best, dt)
            res[f"{tag}_sec"] = round(best, 2)
        res["ratio"] = round(res["scaled_sec"] / max(res["base_sec"], 1e-9), 2)
        out[name] = res
        print(name, res, file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_local.json",
    )
    doc = {}
    if os.path.exists(path):
        try:
            doc = json.load(open(path))
        except (ValueError, OSError):
            doc = {}
    section = dict(doc.get("queries_organic_sf1", {}))
    section.update(out)
    doc["queries_organic_sf1"] = section
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"queries_organic_sf1": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
