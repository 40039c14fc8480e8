"""Data-density audit for the 10x stress explanations.

The 10x stress bench (``tools/stress_bench.py``) times queries on
replicated-but-decorrelated data; three of them scale worse than ~3x
wall-clock for 10x rows. This tool separates *plan* defects from
*data* properties by measuring the quantities those plans are
actually proportional to, at BOTH scales:

* ``ngram_jaccard_pairs`` family (``dedup_cross_source_matrix``,
  ``graph_pagerank_hubs``): the blocking join's candidate volume is
  sum over shingles of C(df, 2) — if per-shingle document frequency
  rises in the stress corpus, candidates (and the verify join) grow
  faster than rows with an unchanged plan.
* ``t_bigram_logprob``: the model tables are bigram-TYPE-count-sized
  — vocabulary growth, not row growth, sizes the joins.

Writes ``DENSITY_AUDIT.json`` {scale: {metric: value}, ratios: {...}}.
Usage: python tools/density_audit.py  (uses sf0.1 + the stress dir;
builds the stress replica set first if missing).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "DENSITY_AUDIT.json")
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def measure_shingle(spark, sf_dir: str) -> dict:
    """The shingle-blocking family's cost drivers alone — what the
    dedup_containment / ngram_jaccard stress ratios are proportional
    to — plus the density guard's ADMISSION DECISION for the
    containment query's exact config at this tier (plan-build time
    only, no pair is materialized)."""
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark.operators import fuzzy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"n_docs": docs.count()}

    sh = fuzzy.shingles(docs, "doc_id", "text", n=3)
    df_stats = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    row = df_stats.agg(
        F.count(F.lit(1)).alias("n_shingle_types"),
        F.sum("df").alias("n_postings"),
        # candidate pairs the blocking equi-join emits before the
        # per-pair intersection/verify: sum_s C(df_s, 2)
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("candidate_pairs"),
        F.max("df").alias("max_shingle_df"),
    ).collect()[0]
    out.update(
        n_shingle_types=row["n_shingle_types"],
        n_postings=row["n_postings"],
        candidate_pairs=int(row["candidate_pairs"]),
        max_shingle_df=row["max_shingle_df"],
    )
    # the admission decision dedup_containment's config gets here
    # (max_shingle_df=None, default budget): records predicted pairs,
    # whether the auto-screen fired, and the retained-evidence share
    fuzzy.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_shingle_df=None
    )
    out["containment_admission"] = fuzzy.last_admission_decision()
    return out


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark.operators import fuzzy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = measure_shingle(spark, sf_dir)
    pairs = fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_shingle_df=None
    )
    out["neardup_pairs"] = pairs.count()
    out["pagerank_edges"] = 2 * out["neardup_pairs"]

    # --- bigram LM family --------------------------------------------
    toks = docs.select(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
        ).alias("__t")
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with("
                " slice(__t, 1, greatest(size(__t) - 1, 0)),"
                " slice(__t, 2, greatest(size(__t) - 1, 0)),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("__p")
    )
    row = bg.agg(
        F.count(F.lit(1)).alias("bigram_tokens"),
        F.count_distinct("__p").alias("bigram_vocab"),
    ).collect()[0]
    out.update(bigram_tokens=row["bigram_tokens"], bigram_vocab=row["bigram_vocab"])
    return out


def main() -> int:
    from aws_medallion_etl_spark import get_spark

    import tools.stress_bench as stress

    spark = get_spark(app_name="density_audit")
    spark.sparkContext.setLogLevel("ERROR")
    stress.build(spark)

    rec = {"sf01": measure(spark, SF01), "sf1_10x": measure(spark, stress.OUT)}
    rec["ratios"] = {
        k: round(rec["sf1_10x"][k] / max(rec["sf01"][k], 1), 2)
        for k in rec["sf01"]
        if isinstance(rec["sf01"][k], (int, float))
    }
    # the organic tier (tools/organic_bench.py), when built: same 10x
    # row count but NO replica decorrelation — its candidate_pairs
    # ratio is the measured quadratic term of the bounded-vocabulary
    # regime, next to the replicated tier's linear one
    organic = "/tmp/mdl_organic_sf1"
    if os.path.exists(os.path.join(organic, "_built")):
        rec["organic_sf1"] = measure(spark, organic)
        rec["ratios_organic"] = {
            k: round(rec["organic_sf1"][k] / max(rec["sf01"][k], 1), 2)
            for k in rec["sf01"]
            if isinstance(rec["sf01"][k], (int, float))
        }
    # the 100x replicated tier (when built): the candidate volume +
    # admission decision behind the suite's steepest stress ratio
    # (dedup_containment) — shingle family only; the verify/bigram
    # rows are the 10x sections' job
    x100 = "/tmp/mdl_stress_100x"
    if os.path.isdir(os.path.join(x100, "documents.parquet")):
        rec["sf10_100x"] = measure_shingle(spark, x100)
        rec["ratios_100x"] = {
            k: round(rec["sf10_100x"][k] / max(rec["sf01"][k], 1), 2)
            for k in rec["sf10_100x"] if isinstance(rec["sf01"].get(k), (int, float))
        }
    with open(OUT, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec, indent=1, sort_keys=True))
    print(f"-> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
