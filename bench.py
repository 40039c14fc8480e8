"""Benchmark the declared query inventory at $SPARK_GRAFT_SF_DIR (default sf0.1).

Each ``queries()`` entry is built and executed to completion through the
``noop`` sink (full computation, no driver-side collect), timed
individually. Prints ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod
    from aws_medallion_etl_spark import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # Untimed warm-up: touch every table once so per-query numbers
    # measure steady-state compute, not first-read page-cache misses.
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:
            pass
    # ... and one untimed aggregate+join so JVM/codegen/broadcast
    # machinery is hot — otherwise whichever query runs FIRST absorbs
    # ~1s of warmup and reads as a regression whenever the inventory
    # ordering changes.
    try:
        from pyspark.sql import functions as F

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .groupBy("c_mktsegment").count()
         .write.mode("overwrite").format("noop").save())
    except Exception:
        pass

    timings: dict[str, float] = {}
    medians: dict[str, list[float]] = {}
    failures: dict[str, str] = {}

    # Two timing phases (round 13 — bench variance hygiene): the
    # snapshot-DML / streaming-harness queries commit dozens of table
    # versions each, leaving JVM heap churn, shuffle files, and page-
    # cache pressure that measurably inflated UNCHANGED light queries
    # co-resident in the same batch (~1.2x drift across ~20 queries in
    # r12). Light queries run first in inventory order; the DML-heavy
    # modules run as their own trailing batch behind a cache clear.
    items = [(n, f) for n, f in entrymod.queries().items()
             if not only or n in only]
    _DML_MODULES = ("queries.snapshot_dml", "queries.snapshot_tokenize",
                    "queries.streaming_corpus")
    light = [(n, f) for n, f in items
             if not getattr(f, "__module__", "").endswith(_DML_MODULES)]
    heavy = [(n, f) for n, f in items
             if getattr(f, "__module__", "").endswith(_DML_MODULES)]
    phases = [light, heavy]
    for phase_i, phase in enumerate(phases):
        if phase_i and phase:
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        _bench_phase(phase, spark, sf_dir, timings, medians, failures,
                     gc_between=bool(phase_i))

    pipeline_sec = None
    if not only:
        # same pre-measurement drain as the DML phase: the pipeline
        # runs dead last, after the whole suite's deferred cleanup has
        # piled up — measured 16.1 s suite-tail vs ~7.7 s warm solo
        # with identical code (round 14 attribution)
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        pipeline_sec = _bench_pipeline(spark, sf_dir)

    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    write_record = True
    if only and os.path.exists(bench_path):
        # a partial run (explicit names) refreshes those rows in the
        # existing record in place — same discipline as the audit
        # tools: never clobber the full committed table with a
        # names-subset one (that wiped BENCH_local to 3 rows in r9)
        try:
            with open(bench_path) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = {}
        if prev.get("sf") == sf:
            merged_t = dict(prev.get("queries", {}))
            merged_t.update(timings)
            timings = merged_t
            merged_m = dict(prev.get("median_runs", {}))
            merged_m.update(medians)
            medians = merged_m
            pipeline_sec = prev.get("pipeline_e2e_sec")
            stale_fail = {
                n: e for n, e in prev.get("failures", {}).items()
                if n not in only
            }
            failures = {**stale_fail, **failures}
        elif prev.get("queries"):
            # a names-subset run at a DIFFERENT sf than the committed
            # record: merging would mix scales and overwriting would
            # clobber the full table (this wiped BENCH_local in r11) —
            # print the compact line but leave the record untouched
            write_record = False

    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if medians:
        # sorted 3-run samples for every query whose first run took
        # >= 3 s; the "queries" entry above is that query's MEDIAN
        out["median_runs"] = medians
    if pipeline_sec is not None:
        # BASELINE.md's operative envelope: bronze->silver->gold < 30 min.
        out["pipeline_e2e_sec"] = pipeline_sec
    if failures:
        out["failures"] = failures

    # Persist the RICH record (full per-query table + median runs) to
    # BENCH_local.json, then stop Spark BEFORE printing so no straggling
    # JVM/log output can interleave with (or follow) the JSON line on the
    # combined stream — rounds 3-4 recorded parsed=null because the record
    # drowned in log noise.
    if write_record:
        with open(bench_path, "w") as fh:
            fh.write(json.dumps(out) + "\n")
    # The harness keeps only the LAST ~2000 chars of combined output and
    # parses that as JSON: a 199-query table (~7.5 KB) loses its head and
    # records parsed=null (BENCH_r10). The driver-facing line is therefore
    # a COMPACT summary — headline metric + the heaviest queries that fit
    # in the capture window — with the full table in BENCH_local.json.
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "full_record": "BENCH_local.json",
    }
    if pipeline_sec is not None:
        compact["pipeline_e2e_sec"] = pipeline_sec
    if failures:
        compact["n_failures"] = len(failures)
        compact["failures"] = dict(list(failures.items())[:5])
    # rep spreads for the heaviest multi-rep queries ride the driver
    # line (round 13 — the r12 verdict had to dig spreads out of
    # BENCH_local to explain a 2.1x s43 wobble): [lo, hi] per query,
    # capped so the line stays inside the harness capture window
    if medians:
        compact["spreads"] = {
            n: [runs[0], runs[-1]]
            for n, runs in sorted(
                medians.items(),
                key=lambda kv: -(kv[1][-1] - kv[1][0]),
            )[:6]
        }
    compact["queries"] = {}
    budget = 1800 - len(json.dumps(compact))
    for n, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        entry_len = len(json.dumps({n: t})) + 1
        if budget - entry_len < 0:
            break
        compact["queries"][n] = t
        budget -= entry_len
    line = json.dumps(compact)
    try:
        spark.stop()
    except Exception:
        pass
    sys.stderr.flush()
    print(line, flush=True)
    # Exit code signals only "was a record produced": 0 whenever the JSON
    # line exists (per-query failures are recorded IN the JSON under
    # "failures" — that is the machine-readable failure channel); a
    # nonzero exit is reserved for crashing before the record exists.
    # History: round 3's single red query exited 1 and the harness voided
    # the whole bench record (BENCH_r03 parsed=null) despite 57 valid
    # timings on stdout — an rc-based partial-failure signal re-creates
    # exactly that, so callers must read the JSON, not the rc.
    if failures:
        print(f"bench: {len(failures)} queries failed (see JSON 'failures')",
              file=sys.stderr)
    return 0


def _bench_phase(phase, spark, sf_dir, timings, medians, failures,
                 gc_between=False) -> None:
    """Time one batch of (name, fn) queries in order.

    ``gc_between`` (the DML phase): drain the JVM's deferred cleanup
    BEFORE each query, not just before the phase. Measured (round 14):
    the action-heavy MV queries read 12.4 s/rep steady-state in a
    fresh session but 26->46->47 s across reps deep in the 200-query
    suite — the growth is GC/ContextCleaner backlog from the
    PRECEDING queries' checkpoint blocks and shuffle files landing on
    whoever runs next, not the query's own cost. One System.gc()
    before each heavy query charges cleanup to the session, so the
    recorded number prices the query.
    """
    # Deterministic block reclamation between queries (round 14, guide
    # §5): each query's localCheckpoint blocks (CC rounds, admission
    # probes, MV deltas) are dead once its reps finish — the returned
    # frames are rebuilt from scratch per rep — but have no Dataset
    # handle and previously lingered until a GC/ContextCleaner drain,
    # taxing co-resident queries (measured: dedup_clusters_merged rep
    # spread [13.4, 21.1, 39.1] mid-suite vs ~6.5 s steady-state solo).
    # Freeing the id-delta after each query's reps charges nothing to
    # any timed region — every rep still computes fully from parquet.
    try:
        from aws_medallion_etl_spark._ckpt import (
            persistent_rdd_ids, unpersist_rdd_ids,
        )
    except Exception:
        persistent_rdd_ids = unpersist_rdd_ids = None

    for name, fn in phase:
        if gc_between:
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        pre_ids = (
            persistent_rdd_ids(spark.sparkContext)
            if persistent_rdd_ids else None
        )

        def _run_once() -> float:
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return round(time.time() - t0, 3)

        try:
            try:
                t = _run_once()
            except Exception as e:  # noqa: BLE001 — a failed query must not kill the bench
                failures[name] = f"{type(e).__name__}: {e}"
                continue
            if t >= 3.0:
                # heavy tail: one shot in a shared JVM is noisy enough
                # to read as a round-over-round regression — record the
                # median of three (queries re-stage their own scratch
                # inputs, so re-runs are self-contained). A rerun failure
                # must not void the already-successful first timing.
                runs = [t]
                try:
                    runs.append(_run_once())
                    runs.append(_run_once())
                except Exception:  # noqa: BLE001 — keep the good samples
                    pass
                runs.sort()
                medians[name] = runs
                timings[name] = runs[len(runs) // 2]
            else:
                timings[name] = t
        finally:
            if pre_ids is not None:
                try:
                    unpersist_rdd_ids(
                        spark.sparkContext,
                        persistent_rdd_ids(spark.sparkContext) - pre_ids,
                    )
                except Exception:
                    pass


def _bench_pipeline(spark, sf_dir: str) -> float:
    """Time a full gated medallion run (orders+customer+lineitem ->
    bronze -> silver -> gold fact) against the BASELINE <30 min envelope."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import pipeline
    from aws_medallion_etl_spark.operators import validate

    out_dir = tempfile.mkdtemp(prefix="bench_lake_")
    specs = {
        "orders": pipeline.TableSpec(
            "orders",
            rules=lambda: [validate.Rule("neg_price", F.col("o_totalprice") < 0)],
            nk=["o_orderkey"], dedup_order=["o_orderdate"],
        ),
        "customer": pipeline.TableSpec(
            "customer",
            rules=lambda: [validate.Rule("no_seg", validate.null_or_blank("c_mktsegment"))],
            nk=["c_custkey"], dedup_order=["c_acctbal"],
        ),
        "lineitem": pipeline.TableSpec(
            "lineitem",
            rules=lambda: [validate.Rule("bad_qty", F.col("l_quantity") <= 0)],
            nk=["l_orderkey", "l_linenumber"], dedup_order=["l_shipdate"],
        ),
    }
    sources = {
        n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in specs
    }

    def fact_revenue_by_segment(spark, out_dir, run_date):
        li = spark.read.parquet(f"{out_dir}/silver/lineitem")
        o = spark.read.parquet(f"{out_dir}/silver/orders")
        c = spark.read.parquet(f"{out_dir}/silver/customer")
        return (
            li.where(F.col("run_date") == run_date)
            .join(o.select("o_orderkey", "o_custkey"),
                  li["l_orderkey"] == F.col("o_orderkey"))
            .join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
                  F.col("o_custkey") == F.col("c_custkey"), "left")
            .fillna({"c_mktsegment": "UNKNOWN"})
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
        )

    t0 = time.time()
    try:
        pipeline.run_pipeline(
            spark, sources, specs,
            {"fact_revenue_by_segment": fact_revenue_by_segment},
            out_dir, "2024-06-01",
        )
        return round(time.time() - t0, 3)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
