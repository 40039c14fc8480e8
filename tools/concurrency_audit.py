"""Concurrent-writer audit for the snapshot table's rebase protocol.

Hammers ONE table with parallel writers through the public API — no
test seams, real thread interleavings — and verifies the two claims
the round-11 commit-rebase work makes:

* SAFETY (unconditional): zero lost updates — every merge that
  REPORTED success has its full effect in the final table, every one
  that gave up has NO effect (atomicity), untouched keys are
  untouched, and under row tracking every row id stays unique with
  survivors' ids unchanged from birth;
* LIVENESS (cadence-dependent): key-disjoint merges racing each other
  and a realistic OPTIMIZE cadence all land — a losing writer either
  rebases in-commit (stats prove its appends disjoint) or surfaces a
  clean conflict and re-runs (the documented caller-retry scope for
  pre-write races / rewritten read sets). The first run of this tool
  measured the pathological cadence too: whole-table OPTIMIZE every
  0.3 s starves writers (1/24 merges exhausted 25 retries) — the
  honest operational note that OPTIMIZE belongs on a maintenance
  cadence, not a tight loop.

Writes CONCURRENCY_AUDIT.json: writers, merges, committed versions,
in-commit rebases (history MERGE count vs first-try commits is not
observable, so we count op-level RETRIES — each one is a race the
protocol surfaced safely), wall seconds, and the verification bits.

Usage: python tools/concurrency_audit.py [writers] [merges_each]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "CONCURRENCY_AUDIT.json")


def main() -> int:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    merges_each = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    slice_keys = 500

    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import get_spark
    from aws_medallion_etl_spark import snapshot as sn

    spark = get_spark(app_name="concurrency_audit")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(tempfile.gettempdir(), "mdl_conc_audit")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_mv", ignore_errors=True)
    shutil.rmtree(path + "_jmv", ignore_errors=True)
    shutil.rmtree(path + "_dim", ignore_errors=True)

    n0 = writers * slice_keys
    base = spark.range(n0).select(
        F.col("id").alias("k"), F.lit(0).alias("v")
    )
    sn.snapshot_create(
        spark, base.repartitionByRange(writers, "k"), path, ["k"],
        row_tracking=True,
    )
    birth_ids = {
        r["k"]: r["_row_id"]
        for r in sn.snapshot_read(spark, path, row_ids=True).collect()
    }

    retries = {"merge": 0, "compact": 0}
    errors: list[str] = []
    landed: set[tuple[int, int]] = set()
    lock = threading.Lock()
    stop_optimize = threading.Event()

    def writer(w: int) -> None:
        lo = w * slice_keys
        for m in range(1, merges_each + 1):
            val = w * 100 + m
            src = spark.range(lo, lo + slice_keys // 2).select(
                F.col("id").alias("k"), F.lit(val).alias("v")
            ).unionByName(
                # fresh inserts per round, disjoint per writer
                spark.range(
                    n0 + w * 10_000 + m * 100,
                    n0 + w * 10_000 + m * 100 + 10,
                ).select(F.col("id").alias("k"), F.lit(val).alias("v"))
            )
            for attempt in range(40):
                try:
                    sn.merge_into(spark, path, src, on=["k"])
                    with lock:
                        landed.add((w, m))
                    break
                except RuntimeError as e:
                    if "commit conflict" not in str(e):
                        with lock:
                            errors.append(f"w{w}m{m}: {e}")
                        return
                    with lock:
                        retries["merge"] += 1
                    time.sleep(0.05 * (attempt + 1))
            else:
                with lock:
                    errors.append(f"w{w}m{m}: retries exhausted (liveness)")

    def optimizer() -> None:
        while not stop_optimize.is_set():
            try:
                sn.compact(spark, path, small_file_rows=10**9)
            except RuntimeError as e:
                if "commit conflict" in str(e):
                    with lock:
                        retries["compact"] += 1
                else:
                    with lock:
                        errors.append(f"optimize: {e}")
                    return
            time.sleep(2.0)

    # MV refresh loop racing the storm (round-12 ask #5; round 13 adds
    # max): group on v — every landed merge MOVES rows between groups,
    # so each refresh's CDF window carries group churn, and min_k/max_k
    # exercise the at-risk recompute path (stats-pruned base reads
    # racing the OPTIMIZE loop that rewrites those same files) while
    # base commits land mid-refresh
    from aws_medallion_etl_spark import mv as mvmod

    mv_path = path + "_mv"
    mv_stats = {"refreshes": 0, "conflicts": 0}
    stop_mv = threading.Event()
    mv_kw = dict(group_cols=["v"], sums={"sum_k": "k"},
                 mins={"min_k": "k"}, maxs={"max_k": "k"})

    def mv_refresher() -> None:
        while not stop_mv.is_set():
            try:
                mvmod.refresh_rollup(spark, path, mv_path, **mv_kw)
                with lock:
                    mv_stats["refreshes"] += 1
            except RuntimeError as e:
                if "commit conflict" in str(e):
                    with lock:
                        mv_stats["conflicts"] += 1
                else:
                    with lock:
                        errors.append(f"mv: {e}")
                    return
            time.sleep(0.5)

    # JOIN-MV refresh loop (round 14: refresh_join_rollup gained
    # min/max — the signed-union at-risk rule must survive the storm
    # PLUS a racing dim writer): fact = the storm table, dim maps
    # every possible v to a segment, a churner keeps MOVING v-keys
    # between segments mid-refresh, so each window mixes fact churn
    # (term 1), dim churn (term 2), spurious cancel-pairs, and at-risk
    # recomputes against files OPTIMIZE is rewriting.
    jmv_path = path + "_jmv"
    dim_path = path + "_dim"
    all_v = [0] + [w * 100 + m
                   for w in range(writers) for m in range(1, merges_each + 1)]
    sn.snapshot_create(
        spark,
        spark.createDataFrame(
            [(v, f"s{v % 3}") for v in all_v], "v long, seg string"),
        dim_path, stats_cols=["v"])
    jmv_stats = {"refreshes": 0, "conflicts": 0}
    dim_stats = {"moves": 0, "conflicts": 0}
    stop_jmv = threading.Event()
    jmv_kw = dict(on=["v"], group_cols=["seg"], sums={"jsum_k": "k"},
                  mins={"jmin_k": "k"}, maxs={"jmax_k": "k"},
                  dim_churn_threshold=0.9)

    def jmv_refresher() -> None:
        while not stop_jmv.is_set():
            try:
                mvmod.refresh_join_rollup(
                    spark, path, dim_path, jmv_path, **jmv_kw)
                with lock:
                    jmv_stats["refreshes"] += 1
            except RuntimeError as e:
                if "commit conflict" in str(e):
                    with lock:
                        jmv_stats["conflicts"] += 1
                else:
                    with lock:
                        errors.append(f"jmv: {e}")
                    return
            time.sleep(0.6)

    def dim_churner() -> None:
        i = 0
        while not stop_jmv.is_set():
            i += 1
            try:
                sn.update_where(
                    spark, dim_path, f"v % 7 = {i % 7}",
                    {"seg": f"'s{i % 4}'"}, mode="mor")
                with lock:
                    dim_stats["moves"] += 1
            except RuntimeError as e:
                if "commit conflict" in str(e):
                    with lock:
                        dim_stats["conflicts"] += 1
                else:
                    with lock:
                        errors.append(f"dim: {e}")
                    return
            time.sleep(0.8)

    t0 = time.time()
    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(writers)
    ]
    opt = threading.Thread(target=optimizer)
    mvt = threading.Thread(target=mv_refresher)
    jmvt = threading.Thread(target=jmv_refresher)
    dimt = threading.Thread(target=dim_churner)
    opt.start()
    mvt.start()
    jmvt.start()
    dimt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop_optimize.set()
    stop_mv.set()
    stop_jmv.set()
    opt.join()
    mvt.join()
    jmvt.join()
    dimt.join()
    wall = round(time.time() - t0, 2)

    # ---- SAFETY verification against the serial model -------------------
    final = {
        r["k"]: (r["v"], r["_row_id"])
        for r in sn.snapshot_read(spark, path, row_ids=True).collect()
    }
    safety_errors: list[str] = []
    # every original key: the LAST LANDED merge of its writer won
    for w in range(writers):
        lo = w * slice_keys
        landed_m = [m for (ww, m) in landed if ww == w]
        final_val = (w * 100 + max(landed_m)) if landed_m else 0
        for k in range(lo, lo + slice_keys // 2):
            if final[k][0] != final_val:
                safety_errors.append(
                    f"lost update at k={k}: {final[k][0]} != {final_val}"
                )
                break
        for k in range(lo + slice_keys // 2, lo + slice_keys):
            if final[k][0] != 0:
                safety_errors.append(f"clobbered untouched k={k}")
                break
    # exactly the LANDED merges' inserts present (atomicity both ways)
    expect_n = n0 + len(landed) * 10
    if len(final) != expect_n:
        safety_errors.append(f"row count {len(final)} != {expect_n}")
    # row-id invariants: unique everywhere, survivors keep birth ids
    ids = [rid for _, rid in final.values()]
    if len(set(ids)) != len(ids):
        safety_errors.append("duplicate row ids")
    if any(final[k][1] != birth_ids[k] for k in birth_ids):
        safety_errors.append("a surviving row id changed")
    # MV: one settle refresh after the storm, then the rollup must
    # equal a from-scratch GROUP BY of the final base — a lost group,
    # a double-applied window, or a stale min under mid-refresh base
    # commits all diverge here
    mvmod.refresh_rollup(spark, path, mv_path, **mv_kw)
    got_mv = {
        r["v"]: (r["n_rows"], r["sum_k"], r["min_k"], r["max_k"])
        for r in mvmod.read_rollup(spark, mv_path).collect()
    }
    want_mv = {
        r["v"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in sn.snapshot_read(spark, path).groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("k").cast("long").alias("s"),
             F.min("k").cast("long").alias("lo"),
             F.max("k").cast("long").alias("hi")).collect()
    }
    mv_lost = sorted(
        set(want_mv) ^ set(got_mv)
    ) + [g for g in set(want_mv) & set(got_mv) if got_mv[g] != want_mv[g]]
    if mv_lost:
        safety_errors.append(f"mv groups diverged: {mv_lost[:5]}")
    # JOIN-MV: settle refresh, then the rollup must equal the
    # from-scratch fact |><| dim GROUP BY seg of the final state — a
    # group-move applied once-but-not-twice, a spurious cancel-pair
    # that folded, or a min recomputed against the wrong version pair
    # all diverge here
    mvmod.refresh_join_rollup(spark, path, dim_path, jmv_path, **jmv_kw)
    got_jmv = {
        r["seg"]: (r["n_rows"], r["jsum_k"], r["jmin_k"], r["jmax_k"])
        for r in mvmod.read_rollup(spark, jmv_path).collect()
    }
    want_jmv = {
        r["seg"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in sn.snapshot_read(spark, path)
        .join(sn.snapshot_read(spark, dim_path), "v")
        .groupBy("seg")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("k").cast("long").alias("s"),
             F.min("k").cast("long").alias("lo"),
             F.max("k").cast("long").alias("hi")).collect()
    }
    jmv_lost = sorted(
        set(want_jmv) ^ set(got_jmv)
    ) + [g for g in set(want_jmv) & set(got_jmv)
         if got_jmv[g] != want_jmv[g]]
    if jmv_lost:
        safety_errors.append(f"join-mv groups diverged: {jmv_lost[:5]}")
    liveness_ok = len(landed) == writers * merges_each and not errors
    ok = not safety_errors

    versions = sn.current_version(path)
    ops = [h["operation"] for h in sn.snapshot_history(path)]
    record = {
        "writers": writers,
        "merges_each": merges_each,
        "committed_versions": versions,
        "merge_commits": ops.count("MERGE"),
        "optimize_commits": ops.count("OPTIMIZE"),
        "merges_landed": len(landed),
        "op_level_retries": dict(retries),
        "mv_refreshes": mv_stats["refreshes"],
        "mv_refresh_conflicts": mv_stats["conflicts"],
        "mv_verified_zero_lost_groups": not mv_lost,
        "join_mv_refreshes": jmv_stats["refreshes"],
        "join_mv_refresh_conflicts": jmv_stats["conflicts"],
        "dim_moves": dim_stats["moves"],
        "dim_move_conflicts": dim_stats["conflicts"],
        "join_mv_verified_zero_lost_groups": not jmv_lost,
        "wall_s": wall,
        "verified_no_lost_updates": ok,
        "verified_liveness_all_landed": liveness_ok,
        "safety_errors": safety_errors[:10],
        "liveness_errors": errors[:10],
    }
    with open(OUT, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(json.dumps(record, sort_keys=True))
    print(f"-> {OUT}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(jmv_path, ignore_errors=True)
    shutil.rmtree(dim_path, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
