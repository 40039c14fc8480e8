"""Incremental materialized-view maintenance over snapshot tables.

The consumer Delta built row tracking + CDF for: keep a rollup table
(a GROUP BY materialization of a big fact table) current by applying
only the CHANGED rows since the last refresh, never rescanning the
base. This module closes that loop with the pieces this engine
already ships:

* the delta comes from :func:`snapshot.snapshot_changes` with
  ``row_ids=True`` — no user key columns needed, so ANY base table
  with row tracking qualifies, including keyless event logs;
* the refresh cursor is the base version stamped as a per-app txn
  mark ON THE MV TABLE (:func:`snapshot.last_txn_version`) — the same
  idempotent-writer contract the streaming sinks use, so a replayed
  refresh no-ops and a crashed one re-runs from the last committed
  cursor;
* the MV update itself is a :func:`snapshot.merge_into` upsert of the
  AFFECTED groups only, followed by a MOR delete of groups whose
  row count reached zero.

Scale shape: a refresh reads commit CHURN (the CDF manifest diff
excludes untouched files before any data is read), aggregates it with
one keyed shuffle, joins the delta against the MV (MV side is
group-cardinality-sized — AQE broadcasts it), and merges into the MV
with file pruning. Cost tracks change volume, not base-table size —
at 100 TB the nightly refresh of a by-day/by-source rollup reads the
day's commits, not the table.

Only SUBTRACTABLE aggregates qualify (sum, count): min/max cannot be
maintained from deltas without per-group history — callers needing
them should recompute those columns or keep an exact-dedup sketch.
The reference's gold rollups (`Meta_Guideline.md` gold-layer KPIs)
are sum/count shaped, as are token-budget corpus ledgers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_medallion_etl_spark import snapshot as snap


def refresh_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    group_cols: list[str],
    sums: dict[str, str],
    app_id: str = "mv.rollup",
) -> dict:
    """Create or incrementally refresh a sum/count rollup MV.

    ``sums`` maps output column names to base-table column expressions
    (SQL strings); the MV schema is ``group_cols + n_rows BIGINT +
    <sums> BIGINT`` — integer measures by contract (the cross-engine
    float discipline: cents in, exact sums out). First call creates
    the MV from a full aggregate of the base's CURRENT version; later
    calls apply only the CDF delta between the stamped cursor and the
    current version:

    * ``insert`` / ``update_postimage`` rows count +1 and add their
      measures; ``delete`` / ``update_preimage`` rows count -1 and
      subtract — an update that MOVES a row between groups decrements
      the old group and increments the new one, for free;
    * groups whose ``n_rows`` reaches zero are deleted (MOR — a
      kilobyte sidecar, not a rewrite);
    * the new cursor (base version) rides the merge commit as the MV's
      ``(app_id, version)`` txn mark, so refresh is exactly-once:
      a replayed call sees the cursor and no-ops.

    Returns ``{"mv_version", "base_version", "groups_changed",
    "created"}``.

    Contract: ``group_cols`` must be NON-NULL in the base (MERGE join
    keys — a NULL group key never matches its own MV row and would
    duplicate instead of update, Delta MERGE's NULL semantics too).
    Coalesce nullable grouping columns to a sentinel first.
    """
    base_v = snap.current_version(base_path)
    if base_v is None:
        raise ValueError(f"refresh_rollup: {base_path} is not a snapshot table")
    sum_exprs = [
        F.sum(F.expr(src)).cast("long").alias(out)
        for out, src in sums.items()
    ]
    if snap.current_version(mv_path) is None:
        full = (
            # pinned at the CAPTURED version: a commit landing between
            # current_version() and this read would otherwise be baked
            # into the initial aggregate AND replayed by the first
            # incremental refresh (double count)
            snap.snapshot_read(spark, base_path, version=base_v)
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"), *sum_exprs)
        )
        v = snap.snapshot_create(
            spark, full, mv_path, stats_cols=list(group_cols),
            txn=(app_id, base_v),
        )
        return {"mv_version": v, "base_version": base_v,
                "groups_changed": -1, "created": True}

    cursor = snap.last_txn_version(mv_path, app_id)
    if cursor is None:
        raise ValueError(
            f"refresh_rollup: {mv_path} exists but carries no "
            f"{app_id!r} cursor — it was not created by this refresher"
        )
    # self-heal BEFORE the cursor check: a crash between the cursor-
    # stamping merge and the zero-group delete would otherwise leave
    # n_rows=0 phantoms forever (the replay early-returns). Zero
    # matches cost one MV-sized scan and commit nothing.
    snap.delete_where(spark, mv_path, "n_rows = 0", mode="mor")
    if cursor >= base_v:
        return {"mv_version": snap.current_version(mv_path),
                "base_version": base_v, "groups_changed": 0,
                "created": False}

    chg = snap.snapshot_changes(
        spark, base_path, v_from=cursor, v_to=base_v, row_ids=True
    )
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = chg.groupBy(*group_cols).agg(
        F.sum(sign).cast("long").alias("__d_rows"),
        *[
            F.sum(sign * F.expr(src)).cast("long").alias(f"__d_{out}")
            for out, src in sums.items()
        ],
    )
    mv = snap.snapshot_read(spark, mv_path)
    merged = (
        delta.join(mv, list(group_cols), "left")
        .select(
            *group_cols,
            (F.coalesce("n_rows", F.lit(0)) + F.col("__d_rows"))
            .cast("long").alias("n_rows"),
            *[
                # both sides coalesced: a change batch whose rows all
                # carry NULL in a measure sums to a NULL delta, which
                # must not wipe the group's accumulated value
                (F.coalesce(out, F.lit(0))
                 + F.coalesce(F.col(f"__d_{out}"), F.lit(0)))
                .cast("long").alias(out)
                for out in sums
            ],
        )
    )
    # the merge's probe/validate/write branches each consume this
    # frame — materialize the (group-cardinality-sized) delta once
    merged = merged.localCheckpoint(eager=False)
    n_changed = merged.count()
    res = snap.merge_into(
        spark, mv_path, merged, on=list(group_cols),
        txn=(app_id, base_v),
    )
    if res.get("skipped"):
        return {"mv_version": res["version"], "base_version": base_v,
                "groups_changed": 0, "created": False}
    # groups emptied by the delta: MOR delete (sidecar, no rewrite)
    snap.delete_where(spark, mv_path, "n_rows = 0", mode="mor")
    return {"mv_version": snap.current_version(mv_path),
            "base_version": base_v, "groups_changed": n_changed,
            "created": False}
