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

Aggregate support (round 12 widened past sum/count — the reference's
gold rollups carry ``avg_*`` columns, ``Meta_Guideline.md:2947-2954``):

* ``sums`` (and the implicit ``n_rows`` count) are SUBTRACTABLE —
  maintained purely from the delta;
* ``avgs`` ride exact integer companions (``__sum_<c>`` /
  ``__cnt_<c>``, both subtractable) with the double quotient
  materialized in ONE division at merge time — cross-engine float
  discipline: the stored sums/counts are bit-exact, only the final
  column is floating point;
* ``mins`` / ``maxs`` are NOT subtractable: inserts fold in with
  ``least``/``greatest``, and only the groups a delete actually put
  AT RISK (a deleted value that ties the stored extreme, or a group
  first seen mid-window with deletes) recompute — against the base
  with the manifest's group-column stats pruning
  (:func:`snapshot.snapshot_read` ``prune=``), so recompute cost
  tracks at-risk-group data, not base size.

Read contract: a refresh lands as a merge commit plus a separate
zero-group MOR delete, so a reader between the two — or after a crash
before the delete, until the next refresh's self-heal — can observe
phantom groups with ``n_rows = 0`` (their other columns hold STALE
last-known values — sums/extremes as of the emptying delta, not
NULL). Consumers
must filter ``n_rows > 0``; :func:`read_rollup` does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_medallion_etl_spark import snapshot as snap


def read_rollup(
    spark: SparkSession, mv_path: str, version: int | None = None
) -> DataFrame:
    """Read a rollup MV with the consumer contract applied: phantom
    ``n_rows = 0`` groups (the window between a refresh's merge commit
    and its zero-group delete, or a crash inside it) are filtered out.
    Always read MVs through this, not a bare ``snapshot_read``."""
    return snap.snapshot_read(spark, mv_path, version=version).where(
        F.col("n_rows") > 0
    )


def _avg_cols(avgs: dict[str, str]) -> list:
    """The materialized avg columns: one exact division of the two
    integer companions (NULL when no non-null values — SQL AVG)."""
    return [
        F.when(
            F.col(f"__cnt_{out}") > 0,
            F.col(f"__sum_{out}").cast("double") / F.col(f"__cnt_{out}"),
        ).alias(out)
        for out in avgs
    ]


def refresh_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    group_cols: list[str],
    sums: dict[str, str],
    app_id: str = "mv.rollup",
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    avgs: dict[str, str] | None = None,
) -> dict:
    """Create or incrementally refresh a rollup MV.

    ``sums`` / ``mins`` / ``maxs`` / ``avgs`` map output column names
    to base-table column expressions (SQL strings). The MV schema is
    ``group_cols + n_rows BIGINT + <sums> BIGINT + [per avg:
    __sum_<c> BIGINT, __cnt_<c> BIGINT, <c> DOUBLE] + <mins>/<maxs>
    BIGINT`` — integer measures by contract (the cross-engine float
    discipline: cents in, exact sums out; the avg double is ONE
    division of two exact integers). First call creates the MV from a
    full aggregate of the base's CURRENT version; later calls apply
    only the CDF delta between the stamped cursor and the current
    version:

    * ``insert`` / ``update_postimage`` rows count +1 and add their
      measures; ``delete`` / ``update_preimage`` rows count -1 and
      subtract — an update that MOVES a row between groups decrements
      the old group and increments the new one, for free;
    * min/max fold inserts in with ``least``/``greatest``; a group is
      RECOMPUTED from the base (stats-pruned to the at-risk key range,
      then exact semi-join) only when a deleted value ties its stored
      extreme or the group both appeared and shrank inside the window
      — deletes strictly inside the envelope can't move an extreme;
    * groups whose ``n_rows`` reaches zero are deleted (MOR — a
      kilobyte sidecar, not a rewrite);
    * the new cursor (base version) rides the merge commit as the MV's
      ``(app_id, version)`` txn mark, so refresh is exactly-once:
      a replayed call sees the cursor and no-ops.

    Returns ``{"mv_version", "base_version", "groups_changed",
    "groups_recomputed", "created"}``.

    Contract: ``group_cols`` must be NON-NULL in the base (MERGE join
    keys — a NULL group key never matches its own MV row and would
    duplicate instead of update, Delta MERGE's NULL semantics too).
    Coalesce nullable grouping columns to a sentinel first. Consumers
    read through :func:`read_rollup` (``n_rows > 0``).
    """
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    avgs = dict(avgs or {})
    base_v = snap.current_version(base_path)
    if base_v is None:
        raise ValueError(f"refresh_rollup: {base_path} is not a snapshot table")

    # (output alias, agg builder over a sign/expr) for the subtractable
    # family: sums, plus each avg's exact integer companions
    sub_cols = list(sums.items()) + [
        (f"__sum_{out}", src) for out, src in avgs.items()
    ]

    def _full_aggs():
        out = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        out += [F.sum(F.expr(src)).cast("long").alias(o) for o, src in sub_cols]
        out += [
            F.count(F.expr(src)).cast("long").alias(f"__cnt_{o}")
            for o, src in avgs.items()
        ]
        out += [F.min(F.expr(src)).cast("long").alias(o) for o, src in mins.items()]
        out += [F.max(F.expr(src)).cast("long").alias(o) for o, src in maxs.items()]
        return out

    def _with_avgs(df: DataFrame) -> DataFrame:
        return df.select("*", *_avg_cols(avgs)) if avgs else df

    if snap.current_version(mv_path) is None:
        full = (
            # pinned at the CAPTURED version: a commit landing between
            # current_version() and this read would otherwise be baked
            # into the initial aggregate AND replayed by the first
            # incremental refresh (double count)
            snap.snapshot_read(spark, base_path, version=base_v)
            .groupBy(*group_cols)
            .agg(*_full_aggs())
        )
        full = _with_avgs(full)
        v = snap.snapshot_create(
            spark, full, mv_path, stats_cols=list(group_cols),
            txn=(app_id, base_v),
        )
        return {"mv_version": v, "base_version": base_v,
                "groups_changed": -1, "groups_recomputed": 0,
                "created": True}

    cursor = snap.last_txn_version(mv_path, app_id)
    if cursor is None:
        raise ValueError(
            f"refresh_rollup: {mv_path} exists but carries no "
            f"{app_id!r} cursor — it was not created by this refresher"
        )
    # self-heal BEFORE the cursor check: a crash between the cursor-
    # stamping merge and the zero-group delete would otherwise leave
    # n_rows=0 phantoms forever (the replay early-returns). The
    # limit(1) probe keeps the common no-phantom case at ONE small
    # scan instead of delete_where's scan+sidecar+readback jobs.
    if snap.snapshot_read(spark, mv_path).where("n_rows = 0") \
            .limit(1).count():
        snap.delete_where(spark, mv_path, "n_rows = 0", mode="mor")
    if cursor >= base_v:
        return {"mv_version": snap.current_version(mv_path),
                "base_version": base_v, "groups_changed": 0,
                "groups_recomputed": 0, "created": False}

    chg = snap.snapshot_changes(
        spark, base_path, v_from=cursor, v_to=base_v, row_ids=True
    )
    is_add = F.col("_change_type").isin("insert", "update_postimage")
    sign = F.when(is_add, F.lit(1)).otherwise(F.lit(-1))
    delta_aggs = [
        F.sum(sign).cast("long").alias("__d_rows"),
        *[
            F.sum(sign * F.expr(src)).cast("long").alias(f"__d_{out}")
            for out, src in sub_cols
        ],
        *[
            F.sum(
                sign * F.expr(src).isNotNull().cast("long")
            ).cast("long").alias(f"__d_cnt_{out}")
            for out, src in avgs.items()
        ],
    ]
    # insert-side extremes fold in monotonically; delete-side extremes
    # decide which groups a removal could actually have changed
    for out, src in mins.items():
        delta_aggs.append(
            F.min(F.when(is_add, F.expr(src))).cast("long")
            .alias(f"__ins_{out}")
        )
        delta_aggs.append(
            F.min(F.when(~is_add, F.expr(src))).cast("long")
            .alias(f"__del_{out}")
        )
    for out, src in maxs.items():
        delta_aggs.append(
            F.max(F.when(is_add, F.expr(src))).cast("long")
            .alias(f"__ins_{out}")
        )
        delta_aggs.append(
            F.max(F.when(~is_add, F.expr(src))).cast("long")
            .alias(f"__del_{out}")
        )
    delta_aggs.append(
        F.sum((~is_add).cast("long")).cast("long").alias("__n_del")
    )
    delta = chg.groupBy(*group_cols).agg(*delta_aggs)
    mv = snap.snapshot_read(spark, mv_path)
    joined = delta.join(mv, list(group_cols), "left")

    recomputed = None
    n_recompute = 0
    if mins or maxs:
        # the at-risk probe AND the merged projection both consume this
        # (group-cardinality-sized) frame; without a checkpoint each
        # action re-reads the whole CDF window lineage (measured: the
        # incremental refresh dropped ~3s at sf0.1)
        joined = joined.localCheckpoint(eager=False)
        # AT-RISK groups: a delete can only move an extreme if it
        # removed a row TYING the stored one (deleted values strictly
        # inside the envelope are spectators), or the group has no MV
        # row yet but shrank inside this same window (its insert-side
        # fold would overcount). NULL-valued deletes never qualify
        # (min/max skip NULLs) — the NULL comparison is falsy here.
        risk = F.lit(False)
        for out in mins:
            risk = risk | (F.col(f"__del_{out}") <= F.col(out))
        for out in maxs:
            risk = risk | (F.col(f"__del_{out}") >= F.col(out))
        risk = (F.col("__n_del") > 0) & (
            risk | F.col("n_rows").isNull()
        )
        risk_keys = joined.where(risk).select(*group_cols) \
            .localCheckpoint(eager=False)
        n_recompute = risk_keys.count()
        if n_recompute:
            # stats-pruned base scan: bound each group column by the
            # at-risk key envelope (one tiny aggregate), drop every
            # file the manifest proves disjoint, THEN semi-join exact
            bounds_row = risk_keys.agg(
                *[f for c in group_cols for f in (
                    F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")
                )]
            ).first()
            prune = {
                c: (bounds_row[f"__lo_{c}"], bounds_row[f"__hi_{c}"])
                for c in group_cols
            }
            recomputed = (
                snap.snapshot_read(spark, base_path, version=base_v,
                                   prune=prune)
                .join(risk_keys, list(group_cols), "semi")
                .groupBy(*group_cols)
                .agg(
                    *[F.min(F.expr(src)).cast("long").alias(f"__rc_{o}")
                      for o, src in mins.items()],
                    *[F.max(F.expr(src)).cast("long").alias(f"__rc_{o}")
                      for o, src in maxs.items()],
                    F.lit(1).alias("__rc"),
                )
            )
            joined = joined.join(recomputed, list(group_cols), "left")

    out_cols = [
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
            for out, _ in sub_cols
        ],
        *[
            (F.coalesce(f"__cnt_{out}", F.lit(0))
             + F.coalesce(F.col(f"__d_cnt_{out}"), F.lit(0)))
            .cast("long").alias(f"__cnt_{out}")
            for out in avgs
        ],
    ]
    has_rc = F.col("__rc").isNotNull() if recomputed is not None \
        else F.lit(False)
    for out in mins:
        # least/greatest skip NULLs in both engines: a new group takes
        # the insert extreme, an untouched-extreme group keeps its own
        folded = F.least(F.col(out), F.col(f"__ins_{out}"))
        out_cols.append(
            (F.when(has_rc, F.col(f"__rc_{out}")).otherwise(folded)
             if recomputed is not None else folded)
            .cast("long").alias(out)
        )
    for out in maxs:
        folded = F.greatest(F.col(out), F.col(f"__ins_{out}"))
        out_cols.append(
            (F.when(has_rc, F.col(f"__rc_{out}")).otherwise(folded)
             if recomputed is not None else folded)
            .cast("long").alias(out)
        )
    merged = joined.select(*out_cols)
    merged = _with_avgs(merged)
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
                "groups_changed": 0, "groups_recomputed": 0,
                "created": False}
    # groups emptied by the delta: MOR delete (sidecar, no rewrite) —
    # skipped outright when the merged frame carried no zero group
    # (the common case; one cheap checkpoint re-read decides)
    if merged.where(F.col("n_rows") == 0).limit(1).count():
        snap.delete_where(spark, mv_path, "n_rows = 0", mode="mor")
    return {"mv_version": snap.current_version(mv_path),
            "base_version": base_v, "groups_changed": n_changed,
            "groups_recomputed": n_recompute, "created": False}
