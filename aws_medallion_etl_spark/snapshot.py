"""Snapshot-versioned parquet tables with copy-on-write MERGE.

The sandbox has no Delta/Iceberg jars, but the semantics those formats
supply to the medallion pipeline — atomic commits, time travel,
idempotent re-runs, and MERGE that rewrites only the files it must —
are a manifest discipline, not a jar. This module implements that
discipline on plain parquet, on top of the same footer-stats
machinery as the file-skipping manifest (``io.collect_file_stats``):

Layout::

    table_root/
      data/c00000/part-*.parquet   immutable data files, one subdir
      data/c00002/part-*.parquet   per commit (files are NEVER edited
                                   or deleted by a commit)
      _snapshots/v00000.json       manifest versions: schema + the
      _snapshots/v00001.json       exact file list + per-file key
                                   stats (min/max/rows)
      _snapshots/v*-files-*.parquet  sidecar file-list checkpoints
                                   (Delta-checkpoint style) once a
                                   version exceeds
                                   CHECKPOINT_FILE_THRESHOLD files —
                                   the JSON then carries a reference,
                                   not 10^6 inline entries

* **Atomic commit.** A manifest is staged to a temp name and
  published with ``os.link`` (create-exclusive): readers see the old
  version or the new one, never half a commit, and two racing writers
  cannot both claim a version — the loser gets ``FileExistsError``
  (optimistic concurrency, same contract as a Delta log commit).
* **Crash safety.** Data files land BEFORE the manifest link; a crash
  between the two leaves orphaned files that no manifest references —
  invisible to every reader, reclaimed by :func:`vacuum`.
* **Time travel.** ``snapshot_read(path, version=N)`` plans exactly
  manifest N's file list; the schema rides in the manifest so even an
  empty version reads with the right shape.
* **Copy-on-write MERGE.** :func:`merge_into` rewrites ONLY the data
  files whose key-range stats overlap the source's keys (a broadcast
  range join of file bounds against distinct source keys); untouched
  files are carried into the new manifest by reference. At 100 TB a
  merge touching one day of keys rewrites one day of files — the
  reference's full-dimension rewrite (``Meta_Guideline.md:2728-2731``)
  shrinks to the overlap, which is exactly what Delta's MERGE +
  file-pruning buys. Swapping this module for real Delta is a
  one-call change per site (documented at each call).

Differences from Delta, stated honestly: schema evolution on merge is
add-column only (``schema_evolution=True``; no drop/retype), no
deletion vectors (COW only), single-table transactions only, and the
optimistic-concurrency loser must re-run rather than auto-rebase.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from aws_medallion_etl_spark import io as eio

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"

# Above this many files the manifest's entry list is checkpointed as a
# sidecar PARQUET file (Delta-checkpoint style) instead of inline JSON:
# a 10^6-file table is ~200 MB of JSON parsed row-by-row, but a few MB
# of parquet read columnar via pyarrow in well under a second. The
# JSON manifest stays the atomic commit unit either way.
CHECKPOINT_FILE_THRESHOLD = 2000


def _snap_dir(path: str) -> str:
    return os.path.join(path.rstrip("/"), _SNAP_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:05d}.json")


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, ascending. Empty list -> not a snapshot table."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(path: str) -> int | None:
    vs = snapshot_versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _write_files_checkpoint(
    path: str, version: int, entries: list[dict], stats_cols: list[str]
) -> str:
    """Write manifest file entries as a sidecar parquet checkpoint and
    return its (uuid-suffixed, collision-free) file name. Written
    BEFORE the manifest link, so a crashed or losing writer leaves an
    unreferenced sidecar — invisible and reclaimed by :func:`vacuum`.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: dict[str, list] = {
        "file": [e["file"] for e in entries],
        "rows": [e.get("rows") for e in entries],
    }
    for c in stats_cols:
        sts = [e.get("stats", {}).get(c) or {} for e in entries]
        cols[f"{c}::kind"] = [s.get("kind") for s in sts]
        cols[f"{c}::min"] = [s.get("min") for s in sts]
        cols[f"{c}::max"] = [s.get("max") for s in sts]
    name = f"v{version:05d}-files-{uuid.uuid4().hex[:8]}.parquet"
    d = _snap_dir(path)
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table(cols), os.path.join(d, name))
    return name


def _manifest_files(path: str, man: dict) -> list[dict]:
    """File entries of a manifest — inline JSON (small tables) or the
    sidecar parquet checkpoint (``files_ref``, big tables), read
    columnar via pyarrow (no Spark job; a 10^6-file checkpoint is a
    few MB and parses in well under a second)."""
    if "files_ref" not in man:
        return man["files"]
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(_snap_dir(path), man["files_ref"]))
    d = t.to_pydict()
    stats_cols = man.get("columns", [])
    entries = []
    for i in range(len(d["file"])):
        stats = {}
        for c in stats_cols:
            kind = d.get(f"{c}::kind", [None])[i]
            stats[c] = (
                {"kind": kind, "min": d[f"{c}::min"][i],
                 "max": d[f"{c}::max"][i]}
                if kind is not None else None
            )
        entries.append({"file": d["file"][i], "rows": d["rows"][i],
                        "stats": stats})
    return entries


def _commit(path: str, version: int, manifest: dict) -> None:
    """Publish a manifest atomically and exclusively.

    ``os.link`` fails with EEXIST if the version was already claimed —
    the optimistic-concurrency gate. The temp file lives in the same
    directory so the link never crosses filesystems.
    """
    d = _snap_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, _manifest_path(path, version))
    except FileExistsError:
        raise RuntimeError(
            f"snapshot commit conflict: version {version} of {path} was "
            "committed concurrently — re-read the table and re-run the merge"
        ) from None
    finally:
        os.unlink(tmp)


def _write_commit_files(
    df: DataFrame, path: str, version: int, stats_cols: list[str]
) -> list[dict]:
    """Write ``df`` as the data files of commit ``version`` and return
    manifest entries (paths relative to the table root).

    The commit dir carries a uuid suffix so a crashed attempt or a
    racing writer at the same version can never collide — the loser's
    files stay unreferenced (invisible) until :func:`vacuum`.
    """
    root = path.rstrip("/")
    commit_rel = os.path.join(
        _DATA_DIR, f"c{version:05d}-{uuid.uuid4().hex[:8]}"
    )
    commit_dir = os.path.join(root, commit_rel)
    df.write.mode("error").parquet(commit_dir)
    entries = eio.collect_file_stats(commit_dir, stats_cols)
    for e in entries:
        e["file"] = os.path.join(commit_rel, e["file"])
    return entries


def _files_fields(
    path: str, version: int, files: list[dict], stats_cols: list[str]
) -> dict:
    """Manifest fragment for the file list: inline under the
    checkpoint threshold, sidecar parquet reference above it."""
    if len(files) <= CHECKPOINT_FILE_THRESHOLD:
        return {"files": files}
    ref = _write_files_checkpoint(path, version, files, stats_cols)
    return {"files_ref": ref, "n_files": len(files)}


def snapshot_create(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list[str],
) -> int:
    """Create version 0 of a snapshot table from ``df``.

    ``stats_cols`` are the columns whose per-file min/max ride the
    manifest — put the MERGE/SCD key columns here; they are what
    :func:`merge_into` prunes on. Refuses an existing snapshot table
    (use :func:`merge_into` or commit a new version explicitly).
    """
    if snapshot_versions(path):
        raise ValueError(f"snapshot_create: {path} is already a snapshot table")
    files = _write_commit_files(df, path, 0, stats_cols)
    _commit(path, 0, {
        "version": 0,
        "schema": df.schema.json(),
        "columns": stats_cols,
        **_files_fields(path, 0, files, stats_cols),
    })
    return 0


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned manifest version (default: latest) — time travel.

    Plans exactly the manifest's file list; files added by later
    commits or orphaned by crashed ones are invisible by construction.
    """
    vs = snapshot_versions(path)
    if not vs:
        raise ValueError(f"snapshot_read: {path} is not a snapshot table")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"snapshot_read: {path} has no version {v} (have {vs})")
    man = _read_manifest(path, v)
    schema = StructType.fromJson(json.loads(man["schema"]))
    root = path.rstrip("/")
    files = [os.path.join(root, e["file"]) for e in _manifest_files(path, man)]
    if not files:
        return spark.createDataFrame([], schema)
    # pin the manifest schema: partition-style or footer re-inference
    # must never reshape a time-travel read
    return spark.read.schema(schema).parquet(*files)


def _touched_files(
    spark: SparkSession,
    files: list[dict],
    stat_cols: list[str],
    source: DataFrame,
    on: list[str],
) -> tuple[list[dict], list[dict]]:
    """Split manifest entries into (touched, untouched) by key-range
    overlap with the source's distinct keys.

    A file is provably untouched if for SOME key column with usable
    stats, no source value lands inside the file's [min, max]. The
    check runs as one broadcast range join: file bounds (manifest,
    driver-side, file-count-sized) against the source's distinct key
    values — never a scan of target data. Files without usable stats
    are conservatively touched; unknown stat kinds only cost rewrite
    I/O, never correctness.
    """
    probe_col = probe_kind = None
    for c in on:
        if c in stat_cols:
            kinds = {
                (e["stats"].get(c) or {}).get("kind")
                for e in files
            } & {"int", "str", "float"}
            if kinds:
                probe_col, probe_kind = c, sorted(kinds)[0]
                break
    if probe_col is None or not files:
        return list(files), []
    bounds, no_stats = [], []
    for i, e in enumerate(files):
        st = e["stats"].get(probe_col)
        # one homogeneous kind per probe: a file whose stat kind
        # differs (shouldn't happen for one column) stays touched
        if st and st["kind"] == probe_kind:
            bounds.append((i, st["min"], st["max"]))
        else:
            no_stats.append(i)
    touched_idx = set(no_stats)
    if bounds:
        bdf = spark.createDataFrame(bounds, ["__fidx", "__lo", "__hi"])
        keys = source.select(F.col(probe_col).alias("__k")).where(
            F.col("__k").isNotNull()
        ).distinct()
        hit = (
            keys.join(
                F.broadcast(bdf),
                (F.col("__k") >= F.col("__lo")) & (F.col("__k") <= F.col("__hi")),
            )
            .select("__fidx")
            .distinct()
            .collect()
        )
        touched_idx |= {r["__fidx"] for r in hit}
    touched = [e for i, e in enumerate(files) if i in touched_idx]
    untouched = [e for i, e in enumerate(files) if i not in touched_idx]
    return touched, untouched


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
    check_duplicate_keys: bool = False,
    schema_evolution: bool = False,
) -> dict:
    """SQL MERGE onto a snapshot table, copy-on-write, atomically.

    ``when_matched``: ``"update"`` (replace the whole target row with
    the source row), ``"delete"``, or ``None`` (leave matched rows).
    ``when_not_matched``: ``"insert"`` or ``None``. The source must be
    unique on ``on`` (standard MERGE precondition — a duplicate makes
    the update nondeterministic); ``check_duplicate_keys=True`` spends
    one aggregate to enforce it.

    ``schema_evolution=True`` is Delta's ``mergeSchema`` for MERGE:
    source columns absent from the target are APPENDED (nullable) to
    the table schema in the new manifest version. Untouched files
    carry over by reference unchanged — the pinned-schema read
    returns NULL for the added columns from old files (parquet
    missing-column semantics), so no rewrite is needed; time travel
    to pre-evolution versions still reads the old shape. Add-column
    only: a source still missing a TARGET column is an error either
    way (dropping/retyping columns is not MERGE's job).

    Scale shape: untouched files (no key overlap, proven from manifest
    stats) carry over by reference — zero read, zero write. Touched
    files are read once, merged against the (broadcastable) source,
    and rewritten into the new commit directory together with inserts.
    Because a source key outside every untouched file's range can only
    live in touched files, the insert anti-join needs only the touched
    subset — the merge never scans the whole table.

    Re-running the same merge is idempotent in content (same updates
    apply again, would-be inserts now match and update in place) and
    each run is a new pinnable version. On a cluster with Delta
    available this call site becomes ``DeltaTable.merge`` verbatim.
    """
    if when_matched not in {"update", "delete", None}:
        raise ValueError(f"merge_into: unknown when_matched={when_matched!r}")
    if when_not_matched not in {"insert", None}:
        raise ValueError(
            f"merge_into: unknown when_not_matched={when_not_matched!r}"
        )
    vs = snapshot_versions(path)
    if not vs:
        raise ValueError(f"merge_into: {path} is not a snapshot table")
    base_v = vs[-1]
    man = _read_manifest(path, base_v)
    schema = StructType.fromJson(json.loads(man["schema"]))
    tcols = [f.name for f in schema.fields]
    missing = [c for c in tcols if c not in source.columns]
    if missing:
        raise ValueError(f"merge_into: source lacks target columns {missing}")
    extra = [c for c in source.columns if c not in tcols]
    evolved = []
    if extra and not schema_evolution:
        # silently dropping source data is the one wrong option —
        # Delta errors on updateAll with unknown columns too
        raise ValueError(
            f"merge_into: source has columns {extra} the target lacks; "
            "pass schema_evolution=True to append them, or drop them "
            "from the source"
        )
    if schema_evolution and extra:
        evolved = extra
        new_fields = [
            StructField(f.name, f.dataType, True)
            for f in source.select(*evolved).schema.fields
        ]
        schema = StructType(list(schema.fields) + new_fields)
        tcols = [f.name for f in schema.fields]
    # Cast the source to the manifest schema: a source key column of a
    # different physical type would make the pruning probe compare keys
    # cross-type (implicit casts can wrongly prove files untouched ->
    # lost updates) and would write data files diverging from the
    # pinned schema, breaking later snapshot_read. Structurally
    # impossible casts raise at plan time; VALUE-level failures are
    # engine-mode-dependent (ANSI raises at runtime, legacy mode yields
    # NULL) — and a key silently cast to NULL would turn an update into
    # a NULL-key insert and lose the intended row, so retyped KEY
    # columns get an explicit probe before anything is written.
    retyped_keys = [
        c for c in on if source.schema[c].dataType != schema[c].dataType
    ]
    if retyped_keys:
        nulled = None
        for c in retyped_keys:
            # try_cast: NULL-on-failure in BOTH ANSI and legacy mode,
            # so the probe is deterministic across engine confs
            p = (
                F.col(c).isNotNull()
                & F.col(c).try_cast(schema[c].dataType).isNull()
            )
            nulled = p if nulled is None else (nulled | p)
        if source.where(nulled).limit(1).count():
            raise ValueError(
                f"merge_into: casting source key columns {retyped_keys} to "
                "the manifest schema NULLed at least one non-null value — "
                "the merge would lose updates; fix the source types"
            )
    src = source.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    if check_duplicate_keys:
        dupes = src.groupBy(*on).count().where(F.col("count") > 1).limit(1).count()
        if dupes:
            raise ValueError(
                f"merge_into: source is not unique on {on} — MERGE updates "
                "would be nondeterministic; dedup the source first"
            )

    man_files = _manifest_files(path, man)
    touched, untouched = _touched_files(
        spark, man_files, man.get("columns", []), src, on
    )
    root = path.rstrip("/")
    if touched:
        tgt = spark.read.schema(schema).parquet(
            *[os.path.join(root, e["file"]) for e in touched]
        )
    else:
        tgt = spark.createDataFrame([], schema)

    tgt_keys = tgt.select(*on).distinct()
    kept = tgt.join(src.select(*on), on, "left_anti")
    parts = [kept]
    if when_matched == "update":
        parts.append(src.join(tgt_keys, on, "semi"))
    elif when_matched is None:
        parts = [tgt]  # matched target rows stay as-is
    # when_matched == "delete": matched target rows simply dropped
    if when_not_matched == "insert":
        parts.append(src.join(tgt_keys, on, "left_anti"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    new_v = base_v + 1
    new_files = _write_commit_files(out, path, new_v, man.get("columns", on))
    _commit(path, new_v, {
        "version": new_v,
        "schema": schema.json() if evolved else man["schema"],
        "columns": man.get("columns", on),
        **_files_fields(
            path, new_v, untouched + new_files, man.get("columns", on)
        ),
    })
    return {
        "version": new_v,
        "files_rewritten": len(touched),
        "files_untouched": len(untouched),
        "files_added": len(new_files),
        "columns_added": evolved,
    }


def vacuum(
    path: str, keep_versions: int = 1, retention_seconds: float = 86400.0
) -> dict:
    """Delete data files referenced by NO retained manifest (crash
    orphans and files only older versions point at), and drop the
    pruned manifests. ``keep_versions`` >= 1 latest versions survive —
    time travel works within the retained window, exactly Delta's
    ``VACUUM`` trade.

    ``retention_seconds`` protects in-flight writers (Delta's VACUUM
    retention model): an unreferenced file younger than the window is
    skipped, because a concurrent :func:`merge_into` writes its commit
    directory BEFORE linking the manifest — deleting those files would
    let the writer's ``os.link`` succeed while referencing vanished
    data. Only pass ``retention_seconds=0`` when no writer can be
    running (the same contract Delta documents for shrinking the
    retention below the default)."""
    import time

    if keep_versions < 1:
        raise ValueError("vacuum: keep_versions must be >= 1")
    vs = snapshot_versions(path)
    if not vs:
        raise ValueError(f"vacuum: {path} is not a snapshot table")
    keep = vs[-keep_versions:]
    root = path.rstrip("/")
    live = set()
    live_refs = set()
    for v in keep:
        man = _read_manifest(path, v)
        if "files_ref" in man:
            live_refs.add(man["files_ref"])
        for e in _manifest_files(path, man):
            live.add(os.path.normpath(e["file"]))
    cutoff = time.time() - retention_seconds
    removed_files = skipped_recent = 0
    reclaimed_dirs: set[str] = set()
    data_root = os.path.join(root, _DATA_DIR)
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            f = os.path.join(dirpath, name)
            rel = os.path.normpath(os.path.relpath(f, root))
            if name.endswith(".parquet") and rel not in live:
                if os.path.getmtime(f) > cutoff:
                    skipped_recent += 1
                    continue
                os.unlink(f)
                removed_files += 1
                reclaimed_dirs.add(dirpath)
    for v in vs:
        if v not in keep:
            os.unlink(_manifest_path(path, v))
    # sidecar file-list checkpoints: drop those no retained manifest
    # references (pruned versions', and crashed/losing writers') —
    # same retention window as data files (a racing writer stages its
    # checkpoint BEFORE the manifest link)
    for name in os.listdir(_snap_dir(path)):
        if (
            "-files-" in name and name.endswith(".parquet")
            and name not in live_refs
        ):
            f = os.path.join(_snap_dir(path), name)
            if os.path.getmtime(f) <= cutoff:
                os.unlink(f)
    # drop commit dirs holding no parquet anymore (markers like
    # _SUCCESS go with them) so the layout stays legible — but never
    # a dir young enough that its writer may still be pre-commit.
    # A dir we just reclaimed files FROM is fair game even though
    # the unlinks bumped its mtime past the cutoff: its parquet was
    # retention-old, so no in-flight writer owns it (commit dirs are
    # uuid-unique per writer and an in-flight writer's files are
    # younger than any retention window that deleted these).
    for dirpath, _dirs, names in list(os.walk(data_root, topdown=False)):
        if dirpath == data_root:
            continue
        if os.path.getmtime(dirpath) > cutoff and dirpath not in reclaimed_dirs:
            continue
        if not any(n.endswith(".parquet") for n in names):
            for n in names:
                os.unlink(os.path.join(dirpath, n))
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
    return {
        "removed_files": removed_files,
        "skipped_recent": skipped_recent,
        "kept_versions": keep,
    }
