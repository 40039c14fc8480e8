"""Custom Python Data Source (Spark 4 DataSource API) — S-extension.

The reference's source surface is files + JDBC; Spark 4 adds a public
API for implementing NEW sources in Python (`pyspark.sql.datasource`),
the sanctioned way to wire a bespoke system (an internal service, a
queue, a generator) into the scan side of the engine. This module
ships one real implementation:

``SyntheticDocsDataSource`` — a partitioned, deterministic document
generator. Every row is a pure function of its ``doc_id``, so the
relation it produces is reproducible on any engine — which is exactly
what lets the DuckDB oracle verify a NON-FILE source end-to-end
(``s20_python_datasource``): the oracle rebuilds the same rows from
``generate_series`` arithmetic.

Scale notes: ``partitions()`` splits the keyspace into
``num_partitions`` independent ranges, so the scan parallelizes like
any file scan; rows stream out of each partition's iterator in
Arrow batches (no driver materialization). A Python data source pays
Python-worker serialization per batch — the documented trade for
custom-source flexibility; bulk analytics stays on parquet/ORC scans.
"""

from __future__ import annotations

import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: token i of doc d is ``w<(d*7+i*3)%13>``.

    Chosen to be trivially reproducible in ANSI SQL (modular
    arithmetic only — no hashes, no RNG), while still varying token
    sequences across documents.
    """
    n_tokens = 5 + (doc_id % 7)
    return " ".join(f"w{(doc_id * 7 + i * 3) % 13}" for i in range(n_tokens))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        if self.n_docs <= 0:
            return [_RangePartition(0, 0)]  # empty relation, one no-op split
        step = -(-self.n_docs // self.num_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars bigint"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the custom source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Streaming source: tail a snapshot table's committed versions
# ---------------------------------------------------------------------------

def _snapshot_schema(path: str):
    import json as _json

    from pyspark.sql.types import StructType

    from aws_medallion_etl_spark import snapshot as snap

    v = snap.current_version(path)
    if v is None:
        raise ValueError(f"snapshot_append: {path} is not a snapshot table")
    return StructType.fromJson(
        _json.loads(snap._read_manifest(path, v)["schema"])
    )


class SnapshotAppendStreamReader(SimpleDataSourceStreamReader):
    """Driver-side micro-batch reader over a snapshot table's manifest
    history — the semantics of ``spark.readStream`` on a Delta table.

    Offsets are ``{"version": N}``; each batch emits the rows of data
    files INTRODUCED by versions ``(start, current]`` (append
    semantics: with mor/append-only writers, new files contain exactly
    the new rows). A version that REMOVES a previously-streamed file
    or attaches a deletion vector to one is a data change a pure
    append stream cannot represent — it raises unless
    ``ignore_changes=true``, exactly Delta's
    ``ignoreChanges``/``ignoreDeletes`` contract. Reading committed
    manifests only means a concurrent writer can never expose a half
    batch.

    Scale notes: this is the SIMPLE (driver-side) reader — rows flow
    through one Python process, right-sized for CDC-scale feeds (the
    deltas, not the table). A corpus-scale backfill belongs on the
    partitioned batch path (``snapshot_read``), not a stream replay.
    """

    def __init__(self, options):
        self.path = str(options["path"]).rstrip("/")
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )

    # -- SimpleDataSourceStreamReader interface -------------------------
    def initialOffset(self):
        return {"version": -1}

    def read(self, start):
        from aws_medallion_etl_spark import snapshot as snap

        cur = snap.current_version(self.path)
        v0 = int(start["version"])
        if cur is None or cur <= v0:
            return iter([]), dict(start)
        # a MATERIALIZED list-iterator, not a generator: Spark's
        # simple-reader prefetch cache calls next() on the return value
        # AND copy.copy()s it between planning and execution — a
        # generator fails the copy, a bare list fails the next(). Batch
        # size = the delta between offsets — CDC-scale by design (see
        # class doc).
        return iter(list(self._rows_between(v0, cur))), {"version": cur}

    def readBetweenOffsets(self, start, end):
        return iter(list(
            self._rows_between(int(start["version"]), int(end["version"]))
        ))

    def commit(self, end):
        pass

    # -- internals -------------------------------------------------------
    def _rows_between(self, v0: int, v1: int):
        import os as _os

        import pyarrow.parquet as _pq

        from aws_medallion_etl_spark import snapshot as snap

        names = [f.name for f in _snapshot_schema(self.path).fields]
        cur_man = snap._read_manifest(
            self.path, snap.current_version(self.path)
        )
        cmap = cur_man.get("colmap") or {}
        phys = [cmap.get(n, n) for n in names]
        versions = [v for v in snap.snapshot_versions(self.path) if v <= v1]
        prev: dict[str, tuple] = {}
        if v0 >= 0:
            prev = {
                e["file"]: tuple(sorted(e.get("dv") or []))
                for e in snap._manifest_files(
                    self.path, snap._read_manifest(self.path, v0)
                )
            }
        for v in versions:
            if v <= v0:
                continue
            entries = snap._manifest_files(
                self.path, snap._read_manifest(self.path, v)
            )
            cur = {
                e["file"]: tuple(sorted(e.get("dv") or [])) for e in entries
            }
            removed = set(prev) - set(cur)
            dv_grown = {
                f for f in set(prev) & set(cur) if cur[f] != prev[f]
            }
            if (removed or dv_grown) and not self.ignore_changes:
                raise ValueError(
                    f"snapshot_append: version {v} of {self.path} removed "
                    f"or rewrote already-streamed data "
                    f"({len(removed)} files gone, {len(dv_grown)} gained "
                    "deletion vectors) — an append stream cannot represent "
                    "that; set option ignore_changes=true to skip, or "
                    "consume snapshot_changes() in batch"
                )
            for e in entries:
                if e["file"] in prev:
                    continue
                t = _pq.read_table(_os.path.join(self.path, e["file"]))
                have = set(t.column_names)
                for row in t.to_pylist():
                    # files speak PHYSICAL column names (renames are
                    # manifest-only); emit in logical schema order
                    yield tuple(
                        row[p] if p in have else None for p in phys
                    )
            prev = cur


class SnapshotAppendDataSource(DataSource):
    """``spark.readStream.format("snapshot_append").option("path", p)``
    — the Delta streaming-source surface over snapshot tables, via the
    Spark 4 Python streaming DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_append"

    def schema(self):
        return _snapshot_schema(str(self.options["path"]))

    def simpleStreamReader(self, schema):
        return SnapshotAppendStreamReader(self.options)


def register_streaming(spark) -> None:
    """Idempotently register the snapshot streaming source."""
    spark.dataSource.register(SnapshotAppendDataSource)


# ---------------------------------------------------------------------------
# Streaming source: change data feed of a snapshot table
# ---------------------------------------------------------------------------

def _live_rows_pyarrow(path: str, entries: list[dict], names: list[str]):
    """Rows of the given manifest entries as python tuples, deletion
    vectors applied — the pyarrow mirror of ``snapshot._scan_live``
    for the driver-side stream reader (no Spark inside a DataSource).
    Missing columns (pre-evolution files) read as None."""
    import os as _os

    import pyarrow.parquet as _pq

    out = []
    for e in entries:
        dead: set[int] = set()
        for ref in e.get("dv") or []:
            # each sidecar is a parquet dir of (file, row_index)
            dv = _pq.read_table(
                _os.path.join(path, ref), columns=["file", "row_index"]
            ).to_pydict()
            dead.update(
                int(p) for f, p in zip(dv["file"], dv["row_index"])
                if f == e["file"]
            )
        t = _pq.read_table(_os.path.join(path, e["file"]))
        have = set(t.column_names)
        rows = t.to_pylist()
        for pos, row in enumerate(rows):
            if pos in dead:
                continue
            out.append(tuple(row[n] if n in have else None for n in names))
    return out


class SnapshotCDFStreamReader(SimpleDataSourceStreamReader):
    """Streaming CHANGE DATA FEED over a snapshot table — Delta's
    ``readChangeFeed`` surface: each micro-batch emits the row-level
    changes of the versions committed since the last offset, typed as
    ``_change_type`` ∈ (insert, delete, update_preimage,
    update_postimage) with the ``_commit_version`` that produced them.

    Per consecutive version pair the reader diffs the manifests FIRST
    ((file, DV-set) signatures — files carried unchanged never load),
    reads only the churned files via pyarrow with deletion vectors
    applied, and computes the keyed diff driver-side — exact
    ``snapshot_changes`` semantics, per single version step, no Spark
    job inside the source. CDC-scale by design, like the append
    reader: the rows that flow are the CHANGES, not the table.
    """

    def __init__(self, options):
        self.path = str(options["path"]).rstrip("/")
        keys = str(options.get("key_cols", "")).strip()
        if not keys:
            raise ValueError(
                "snapshot_cdf: option key_cols (comma-separated) is required"
            )
        self.key_cols = [k.strip() for k in keys.split(",") if k.strip()]

    def initialOffset(self):
        from aws_medallion_etl_spark import snapshot as snap

        # CDF starts at the CURRENT version: changes are what happens
        # next (Delta's startingVersion=latest); a backfill of history
        # is the batch snapshot_changes call
        v = snap.current_version(self.path)
        return {"version": -1 if v is None else int(v)}

    def read(self, start):
        from aws_medallion_etl_spark import snapshot as snap

        cur = snap.current_version(self.path)
        v0 = int(start["version"])
        if cur is None or cur <= v0:
            return iter([]), dict(start)
        return (
            iter(self._changes_between(v0, cur)),
            {"version": int(cur)},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            self._changes_between(int(start["version"]), int(end["version"]))
        )

    def commit(self, end):
        pass

    # -- internals -------------------------------------------------------
    def _changes_between(self, v0: int, v1: int):
        import json as _json

        from aws_medallion_etl_spark import snapshot as snap

        out = []
        all_vs = snap.snapshot_versions(self.path)
        versions = [v for v in all_vs if v0 <= v <= v1]
        if not versions or versions[0] != v0:
            # the stream's offset predates the retained history (vacuum
            # pruned manifests past it): silently zipping from the
            # first survivor would SKIP the pruned commits' changes —
            # fail loudly instead (Delta's CDF raises the same way)
            raise ValueError(
                f"snapshot_cdf: offset version {v0} of {self.path} is no "
                f"longer retained (have {all_vs}) — the feed cannot "
                "reconstruct the pruned commits; restart from a fresh "
                "offset or lengthen vacuum retention"
            )
        for prev_v, v in zip(versions, versions[1:]):
            man_a = snap._read_manifest(self.path, prev_v)
            man_b = snap._read_manifest(self.path, v)
            names = [
                f["name"] for f in _json.loads(man_b["schema"])["fields"]
            ]
            cmap = man_b.get("colmap") or {}
            phys = [cmap.get(n, n) for n in names]
            kidx = [names.index(k) for k in self.key_cols]
            vidx = [i for i in range(len(names)) if i not in kidx]

            def sig(e):
                return (e["file"], tuple(sorted(e.get("dv") or [])))

            ea = snap._manifest_files(self.path, man_a)
            eb = snap._manifest_files(self.path, man_b)
            common = {sig(e) for e in ea} & {sig(e) for e in eb}
            old = {
                tuple(r[i] for i in kidx): r
                for r in _live_rows_pyarrow(
                    self.path, [e for e in ea if sig(e) not in common],
                    phys,
                )
            }
            new = {
                tuple(r[i] for i in kidx): r
                for r in _live_rows_pyarrow(
                    self.path, [e for e in eb if sig(e) not in common],
                    phys,
                )
            }
            def differs(a, b):
                # NaN-aware: batch snapshot_changes compares with
                # eqNullSafe, under which NaN == NaN — Python's != says
                # NaN != NaN, which would emit phantom update pairs for
                # every untouched NaN row on a touched-file diff
                if a is b:
                    return False
                if (isinstance(a, float) and isinstance(b, float)
                        and math.isnan(a) and math.isnan(b)):
                    return False
                return a != b

            for k, r in new.items():
                if k not in old:
                    out.append((*r, "insert", v))
                else:
                    o = old[k]
                    if any(differs(o[i], r[i]) for i in vidx):
                        out.append((*o, "update_preimage", v))
                        out.append((*r, "update_postimage", v))
            for k, r in old.items():
                if k not in new:
                    out.append((*r, "delete", v))
        return out


class SnapshotCDFDataSource(DataSource):
    """``spark.readStream.format("snapshot_cdf").option("path", p)
    .option("key_cols", "k1,k2")`` — streaming change data feed."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField

        base = _snapshot_schema(str(self.options["path"]))
        return type(base)(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def simpleStreamReader(self, schema):
        return SnapshotCDFStreamReader(self.options)


def register_cdf_streaming(spark) -> None:
    """Idempotently register the CDF streaming source."""
    spark.dataSource.register(SnapshotCDFDataSource)
