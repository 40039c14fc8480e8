"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (where declared) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and sorted values. Floats compare exactly
first, then with 1e-9 tolerance (reported separately — the driver's
hash compare is exact, so any tolerance-only match is a risk flag).

Writes the full result to ``CORRECTNESS_local.json`` (driver-style
rows for every declared query) so the cumulative record stays
auditable even when the driver's ~50-row-per-round window truncates.
Partial runs (an explicit query list) merge into the existing file
instead of replacing it.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

LOCAL_RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "CORRECTNESS_local.json")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"ROWS {len(spark_rows)} vs {len(duck_rows)}", False
    s = sorted([tuple(norm_cell(v) for v in r) for r in spark_rows], key=repr)
    d = sorted([tuple(norm_cell(v) for v in r) for r in duck_rows], key=repr)
    exact = s == d
    if exact:
        return "OK", True
    # tolerance pass
    for a, b in zip(s, d):
        if len(a) != len(b):
            return "SHAPE", False
        for x, y in zip(a, b):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                    continue
            return f"VALUES differ e.g. {x!r} vs {y!r}", False
    return "FLOAT_TOL (hash risk!)", True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from aws_medallion_etl_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    record: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "err": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(spark_rows),
                            "err": None, "rows_only": True}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {e}")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(spark_rows),
                            "err": f"ORACLE {e}"}
            n_fail += 1
            continue
        row = {"rows_match": len(spark_rows) == len(duck_rows),
               "schema_match": sorted(cols) == sorted(duck_cols),
               "hash_match": False, "spark_rows": len(spark_rows),
               "oracle_rows": len(duck_rows), "err": None}
        if not row["schema_match"]:
            print(f"FAIL  {name}: SCHEMA {sorted(cols)} vs {sorted(duck_cols)}")
            record[name] = row
            n_fail += 1
            continue
        # align column order by name
        sidx = [cols.index(c) for c in sorted(cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = [tuple(r[i] for i in sidx) for r in spark_rows]
        d = [tuple(r[i] for i in didx) for r in duck_rows]
        msg, ok = compare(s, d, sorted(cols))
        row["hash_match"] = bool(ok)
        if msg.startswith("FLOAT_TOL"):
            row["float_tol_only"] = True
        record[name] = row
        status = "ok   " if ok else "FAIL "
        print(f"{status} {name}: {msg} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
        n_pass += ok
        n_fail += not ok
    merged = record
    if only and os.path.exists(LOCAL_RECORD):
        with open(LOCAL_RECORD) as f:
            merged = json.load(f)
        merged.update(record)
        # Prune rows for queries that no longer exist (renames/deletes)
        # so the cumulative record never carries stale entries.
        declared = set(entrymod.queries())
        merged = {k: v for k, v in merged.items() if k in declared}
    with open(LOCAL_RECORD, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only"
          f" -> {os.path.basename(LOCAL_RECORD)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
