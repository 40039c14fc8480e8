"""Per-phase timing attribution for one snapshot DML query (VERDICT r11
ask #1): run a regressed query under cProfile and print the cumulative
time of every snapshot.py phase — fence listing, heartbeat,
revalidation, DV mint (RLE encode), manifest IO, data write — so the
constant-per-commit overhead is measured, not guessed.

Usage: python tools/dml_phase_profile.py [query_name] [sf_dir]
"""
from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "s25_delete_vectors"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from aws_medallion_etl_spark.session import get_spark as get_session
    from aws_medallion_etl_spark.queries import QUERIES

    spark = get_session()
    # warm the JVM so the profile isn't dominated by session startup
    spark.range(10).count()

    prof = cProfile.Profile()
    t0 = time.monotonic()
    prof.enable()
    QUERIES[name](spark, sf_dir).collect()
    prof.disable()
    wall = time.monotonic() - t0
    print(f"\n=== {name} @ {sf_dir}: wall {wall:.2f}s ===")

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    rows = []
    for (fn_file, _line, fn_name), (cc, nc, tt, ct, _callers) in \
            st.stats.items():
        if "snapshot.py" in fn_file or "queries" in fn_file:
            rows.append((ct, tt, nc, f"{fn_file.split('/')[-1]}:{fn_name}"))
    rows.sort(reverse=True)
    print(f"{'cum_s':>8} {'tot_s':>8} {'calls':>7}  function")
    for ct, tt, nc, label in rows[:40]:
        print(f"{ct:8.3f} {tt:8.3f} {nc:7d}  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
