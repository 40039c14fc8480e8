"""Count Spark JOBS (actions) a query launches, plus wall time.

In local mode each action costs a fixed ~0.1-0.5 s of scheduling /
commit overhead, so the action count is the denominator behind the
"commit-count dominated" queries (s42-s49, str*). This tool runs ONE
query under a job group and reports how many jobs fired and the wall
split between the build (driver-side, zero jobs expected) and the
noop-sink execution — the first number to look at before touching a
heavy query's internals.

Usage: python tools/job_count_profile.py <query> [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from aws_medallion_etl_spark import get_spark
    from aws_medallion_etl_spark.queries import QUERIES

    spark = get_spark(app_name="job_count_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # JVM warmup

    tracker = spark.sparkContext.statusTracker()
    for rep in range(reps):
        group = f"prof_{name}_{rep}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.monotonic() - t0
        jobs_build = len(tracker.getJobIdsForGroup(group))
        df.write.mode("overwrite").format("noop").save()
        wall = time.monotonic() - t0
        jobs_total = len(tracker.getJobIdsForGroup(group))
        n_stages = 0
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        print(
            f"rep{rep}: wall {wall:6.2f}s  build {t_build:6.2f}s "
            f"({jobs_build} jobs)  total {jobs_total} jobs, "
            f"{n_stages} stages",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
