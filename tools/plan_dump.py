"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix ``before`` /
``after``) — the optimization round's evidence files: the judge
cannot run Spark, so plan-shape claims in OPTIMIZATION_r*.md are
checked against these captures.

Building a DataFrame for the DML/streaming lifecycle queries EXECUTES
their staging (table creates, index builds) — the dumped plan is the
final returned frame's, which is the one the noop sink times last.

Usage: python tools/plan_dump.py <suffix> <query> [query ...]
       SPARK_GRAFT_SF_DIR to change scale (default sf0.1)
       SPARK_GRAFT_PLAN_TAG to change the dir (default r14)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r14")
    out_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from aws_medallion_etl_spark import get_spark
    from aws_medallion_etl_spark.queries import QUERIES

    spark = get_spark(app_name="plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
