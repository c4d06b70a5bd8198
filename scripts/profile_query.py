"""Per-stage profile of registered queries (guide §1/§7 empirical loop).

Runs each named query through the noop sink (the bench's timed action) and
then reads the local Spark UI REST API for the jobs/stages that ran,
printing a per-stage breakdown: duration, task count, shuffle read/write,
input bytes, and the first line of the stage's call-site name. This is the
"open the UI, find the slowest stage" step of the optimization guide,
scriptable inside the sandbox.

Usage:
    python scripts/profile_query.py [sf_dir] query [query ...]

Prints, per query: wall seconds, then the top stages sorted by duration.
Purely diagnostic — no artifact output, never used by the bench or the
correctness gate.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print("usage: profile_query.py [sf_dir] query [query ...]")
        return

    from experimentsplan_datapipeline_spark.plans.queries import QUERIES
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # warm the JVM/parquet footers so profiles measure the plan
    QUERIES["flagship_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"?? unknown query {name}")
            continue
        jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for st in _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete"):
            if st["stageId"] in stage_ids:
                stages.append(st)
        stages.sort(key=lambda s: -(s.get("executorRunTime", 0)))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        for st in stages[:14]:
            first = (st.get("name") or "").splitlines()[0][:70]
            sub = st.get("submissionTime", "")
            print(
                f"  stage {st['stageId']:>5} run={st.get('executorRunTime',0)/1e3:7.2f}s "
                f"tasks={st.get('numCompleteTasks',0):>4} "
                f"in={st.get('inputBytes',0)>>20:>5}M "
                f"sr={st.get('shuffleReadBytes',0)>>20:>4}M "
                f"sw={st.get('shuffleWriteBytes',0)>>20:>4}M  {first} @{sub[-12:]}"
            )
        njobs = sorted(jobs, key=lambda j: j["jobId"])
        tot_run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
        print(f"  total executorRunTime {tot_run:.2f}s across "
              f"{sum(s.get('numCompleteTasks',0) for s in stages)} tasks; "
              f"jobs {njobs[0]['jobId']}..{njobs[-1]['jobId']}" if njobs else "  no jobs")
    spark.stop()


if __name__ == "__main__":
    main()
