"""Trace every Spark job fired by one query run: call site, duration,
task count — the fixed-overhead ledger behind tools/profile_query.py's
bare job counts.

Usage: python tools/job_trace.py <query> [top_n]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from de_final_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(sc) -> list[dict]:
    base = sc.uiWebUrl
    app = sc.applicationId
    out: list[dict] = []
    # page through: default limit may cap; use status API with large limit
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/jobs", timeout=20
    ) as r:
        out = json.load(r)
    return out


def main() -> None:
    name = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    qs["dim_customer"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    before = {j["jobId"] for j in _jobs(spark.sparkContext)}
    t0 = time.perf_counter()
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = [j for j in _jobs(spark.sparkContext) if j["jobId"] not in before]
    rows = []
    for j in jobs:
        t = None
        if j.get("submissionTime") and j.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                a = datetime.strptime(j["submissionTime"], fmt)
                b = datetime.strptime(j["completionTime"], fmt)
                t = (b - a).total_seconds()
            except ValueError:
                t = None
        rows.append(
            (
                t if t is not None else -1,
                j["jobId"],
                j.get("numTasks", -1),
                (j.get("name") or "")[:110],
            )
        )
    rows.sort(reverse=True)
    print(f"QUERY {name}: wall {wall:.2f}s, {len(jobs)} jobs")
    tot = sum(r[0] for r in rows if r[0] > 0)
    print(f"sum of job durations: {tot:.2f}s (gaps = driver time)")
    for t, jid, ntasks, nm in rows[:top]:
        print(f"{t:7.3f}s  job {jid:4d}  tasks {ntasks:4d}  {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
