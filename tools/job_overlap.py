"""Timeline of every Spark job fired by one query run: submission /
completion instants (relative seconds) plus a concurrency flag — the
evidence artifact for guide §2.6 overlapped driver actions (r13's
overlapped index/verdict commits). A job whose window intersects the
previous job's window prints ``∥``; sequential jobs print ``.``.

Usage: python tools/job_overlap.py <query> [out_file]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from de_final_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(sc) -> list[dict]:
    base = sc.uiWebUrl
    app = sc.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/jobs?status=succeeded", timeout=10
    ) as r:
        return json.load(r)


def _ts(s: str) -> float:
    return dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    name = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("job-overlap")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    qs["dim_customer"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    before = {j["jobId"] for j in _jobs(spark.sparkContext)}
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    jobs = [
        j for j in _jobs(spark.sparkContext) if j["jobId"] not in before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    t0 = min(_ts(j["submissionTime"]) for j in jobs)
    lines = [f"QUERY {name}: {len(jobs)} jobs (t=0 at first submission)"]
    n_overlap = 0
    prev_end = None
    for j in jobs:
        s = _ts(j["submissionTime"]) - t0
        e = _ts(j["completionTime"]) - t0
        mark = "."
        if prev_end is not None and s < prev_end - 1e-3:
            mark = "∥"  # parallel with the previous job's window
            n_overlap += 1
        prev_end = e if prev_end is None else max(prev_end, e)
        lines.append(
            f"  {mark} job {j['jobId']:>4}  [{s:8.3f} .. {e:8.3f}]s  "
            f"tasks {j['numTasks']:>4}  {j.get('description') or j['name'][:70]}"
        )
    lines.append(f"overlapped jobs: {n_overlap} / {len(jobs)}")
    text = "\n".join(lines)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
