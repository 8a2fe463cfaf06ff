"""Profile single queries: wall time + job/stage counts via the status
REST API, per rep. The job/stage delta tells WHERE fixed overhead lives
(action count) vs compute; pair with capture_plans.py for plan shape.

Usage: python tools/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_REPS (2).
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
REPS = int(os.environ.get("PROFILE_REPS", "2"))


def _counts(sc) -> tuple[int, int]:
    base = sc.uiWebUrl
    app = sc.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=succeeded", timeout=10
        ) as r:
            jobs = json.load(r)
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            stages = json.load(r)
    except OSError:
        return (-1, -1)
    return (len(jobs), len(stages))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warm
    qs["dim_customer"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        reps = []
        for rep in range(REPS):
            j0, s0 = _counts(spark.sparkContext)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            j1, s1 = _counts(spark.sparkContext)
            reps.append(
                {"wall": round(dt, 3), "jobs": j1 - j0, "stages": s1 - s0}
            )
        out[name] = reps
        print(name, json.dumps(reps), flush=True)
    print("SUMMARY", json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
