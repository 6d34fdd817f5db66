"""Per-query profiler for the optimization rounds: runs one (or more)
bench queries in isolation with the Spark UI enabled, prints best-of-N
wall time, job/stage counts and per-stage wall/metrics read from the
status API, and dumps .explain("formatted") next to the numbers.

Usage: python scripts/profile_query.py <query> [query ...] [--reps N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile_query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    queries = entry_mod.queries()
    # warmup
    queries["ts_time_bounds"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        fn = queries[name]
        times = []
        tracker = sc.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for rep in range(reps):
            # scratch stays warm across reps, released after the query —
            # the bench.py best-of-3 lifecycle
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        sc.setJobDescription(None)
        # stage stats for the LAST rep via REST
        import json
        import urllib.request

        app_id = sc.applicationId
        base = f"http://localhost:4049/api/v1/applications/{app_id}"
        stages = json.loads(
            urllib.request.urlopen(f"{base}/stages?status=complete").read()
        )
        jobs = json.loads(urllib.request.urlopen(f"{base}/jobs").read())
        rep_desc = f"{name} rep{reps-1}"
        rep_jobs = [j for j in jobs if j.get("description") == rep_desc]
        stage_ids = sorted(
            {s for j in rep_jobs for s in j.get("stageIds", [])}
        )
        by_id = {}
        for s in stages:
            by_id.setdefault(s["stageId"], s)
        print(f"\n=== {name}: reps {[round(t,3) for t in times]} "
              f"best {min(times):.3f}s | jobs {len(rep_jobs)} "
              f"stages {len(stage_ids)} (last rep)")
        tot = 0.0
        rows = []
        for sid in stage_ids:
            s = by_id.get(sid)
            if not s:
                continue
            import datetime as _dt

            def _p(x):
                return _dt.datetime.strptime(
                    x.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()

            dur = (
                _p(s["completionTime"]) - _p(s["firstTaskLaunchedTime"])
                if s.get("completionTime") and s.get("firstTaskLaunchedTime")
                else 0.0
            )
            tot += dur
            rows.append(
                (
                    dur,
                    f"  stage {sid}: {dur*1000:7.0f}ms tasks={s['numCompleteTasks']:3d} "
                    f"in={s['inputBytes']:>9d} sh_r={s['shuffleReadBytes']:>8d} "
                    f"sh_w={s['shuffleWriteBytes']:>8d} | {s['name'].splitlines()[0][:70]}"
                )
            )
        for dur, line in sorted(rows, reverse=True):
            print(line)
        print(f"  sum of stage wall: {tot:.3f}s")
        release_scratch()


if __name__ == "__main__":
    main()
