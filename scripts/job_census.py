"""One-rep job/stage census over every bench query: the structural
(steal-immune) companion to bench.py — per query, how many sequential
jobs and stages one noop-sink materialization schedules. High job
counts flag repeated-subtree evaluation / sequential driver phases
(the r14 optimization round's primary signal).

Usage: python scripts/job_census.py [out.json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import BENCH_QUERIES
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/job_census.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job_census")
    sc = spark.sparkContext
    queries = entry_mod.queries()
    tracker = sc.statusTracker()
    rows = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"census {name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(after - before)
        n_stages = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                n_stages += len(ji.stageIds)
        rows[name] = {
            "jobs": len(new_jobs),
            "stages": n_stages,
            "wall": round(wall, 3),
        }
        release_scratch()
    sc.setJobDescription(None)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["jobs"]):
        print(f"{name:34s} jobs={r['jobs']:3d} stages={r['stages']:3d} wall={r['wall']:7.2f}")


if __name__ == "__main__":
    main()
