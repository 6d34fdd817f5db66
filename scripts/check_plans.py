"""Plan-fingerprint harness: the scale-discipline twin of check_oracle.

check_oracle proves VALUES match; this proves the PLANS stay the shape
the 100 TB story depends on. For every registered query it extracts the
physical-plan properties that must never silently regress:

- cartesian: CartesianProduct / BroadcastNestedLoopJoin present
- py_eval:   row-at-a-time Python (BatchEvalPython) present
- arrow_eval: Arrow-batched Python stages (expected only where an
  operator declares a pandas UDF boundary)
- global_sort / global_window: single-partition total orders over data
  (rangepartitioning to 1 partition is fine for tiny frames; the flag
  tracks Window specs with no PARTITION BY)

Usage:
  python scripts/check_plans.py --snapshot   # (re)write PLANS.json
  python scripts/check_plans.py              # compare against PLANS.json

Comparison policy: booleans only (never exact operator counts — AQE and
statistics legitimately re-shape plans run to run); a query may IMPROVE
(flag true -> false) without failing, but a false -> true transition on
cartesian/py_eval fails, and arrow_eval growth fails unless the
snapshot is refreshed deliberately (a new pandas-UDF boundary should be
a reviewed decision, not an accident).

Snapshot state (reviewed): py_eval=0 everywhere; the 25 cartesian=true
entries are all benign SCALAR-ATTACH joins — a 1-row aggregate
(corpus total, cutoff timestamp, weight normalizer) broadcast-nested-
loop-joined onto a data frame, the standard way to attach a scalar
without a collect. No registered query does a data-by-data cartesian
(separately pinned per-operator in tests/test_plans.py). The check
exists for the TRANSITION: a formerly clean query growing one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.json"
)

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def fingerprint(plan: str) -> dict:
    return {
        "cartesian": "CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "py_eval": "BatchEvalPython" in plan,
        "arrow_eval": "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "FlatMapGroupsInPandas" in plan,
    }


def collect_fingerprints() -> dict:
    import __spark_entry__ as entry_mod
    from bytehub_spark.plans.scratch import release_scratch
    from bytehub_spark.session import get_spark

    spark = get_spark("plan_check")
    out = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = fingerprint(plan)
        except Exception as e:  # plan construction itself failed
            out[name] = {"error": str(e)[:200]}
        finally:
            release_scratch()
        dt = time.time() - t0
        if dt > 5:
            print(f"  (slow plan: {name} {dt:.1f}s)", file=sys.stderr)
    return out


def main() -> int:
    write = "--snapshot" in sys.argv
    got = collect_fingerprints()
    if write:
        with open(SNAPSHOT, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        n_cart = sum(1 for v in got.values() if v.get("cartesian"))
        n_py = sum(1 for v in got.values() if v.get("py_eval"))
        n_arrow = sum(1 for v in got.values() if v.get("arrow_eval"))
        n_err = sum(1 for v in got.values() if "error" in v)
        print(
            f"snapshot: {len(got)} queries -> {SNAPSHOT} "
            f"(cartesian={n_cart} py_eval={n_py} arrow_eval={n_arrow} "
            f"errors={n_err})"
        )
        return 0
    want = json.load(open(SNAPSHOT))
    failures = []
    for name, g in got.items():
        w = want.get(name)
        if w is None:
            failures.append(f"NEW {name}: not in snapshot — refresh PLANS.json")
            continue
        if "error" in g and "error" not in w:
            failures.append(f"ERR {name}: plan construction now fails: {g['error']}")
            continue
        if "error" in w:
            continue
        for flag in ("cartesian", "py_eval", "arrow_eval"):
            if g.get(flag) and not w.get(flag):
                failures.append(f"REGRESSED {name}: {flag} false -> true")
    for f_ in failures:
        print(f_)
    print(("FAIL: " if failures else "OK: ") + f"{len(got)} plans checked, "
          f"{len(failures)} regressions")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
