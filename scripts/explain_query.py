"""Dump .explain("formatted") for named bench/gate queries to
$SPARK_GRAFT_PLANS_DIR (default plans/r15)/<query>_<tag>.txt — driver-only (no jobs run), safe to use
while another harness owns the executors.

Usage: python scripts/explain_query.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_query")
    queries = entry_mod.queries()
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{out_dir}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} chars, Exchange~{n_ex} -> {path}")
        release_scratch()


if __name__ == "__main__":
    main()
