"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r14/before [--sf DIR] [names...]

With no names, captures every bench query (HEADLINE + EXTRA from bench.py).
Each query's scenario runs once (side effects included) and the FINAL
DataFrame's formatted plan is written to plans/<tag>/<name>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_database_for_sql_spark.queries import registry  # noqa: E402
from distributed_database_for_sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    names = args.names
    if not names:
        import bench
        names = list(bench.HEADLINE) + list(bench.EXTRA)

    spark = get_spark("plans")
    specs = registry()
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # capture the failure, keep going
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"# {name}: {time.time() - t0:.1f}s -> {outdir}/{name}.txt",
              flush=True)


if __name__ == "__main__":
    main()
