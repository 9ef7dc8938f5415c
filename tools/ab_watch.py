"""Interleaved A/B bench runner for WATCH-ITEM queries (VERDICT r13
item 6): time a small named query set against an arbitrary CODE TREE
(current repo or a frozen prior-round worktree) so per-query deltas can
be attributed to code vs host noise.  Run it alternating A (current)
and B (frozen) on the same host — >= 3 pairs — and compare medians plus
direction stability across pairs.

Usage:
    python tools/ab_watch.py <code_root> <out_json> <q1,q2,...> [repeats]

The script inserts <code_root> at the FRONT of sys.path, so the package
under test is the one in that tree, not the caller's.  Timing protocol
matches bench.py: warm scan + pandas-UDF worker pool, then median of N
full materializations per query.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    code_root, out_path, names = sys.argv[1], sys.argv[2], sys.argv[3]
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    sys.path.insert(0, code_root)

    from distributed_database_for_sql_spark.queries import registry
    from distributed_database_for_sql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-watch")
    # warmups mirror bench.py: scan + long/string/array pandas-UDF JIT
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    import pandas as pd
    from pyspark.sql import functions as F

    def _noop(s):
        import numpy  # noqa: F401
        return s

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(32).select(
        F.pandas_udf(_noop, "long")(F.col("id"))).count()

    def _noop_arr(s):
        return s

    _noop_arr.__annotations__ = {"s": pd.Series, "return": pd.Series}
    warm = spark.range(32).select(
        F.col("id").cast("string").alias("s"),
        F.array("id", "id").alias("arr"),
        F.array(F.col("id").cast("double")).alias("darr"))
    warm.select(
        F.pandas_udf(_noop_arr, "string")(F.col("s")),
        F.pandas_udf(_noop_arr, "array<long>")(F.col("arr")),
        F.pandas_udf(_noop_arr, "array<double>")(F.col("darr"))).count()

    specs = registry()
    out: dict = {"code_root": os.path.abspath(code_root), "sf": sf_dir,
                 "repeats": repeats, "queries": {}, "spread": {}}
    for name in names.split(","):
        spec = specs[name]
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            spec.fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        runs.sort()
        out["queries"][name] = round(runs[len(runs) // 2], 3)
        out["spread"][name] = [round(runs[0], 3), round(runs[-1], 3)]
        print(f"# {name}: median {out['queries'][name]}s "
              f"of {[round(r, 3) for r in runs]}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["queries"]))


if __name__ == "__main__":
    main()
