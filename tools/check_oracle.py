"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every registered query (or a named subset) on Spark at a given sf_dir,
runs its oracle SQL in DuckDB over the same parquet files, and compares
row count, schema (column names), and an order-insensitive value hash.
Values are normalized before hashing (floats rounded, timestamps → ISO
strings) the same way on both sides, so a PASS here is strong evidence the
driver's hash-match will pass too.

CAVEAT (learned from the round-3 fn_math_suite red row): this replica
normalizes floats with %.6g, which is LOOSER than the driver's
canonicalization — a double-typed column can pass here and still fail the
driver when Spark and DuckDB round differently (ROUND(double, n) is not
bitwise-reproducible across the engines).  For new oracled queries,
prefer exact-integer outputs: CAST(FLOOR(x*scale + 0.5) AS BIGINT) on
both sides.  Also never emit array/map columns — the driver's
canonicalizer cannot hash them (round-3 multimodal_feature_extract
crash); tests/test_properties.py enforces this mechanically.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from distributed_database_for_sql_spark import TABLES  # noqa: E402
from distributed_database_for_sql_spark.queries import registry  # noqa: E402
from distributed_database_for_sql_spark.session import get_spark  # noqa: E402


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ").replace("+00:00", "")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = registry()
    names = args.names or sorted(specs)
    spark = get_spark("check_oracle")
    con = duck_con(args.sf)

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(s_rows)} rows ({dt:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append(f"hash spark={hs} duck={hd}")
                # show first diffs to debug
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = sorted("|".join(_norm(r[i]) for i in order_s) for r in s_rows)
                set_d = sorted("|".join(_norm(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(set_s, set_d):
                    if a != b:
                        problems.append(f"first diff:\n  spark={a}\n  duck ={b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
