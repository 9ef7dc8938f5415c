"""Audit oracle SQL output types for driver-hash hazards.

The round-1 driver hash mismatch on q12 was a type-normalization artifact:
DuckDB types SUM(<integer>) as HUGEINT (int128), which survives our local
str()-based normalizer but not the driver's (HUGEINT converts to float64 on
the pandas path, so "277" hashes as "277.0").  This tool DESCRIBEs every
registered oracle in DuckDB and flags any output column whose DuckDB type
is HUGEINT/UHUGEINT, plus any column whose DuckDB type class (integer vs
floating vs other) disagrees with the Spark schema — both must be CAST to
matching types in the oracle and/or the Spark builder.

Usage:
    python tools/check_types.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from distributed_database_for_sql_spark import TABLES  # noqa: E402
from distributed_database_for_sql_spark.queries import registry  # noqa: E402

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE"}

SPARK_INT = {"byte", "short", "int", "integer", "long", "bigint"}
SPARK_FLOAT = {"float", "double"}


def type_class(duck_type: str) -> str:
    t = duck_type.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in INT_TYPES:
        return "int"
    if t in FLOAT_TYPES:
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return "other"


def spark_class(spark_type: str) -> str:
    t = spark_type.lower()
    if t in SPARK_INT:
        return "int"
    if t in SPARK_FLOAT:
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    return "other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--spark", action="store_true",
                    help="also cross-check against the Spark schema (slow)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    spark = None
    if args.spark:
        from distributed_database_for_sql_spark.session import get_spark
        spark = get_spark("check_types")

    specs = registry()
    names = args.names or sorted(specs)
    n_flag = 0
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            continue
        try:
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: describe failed: {e}")
            n_flag += 1
            continue
        duck_types = {r[0]: r[1] for r in desc}
        flags = [f"{c}:{t} is HUGEINT" for c, t in duck_types.items()
                 if type_class(t) == "hugeint"]
        if spark is not None:
            try:
                sdf = spec.fn(spark, args.sf)
                for f_ in sdf.schema.fields:
                    dt = duck_types.get(f_.name)
                    if dt is None:
                        continue
                    dc, sc = type_class(dt), spark_class(f_.simpleString()
                                                         .split(":")[-1])
                    if dc != sc and {dc, sc} & {"int", "float", "hugeint",
                                                "decimal"}:
                        if {dc, sc} == {"int", "float"} or "hugeint" in (
                                dc, sc) or "decimal" in (dc, sc):
                            flags.append(
                                f"{f_.name}: duck={dt} vs spark="
                                f"{f_.dataType.simpleString()}")
            except Exception as e:  # noqa: BLE001
                flags.append(f"spark side failed: {e}")
        if flags:
            n_flag += 1
            print(f"FLAG  {name}: " + "; ".join(sorted(set(flags))))
    print(f"\n{n_flag} queries flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
