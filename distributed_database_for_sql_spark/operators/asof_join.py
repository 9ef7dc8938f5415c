"""As-of join — a temporal operator Spark has no native primitive for.

`asof_join_backward(left, right, ...)` attaches, to every left row, the
payload of the latest right row with the same key whose timestamp is <=
the left row's timestamp (inclusive backward as-of; the TSDB / trading
"last known value" join).

Spark-first plan (SURVEY.md §2.C "custom operators", option (a) —
composition of built-in ops):

    union(tagged left, tagged right)
      → window partitionBy(key) orderBy(ts, side-priority)
      → last(payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
      → keep left rows

This is ONE shuffle on the key (the window sort), zero row multiplication,
and no Python — compare with the naive `left join right ON key AND
r.ts <= l.ts` + max-window, which explodes quadratically per key.  At
100 TB both sides shuffle once on the key; skewed keys fall to AQE.

An equivalent per-key `applyInPandas` + `pd.merge_asof` exists as
`asof_join_backward_pandas` for the case where per-group pandas logic is
already needed; the window form is preferred (JVM-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join; returns left columns + renamed right payload.

    right_cols maps right-side source column -> output column name.
    strict=False keeps ties (right.ts == left.ts) visible to the left row.
    """
    left_fields = [f for f in left.schema.fields if f.name not in (on, left_ts)]
    payload_src = list(right_cols)
    payload_dst = [right_cols[c] for c in payload_src]
    right_schema = {f.name: f.dataType for f in right.schema.fields}

    # Side priority orders equal timestamps: right first (visible) unless strict.
    right_prio, left_prio = (0, 1) if not strict else (1, 0)

    left_u = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(left_prio).alias("_prio"),
        *[F.col(f.name) for f in left_fields],
        *[F.lit(None).cast(right_schema[src]).alias(dst)
          for src, dst in zip(payload_src, payload_dst)],
    )
    right_u = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_prio).alias("_prio"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_fields],
        *[F.col(src).alias(dst) for src, dst in zip(payload_src, payload_dst)],
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_prio").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = left_u.unionByName(right_u)
    for dst in payload_dst:
        filled = filled.withColumn(dst, F.last(dst, ignorenulls=True).over(w))

    return (
        filled.filter(F.col("_prio") == left_prio)
        .select(on, F.col("_asof_ts").alias(left_ts),
                *[f.name for f in left_fields], *payload_dst)
    )


def asof_join_backward_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """Pandas-UDF variant: cogroup per key, `pd.merge_asof` per group.

    Kept for parity testing and as the escape hatch when the payload
    logic outgrows window expressions.  Arrow-batched; one shuffle.
    """
    import pandas as pd

    out_schema = left.schema.simpleString()[7:-1]  # strip 'struct<' ... '>'
    extra = ",".join(
        f"{dst}:{right.schema[src].dataType.simpleString()}"
        for src, dst in right_cols.items()
    )
    schema = (out_schema + "," + extra).replace(":", " ")

    payload = [(src, dst) for src, dst in right_cols.items()]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        rsel = rpdf[[right_ts] + [s for s, _ in payload if s != right_ts]].copy()
        rsel = rsel.sort_values(right_ts)
        rename = {s: d for s, d in payload}
        rsel = rsel.rename(columns=rename)
        merged = pd.merge_asof(
            lpdf, rsel,
            left_on=left_ts,
            right_on=rename.get(right_ts, right_ts),
            direction="backward",
        )
        return merged[[c.split(" ")[0] for c in schema.split(",")]]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, schema)
