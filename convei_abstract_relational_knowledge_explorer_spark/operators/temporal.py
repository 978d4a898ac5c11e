"""Temporal joins Spark lacks natively — as-of join via the union-window
trick (no UDF, no range explosion).

The reference's event-shaped data is append-only progress logs scanned
with per-row Python loops (/root/reference/build_reports.py report
re-scan idiom); at stream scale the canonical temporal primitive is the
AS-OF join: for every left row, the single most recent right row with
``right.ts <= left.ts`` for the same key.  Spark has no built-in as-of
join (SPARK-22947 open for years); the scalable formulation is:

  1. union both sides with a side tag, right rows carrying their payload
     and left rows NULL
  2. one window per key ordered by (ts, side): ``last(payload,
     ignoreNulls=true)`` over rows-unbounded-preceding gives every left
     row the latest right payload at-or-before its timestamp
  3. filter back to left rows

One shuffle on the key, sort within partition, no join amplification —
the plan survives billions of rows per key-day because the window is
hash-partitioned by key (skewed keys: pre-salt by day like skew.py).
Right rows are pre-aggregated per (key, ts) so ties are deterministic
in every engine (DuckDB's ASOF JOIN, which the q45 oracle uses, picks
an arbitrary row among equal timestamps otherwise).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
    payload_alias: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``payload_alias`` = the
    ``payload`` of the latest ``right`` row with ``right.ts <= left.ts``
    and the same ``key`` (NULL when no prior right row exists).

    ``right`` is deduplicated to one row per (key, ts) by max(payload)
    first, so the result is deterministic under timestamp ties.
    """
    r = (
        right.groupBy(F.col(key).alias(key), F.col(ts).alias(ts))
        .agg(F.max(payload).alias("_p"))
        .select(key, ts, "_p", F.lit(0).alias("_side"))
    )
    l_cols = left.columns
    l = left.select(
        *l_cols, F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(payload_alias, F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*l_cols, payload_alias)
    )
