"""Bounded-state sketches: KMV distinct-count and count-min frequency.

The 100 TB motivation is the same for both: exact ``countDistinct`` /
``groupBy(key)`` over a web corpus shuffles the full key population —
with Zipfian keys that means head-entity reducers holding 10^8+ rows.
These operators bound the state by construction:

- :func:`kmv_distinct` keeps only the k smallest distinct key hashes
  (per group), a ``TakeOrderedAndProject``-shaped reduction whose state
  is k longs regardless of cardinality; the estimate is the classic
  K-minimum-values ``(k-1) * M / h_(k)`` (Bar-Yossef et al., RANDOM'02).
- :func:`count_min_build` folds the corpus into a ``depth x width``
  integer grid (Cormode & Muthukrishnan, J.Alg'05) — a groupBy whose
  key space is FIXED at depth*width cells, so map-side combine collapses
  every partition to at most that many rows and no reducer ever sees a
  head key's full mass; :func:`count_min_query` broadcast-joins query
  keys against the grid and takes the per-lane min.

Both use the portable md5 hash family (``dedup.porthash64`` /
``porthash_lanes``), so estimates are bit-identical in ANSI SQL — the
approximation itself is oracle-checkable, the repo's q26 standard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .dedup import porthash64, porthash_lanes

#: size of the 60-bit portable hash space (2^60)
HASH_SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """K-minimum-values distinct-count estimate →
    (``by``..., n_kept, kth_hash, n_distinct_est).

    Exact when a group has fewer than ``k`` distinct keys (the sketch
    degenerates to the distinct set itself); otherwise the estimate is
    ``floor((k-1) * 2^60 / h_(k))``.  ``(k-1) * 2^60`` is exactly
    representable as a double for any practical k, the division is one
    IEEE-correctly-rounded op, and floor (unlike round, whose half-way
    rule differs between engines) is unambiguous — the estimate is
    bit-identical cross-engine.

    Plan shape: distinct (group, hash) → per-group ordered window capped
    at k rows (hash-partitioned by group; the global case is a 1-group
    window over at most k surviving rows per upstream partition — Spark
    prunes with WindowGroupLimit) → one-row-per-group aggregate.
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    gcols = list(by or [])
    h = porthash64(F.col(key_col).cast("string"), "kmv")
    hashes = df.select(*gcols, h.alias("_h")).distinct()
    w = (
        Window.partitionBy(*gcols).orderBy("_h")
        if gcols
        else Window.partitionBy(F.lit(1)).orderBy("_h")
    )
    topk = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    est_saturated = F.floor(
        F.lit(float((k - 1) * HASH_SPACE)) / F.max("_h")
    ).cast("long")
    return topk.groupBy(*gcols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("_h").alias("kth_hash"),
        F.when(F.count("*") < k, F.count("*"))
        .otherwise(est_saturated)
        .cast("long")
        .alias("n_distinct_est"),
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold rows into a count-min grid → (lane, cell, c).

    At most ``depth * width`` output rows no matter the input size; the
    groupBy key space is the grid itself, so partial aggregation bounds
    every exchange at depth*width rows per map task — Zipf-head-proof by
    construction.  ``weight_col`` accumulates weighted counts.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    keyed = df.select(
        h1.alias("_h1"), h2.alias("_h2"), w.alias("_w")
    ).select(
        F.posexplode(F.array(*[lane % width for lane in lanes])).alias(
            "lane", "cell"
        ),
        "_w",
    )
    return keyed.groupBy("lane", "cell").agg(
        F.sum("_w").cast("long").alias("c")
    )


def count_min_query(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 1024
) -> DataFrame:
    """Point-query the grid → (``key_col``, est).

    ``est`` is the per-lane minimum — an upper bound on the true count
    with the usual (e/width, 1-e^-depth) guarantee.  The sketch side is
    tiny (depth*width rows) and broadcast; the probe is |keys| * depth
    rows joined on (lane, cell).
    """
    depth = sketch.agg(F.max("lane")).first()[0] + 1
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    probes = keys.select(
        F.col(key_col), h1.alias("_h1"), h2.alias("_h2")
    ).select(
        key_col,
        F.posexplode(F.array(*[lane % width for lane in lanes])).alias(
            "lane", "cell"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["lane", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
