"""Explicit skew handling for head entities (north_rule requirement).

Head entities ("United States", "Landsat", "China") dominate the mention
and edge tables — the same phenomenon the reference special-cases with its
us-heuristic bucket (/root/reference/populate_author_locations.py:262-266).
AQE's skew-join splitting covers joins; aggregations need explicit salt:

  salted_count_distinct: two-phase agg — phase 1 groups on
  (key, salt = pmod(xxhash64(value), S)) computing partial distinct counts,
  phase 2 merges.  The hot key's work spreads over S reducers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_salt(df: DataFrame, value_col: str, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from the value being aggregated (not random —
    resume-stable and idempotent)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """count(distinct value) per key, two-phase over a salt column.

    Phase 1 shuffles on (key, salt) — the hot key fans out over n_salts
    reducers; each computes an exact partial distinct count (values are
    disjoint across salts because the salt is a function of the value).
    Phase 2 sums the partials — exact, not approximate.
    """
    salted = with_salt(df, value_col, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.countDistinct(value_col).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").cast("long").alias(out_col)
    )


def salted_cooccurrence(
    edges: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "obj",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-hardened variant of analytics.cooccurrence_pairs.

    Same result as the plain C1 self-join, but the distinct-doc count per
    pair runs through the salted two-phase aggregation so a pair like
    (United States, United States) with 50% of all docs cannot pin a
    single reducer.
    """
    a = edges.select(F.col(doc_col).alias("doc"), F.col(entity_col).alias("ea"))
    b = edges.select(F.col(doc_col).alias("doc"), F.col(entity_col).alias("eb"))
    pairs = a.join(b, "doc").filter(F.col("ea") <= F.col("eb"))
    return salted_count_distinct(
        pairs, ["ea", "eb"], "doc", n_salts, out_col="n_docs"
    )
