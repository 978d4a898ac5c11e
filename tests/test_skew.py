"""Skew handling: salted aggregation equals the plain plan on skewed data."""

from __future__ import annotations

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators import (
    analytics,
    skew,
)


def _skewed_edges(spark, n_docs=2000):
    """One entity appears in 50% of docs (the 'United States' shape)."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    hot = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.lit("United States").alias("obj")
    )
    cold = docs.select(
        "doc_id",
        F.concat(F.lit("entity_"), (F.col("doc_id") % 37).cast("string")).alias(
            "obj"
        ),
    )
    return hot.unionByName(cold)


def test_salted_count_distinct_exact(spark):
    edges = _skewed_edges(spark)
    plain = {
        (r["obj"],): r["n"]
        for r in edges.groupBy("obj")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    salted = {
        (r["obj"],): r["n_distinct"]
        for r in skew.salted_count_distinct(
            edges, ["obj"], "doc_id", n_salts=8
        ).collect()
    }
    assert plain == {k: v for k, v in salted.items()}


def test_salted_cooccurrence_matches_plain(spark):
    edges = _skewed_edges(spark, n_docs=400)
    plain = {
        (r["ea"], r["eb"]): r["n_docs"]
        for r in analytics.cooccurrence_pairs(edges).collect()
    }
    salted = {
        (r["ea"], r["eb"]): r["n_docs"]
        for r in skew.salted_cooccurrence(edges, n_salts=8).collect()
    }
    assert plain == salted


def test_satellite_pair_matrix_uses_salted_path(spark):
    """The production report path must go through the salted two-phase agg
    (VERDICT r01 #3) and still produce the plain-plan numbers."""
    from convei_abstract_relational_knowledge_explorer_spark.plans import reports

    rows = []
    for d in range(60):
        rows.append((d, "MENTIONS_SATELLITE", "landsat"))   # head entity
        if d % 3 == 0:
            rows.append((d, "MENTIONS_SATELLITE", "modis"))
        if d % 10 == 0:
            rows.append((d, "MENTIONS_SATELLITE", "sentinel-2"))
    df = spark.createDataFrame(rows, "doc_id long, pred string, obj string")
    wide = {r["satellite"]: r.asDict() for r in
            reports.satellite_pair_matrix(df).collect()}
    assert wide["landsat"]["landsat"] == 60
    assert wide["landsat"]["modis"] == 20
    assert wide["modis"]["sentinel-2"] == 2  # docs 0 and 30
