"""r6: the DBSCAN exact ε-graph runs as a NumPy mapInArrow kernel when
inputs qualify (_eps_pairs_arrow).  These tests pin the kernel's
bit-exactness contract against the JVM higher-order-function path and
the fallback preconditions."""

from __future__ import annotations

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators import ml


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_arrow_and_jvm_eps_paths_identical(spark, monkeypatch):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    arrow_out = _rows(ml.dbscan_clusters(emb, eps_sq=1.4, min_pts=5))
    # force the JVM fallback by disabling the kernel
    monkeypatch.setattr(ml, "_eps_pairs_arrow", lambda *a, **k: None)
    jvm_out = _rows(ml.dbscan_clusters(emb, eps_sq=1.4, min_pts=5))
    assert arrow_out == jvm_out


def test_arrow_kernel_engages_on_clean_input(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pairs = ml._eps_pairs_arrow(emb, "vec_id", "embedding", 1.4)
    assert pairs is not None
    # raw distances agree bit-for-bit with the JVM left-to-right sum
    va = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").cast("array<double>").alias("_va"),
    )
    vb = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").cast("array<double>").alias("_vb"),
    )
    jvm = (
        va.crossJoin(F.broadcast(vb))
        .filter(F.col("a") < F.col("b"))
        .withColumn("_d2", ml._sq_dist(emb, "embedding", "_va", "_vb"))
        .filter(F.col("_d2") <= 1.4 + 1e-6)
        .select("a", "b", "_d2")
    )
    assert _rows(pairs) == _rows(jvm)


def test_arrow_kernel_declines_ragged_and_null(spark):
    ragged = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.5])],
        "vec_id long, embedding array<double>",
    )
    assert ml._eps_pairs_arrow(ragged, "vec_id", "embedding", 1.0) is None
    withnull = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    assert (
        ml._eps_pairs_arrow(withnull, "vec_id", "embedding", 1.0) is None
    )
    strid = spark.createDataFrame(
        [("a", [0.0, 1.0]), ("b", [0.5, 0.5])],
        "vec_id string, embedding array<double>",
    )
    assert ml._eps_pairs_arrow(strid, "vec_id", "embedding", 1.0) is None


def test_mutual_best_match_arrow_parity(spark, monkeypatch):
    from convei_abstract_relational_knowledge_explorer_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    arrow_out = _rows(similarity.mutual_best_match(left, right))
    monkeypatch.setattr(
        similarity, "_best_match_arrow", lambda *a, **k: None
    )
    jvm_out = _rows(similarity.mutual_best_match(left, right))
    assert arrow_out == jvm_out
    assert len(arrow_out) > 0


def test_knn_graph_arrow_parity(spark, monkeypatch):
    from convei_abstract_relational_knowledge_explorer_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).filter(F.col("vec_id") < 300)
    arrow_out = _rows(similarity.brute_force_knn_graph(emb, k=5))
    monkeypatch.setattr(
        similarity, "_knn_rows_arrow", lambda *a, **k: None
    )
    jvm_out = _rows(similarity.brute_force_knn_graph(emb, k=5))
    assert arrow_out == jvm_out
    assert len(arrow_out) > 0
