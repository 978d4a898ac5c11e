"""Hashed embeddings + similarity tables (J1/J2 substitute, C10, I5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from convei_abstract_relational_knowledge_explorer_spark.operators import embedding


def test_hashed_doc_embeddings_normalized(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon"), (3, "")],
        "doc_id long, text string",
    )
    embs = {r["doc_id"]: r["embedding"] for r in
            embedding.hashed_doc_embeddings(docs, dim=16).collect()}
    # empty doc produces no tokens -> no row (no vector to build)
    assert set(embs) == {1, 2}
    for vec in embs.values():
        assert len(vec) == 16
        assert sum(x * x for x in vec) == pytest.approx(1.0, abs=1e-9)
    # determinism
    embs2 = {r["doc_id"]: r["embedding"] for r in
             embedding.hashed_doc_embeddings(docs, dim=16).collect()}
    assert embs == embs2


def test_similarity_to_dims_cosine(spark):
    docs = spark.createDataFrame(
        [(1, "climate change adaptation"), (2, "satellite imagery analysis")],
        "doc_id long, text string",
    )
    embs = embedding.hashed_doc_embeddings(docs, dim=32)
    dims = embedding.hashed_doc_embeddings(
        spark.createDataFrame(
            [(100, "climate change"), (200, "unrelated topic words")],
            "doc_id long, text string",
        ),
        dim=32,
    ).select(F.col("doc_id").alias("dim_id"), "embedding")
    sim = {(r["doc_id"], r["dim_id"]): r["similarity"]
           for r in embedding.similarity_to_dims(embs, dims).collect()}
    assert len(sim) == 4
    assert all(-1.0001 <= v <= 1.0001 for v in sim.values())
    # doc 1 shares tokens with dim 100, not with dim 200
    assert sim[(1, 100)] > sim[(1, 200)]


def test_weighted_score_product(spark):
    a = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.2)], "doc_id long, dim_id long, similarity double"
    )
    b = spark.createDataFrame(
        [(1, 20, 0.4)], "doc_id long, dim_id long, similarity double"
    )
    got = {(r["dim_a"], r["dim_b"]): r["weighted_score"]
           for r in embedding.weighted_score_product(a, b).collect()}
    assert got == {(10, 20): pytest.approx(0.2), (11, 20): pytest.approx(0.08)}
