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


def test_hard_negatives_band_and_rank(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0]),        # anchor
        (1, [0.99, 0.1]),       # near-dup (cos ~0.995): excluded
        (2, [0.15, 0.99]),      # hard negative (cos ~0.148)
        (3, [0.0, 1.0]),        # orthogonal (cos 0)
        (4, [-1.0, 0.0]),       # opposite (cos -1)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    anchors = emb.filter("vec_id = 0")
    got = [
        (r.anchor_id, r.negative_id, r.rank)
        for r in hard_negatives(emb, anchors, k=8, max_sim=0.2)
        .orderBy("rank")
        .collect()
    ]
    # self and the near-dup are gone; hardest (most similar) first
    assert got == [(0, 2, 1), (0, 3, 2), (0, 4, 3)]
    # k truncation
    got_k = hard_negatives(emb, anchors, k=1, max_sim=0.2).collect()
    assert [(r.anchor_id, r.negative_id) for r in got_k] == [(0, 2)]


def test_hard_negatives_threshold_margin_on_fixture(spark):
    """The q76 oracle compares a float cosine against 0.2 in two
    engines; pin that no fixture pair sits within 1e-6 of the
    threshold (the q26 tie-margin protocol)."""
    import os

    from pyspark.sql import functions as F
    from convei_abstract_relational_knowledge_explorer_spark.operators.similarity import (
        _dot,
        _normed,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    t = _normed(emb, "vec_id", "embedding", "vec_id")
    a = _normed(
        emb.filter(F.col("vec_id") < 12), "vec_id", "embedding", "anchor_id"
    ).select(
        "anchor_id", F.col("vec").alias("avec"), F.col("norm").alias("anorm")
    )
    margin = (
        t.crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            F.abs(
                _dot(F.col("vec"), F.col("avec"))
                / (F.col("norm") * F.col("anorm"))
                - F.lit(0.2)
            ).alias("m")
        )
        .agg(F.min("m"))
        .collect()[0][0]
    )
    assert margin > 1e-6, margin


def test_semantic_dedup_drops_paraphrase_keeps_distinct(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.similarity import (
        semantic_dedup,
    )

    # 1 and 2 nearly parallel (cos ~ 0.9996), 3 orthogonal-ish
    rows = [
        (1, [1.0, 0.0, 0.2, 0.0]),
        (2, [0.98, 0.02, 0.2, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.3]),
        (4, [-1.0, 0.0, -0.2, 0.0]),  # antipodal: dot < 0, never drops
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in semantic_dedup(
        e, n_cells=2, tau_millis=950).collect()}
    assert got[1]["status"] == "keep"
    # 2 drops only if it shares 1's cell; with 2 cells they do
    if got[2]["cell"] == got[1]["cell"]:
        assert got[2]["status"] == "drop" and got[2]["partner"] == 1
    assert got[3]["status"] == "keep"
    assert got[4]["status"] == "keep" and got[4]["partner"] is None


def test_semantic_dedup_min_partner_and_threshold_edge(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.similarity import (
        semantic_dedup,
    )

    # three identical vectors: 2 and 3 both drop against partner 1
    e = spark.createDataFrame(
        [(i, [0.5, 0.5, 0.1, 0.0]) for i in (1, 2, 3)]
        + [(9, [0.5, -0.5, 0.0, 0.1])],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r for r in semantic_dedup(
        e, n_cells=1, tau_millis=950).collect()}
    assert got[1]["status"] == "keep"
    assert got[2]["status"] == "drop" and got[2]["partner"] == 1
    assert got[3]["status"] == "drop" and got[3]["partner"] == 1
    assert got[9]["status"] == "keep"
    # tau = 1000 (cos >= 1.0): only exact parallels drop
    strict = {r["vec_id"]: r["status"] for r in semantic_dedup(
        e, n_cells=1, tau_millis=1000).collect()}
    assert strict[2] == "drop" and strict[9] == "keep"
