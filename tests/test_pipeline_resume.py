"""Pipeline materialization + kill-and-resume semantics (SURVEY.md §5.4)."""

from __future__ import annotations

import json
import shutil

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
    Checkpointer,
    build_graph,
)
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
    web_pages,
)


def test_build_graph_and_resume(spark, tmp_path):
    out = str(tmp_path / "graph")
    pages = web_pages(spark, 80, partitions=4)

    tables = build_graph(spark, pages, out, with_topics=True)
    assert tables["documents"].count() == 80
    n_triples = tables["triples"].count()
    n_nodes = tables["nodes"].count()
    n_edges = tables["edges"].count()
    assert n_triples > 0 and n_nodes > 0 and n_edges > 0

    # canonical ids: every entity maps to exactly one canonical id
    nodes = tables["nodes"]
    assert (
        nodes.groupBy("entity_id").agg(F.countDistinct("canonical_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )

    edges_before = sorted(
        (r["pred"], r["canonical_id"], r["n_docs"], r["n_mentions"])
        for r in tables["edges"].collect()
    )
    progress = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert all(progress[s]["status"] == "complete" for s in progress)
    metrics = json.loads((tmp_path / "graph" / "_metrics.json").read_text())
    assert {m["stage"] for m in metrics} >= {"documents", "triples", "nodes", "edges"}

    # ---- simulate a crash: wipe the two downstream stages, resume ---------
    shutil.rmtree(tmp_path / "graph" / "nodes")
    shutil.rmtree(tmp_path / "graph" / "edges")
    progress.pop("nodes")
    progress.pop("edges")
    (tmp_path / "graph" / "_progress.json").write_text(json.dumps(progress))

    tables2 = build_graph(spark, pages, out, with_topics=True)
    edges_after = sorted(
        (r["pred"], r["canonical_id"], r["n_docs"], r["n_mentions"])
        for r in tables2["edges"].collect()
    )
    assert edges_after == edges_before  # identical final tables after resume
    assert tables2["documents"].count() == 80

    # upstream stages were NOT recomputed (metrics appended only for the two
    # rebuilt stages)
    metrics2 = json.loads((tmp_path / "graph" / "_metrics.json").read_text())
    rebuilt = [m["stage"] for m in metrics2[len(metrics):]]
    assert sorted(rebuilt) == ["edges", "nodes"]


def test_checkpointer_skips_complete_stage(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path / "ck"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id"))

    ck.run("stage_a", build)
    ck.run("stage_a", build)
    assert calls["n"] == 1
