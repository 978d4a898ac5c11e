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


def test_run_partitioned_resumes_at_failed_partition(spark, tmp_path):
    """north_rule per-partition checkpoints: a stage killed mid-way resumes
    at the first unfinished partition; finished ones are never rebuilt."""
    out = str(tmp_path / "pk")
    built: list[int] = []

    def build_part(y, fail_on=None):
        if y == fail_on:
            raise RuntimeError("simulated executor loss")
        built.append(y)
        return (
            spark.range(10)
            .select(
                F.col("id").alias("doc_id"),
                F.lit(y).alias("year"),
                (F.col("id") * y).alias("v"),
            )
        )

    ck = Checkpointer(spark, out)
    try:
        ck.run_partitioned(
            "triples",
            lambda y: build_part(y, fail_on=2021),
            [2019, 2020, 2021, 2022],
            build_full=lambda: None,
        )
        raise AssertionError("expected simulated failure")
    except RuntimeError:
        pass
    assert built == [2019, 2020]

    # fresh Checkpointer = fresh process; resume completes the rest only
    ck2 = Checkpointer(spark, out)
    df = ck2.run_partitioned(
        "triples",
        lambda y: build_part(y, fail_on=None),
        [2019, 2020, 2021, 2022],
        build_full=lambda: None,
    )
    assert built == [2019, 2020, 2021, 2022]  # 2019/2020 NOT rebuilt
    assert df.count() == 40
    assert {r["year"] for r in df.select("year").distinct().collect()} == {
        2019, 2020, 2021, 2022,
    }
    # per-partition lineage recorded
    progress = json.loads((tmp_path / "pk" / "_progress.json").read_text())
    assert set(progress["triples"]["parts"]) == {"2019", "2020", "2021", "2022"}

    # a third run is a no-op
    ck3 = Checkpointer(spark, out)
    ck3.run_partitioned(
        "triples",
        lambda y: build_part(y, fail_on=None),
        [2019, 2020, 2021, 2022],
        build_full=lambda: None,
    )
    assert built == [2019, 2020, 2021, 2022]


def test_affiliation_stages_materialize_and_resume(spark, tmp_path):
    out = str(tmp_path / "aff")
    pages = web_pages(spark, 60, partitions=2)
    tables = build_graph(spark, pages, out, with_topics=False)

    cleaned = tables["cleaned_affiliations"]
    assert "cleaned_affiliation" in cleaned.columns and "place" in cleaned.columns
    assert cleaned.count() > 0
    dists = tables["affiliation_type_distances"]
    assert dists.count() > 0
    types = {r["affiliation_type"] for r in dists.select("affiliation_type").distinct().collect()}
    assert types <= {"academic", "government", "private", "nonprofit",
                     "intergovernmental"}
    # similarity bounded, top-k per (doc, index) <= 5
    assert dists.filter((F.col("semantic_similarity") < -1.0001)
                        | (F.col("semantic_similarity") > 1.0001)).count() == 0

    metrics = json.loads((tmp_path / "aff" / "_metrics.json").read_text())
    stages = [m["stage"] for m in metrics]
    assert "cleaned_affiliations" in stages
    assert "affiliation_type_distances" in stages

    # resume is a no-op for the affiliation stages
    n_metrics = len(metrics)
    build_graph(spark, pages, out, with_topics=False)
    metrics2 = json.loads((tmp_path / "aff" / "_metrics.json").read_text())
    assert len(metrics2) == n_metrics


def test_run_partitioned_overwrites_torn_partition(spark, tmp_path):
    """A crash can leave a PARTIALLY WRITTEN partition directory with no
    ledger entry.  Resume must treat it as unbuilt and the per-partition
    overwrite write must replace the torn files wholesale."""
    out = tmp_path / "torn"

    def build_part(y, fail_on=None):
        if y == fail_on:
            raise RuntimeError("simulated kill mid-stage")
        return spark.range(5).select(
            F.col("id").alias("doc_id"),
            F.lit(y).alias("year"),
            (F.col("id") + y).alias("v"),
        )

    ck = Checkpointer(spark, str(out))
    try:
        ck.run_partitioned(
            "triples",
            lambda y: build_part(y, fail_on=2020),
            [2019, 2020, 2021],
            build_full=lambda: None,
        )
        raise AssertionError("expected simulated failure")
    except RuntimeError:
        pass

    # simulate the torn write the kill left behind: a garbage part file in
    # the 2020 partition dir, with NO ledger entry for 2020
    torn_dir = out / "triples" / "year=2020"
    torn_dir.mkdir(parents=True, exist_ok=True)
    torn_file = torn_dir / "part-00000-torn.snappy.parquet"
    torn_file.write_bytes(b"PAR1 this is not a parquet footer")
    ledger = json.loads((out / "_progress.json").read_text())
    assert "2020" not in ledger["triples"]["parts"]

    ck2 = Checkpointer(spark, str(out))
    df = ck2.run_partitioned(
        "triples",
        lambda y: build_part(y),
        [2019, 2020, 2021],
        build_full=lambda: None,
    )
    assert not torn_file.exists()  # overwrite mode wiped the torn file
    got = {(r["doc_id"], r["year"], r["v"]) for r in df.collect()}
    assert got == {
        (i, y, i + y) for y in (2019, 2020, 2021) for i in range(5)
    }


def test_run_partitioned_empty_values_falls_back_to_full_build(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path / "empty"))
    df = ck.run_partitioned(
        "triples",
        lambda y: None,
        [],
        build_full=lambda: spark.range(3).select(F.col("id")),
    )
    assert df.count() == 3


def test_free_persisted_keeps_caller_blocks(spark, tmp_path):
    """The post-stage cache sweep must only drop blocks the stage build
    created: a caller's persisted/localCheckpointed DataFrame (which has
    NO lineage to recompute from) survives a Checkpointer stage."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    caller_df = spark.range(100).localCheckpoint(eager=True)
    assert caller_df.count() == 100

    ck = Checkpointer(spark, str(tmp_path / "ck_keep"))
    ck.run("tiny", lambda: spark.range(10).toDF("id"))

    # a localCheckpointed DF whose blocks were swept would raise
    # "Checkpoint block not found" here
    assert caller_df.count() == 100
