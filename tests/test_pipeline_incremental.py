"""incremental_update: fold a new crawl batch into an existing graph.

Contracts under test (plans/pipeline.py::incremental_update):

- refresh/exact (defaults): the incremented output is IDENTICAL, table
  by table, to a from-scratch build_graph on the union corpus.
- frozen_idf: delta docs get exactly the topics a full rebuild would
  give them; old docs' topic rows are byte-stable (idf snapshot at
  ingest time); non-topic triples still match the full rebuild exactly.
- sketch edges: n_mentions and years stay exact; the HLL distinct-doc
  estimate lands within a small relative error of the exact count.
- idempotence: re-presenting already-ingested pages is a no-op.
"""

from __future__ import annotations

import json
import shutil

import pytest

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
    aggregate_edges,
    build_graph,
    incremental_update,
)
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
    web_pages,
)

N_BASE = 80
N_ALL = 130


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def _triple_rows(df):
    return _rows(
        df, ["subj", "pred", "obj", "doc_id", "surface", "method", "author", "year"]
    )


def _edge_rows(df):
    return sorted(
        (r["pred"], r["canonical_id"], r["n_docs"], r["n_mentions"],
         tuple(r["years"]))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def full_build(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("incr") / "full"
    tables = build_graph(spark, web_pages(spark, N_ALL, partitions=4), str(out))
    return tables


@pytest.fixture(scope="module")
def base_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("incr") / "base"
    build_graph(spark, web_pages(spark, N_BASE, partitions=4), str(out))
    return out


def _clone(base_dir, tmp_path):
    dst = tmp_path / "graph"
    shutil.copytree(base_dir, dst)
    return str(dst)


def test_incremental_refresh_exact_equals_full_rebuild(
    spark, base_dir, full_build, tmp_path
):
    out = _clone(base_dir, tmp_path)
    # the new batch re-presents every already-ingested url plus the delta
    inc = incremental_update(spark, out, web_pages(spark, N_ALL, partitions=4))

    assert _rows(inc["documents"], ["url", "doc_id", "year"]) == _rows(
        full_build["documents"], ["url", "doc_id", "year"]
    )
    assert _triple_rows(inc["triples"]) == _triple_rows(full_build["triples"])
    assert _rows(
        inc["nodes"], ["entity_type", "name", "entity_id", "canonical_id"]
    ) == _rows(
        full_build["nodes"], ["entity_type", "name", "entity_id", "canonical_id"]
    )
    assert _edge_rows(inc["edges"]) == _edge_rows(full_build["edges"])
    assert _rows(
        inc["cleaned_affiliations"],
        ["doc_id", "affiliation_text", "cleaned_affiliation", "place"],
    ) == _rows(
        full_build["cleaned_affiliations"],
        ["doc_id", "affiliation_text", "cleaned_affiliation", "place"],
    )
    # delta-append distances must equal the full rebuild's: each row is a
    # function of its own text + the fixed type vectors only
    dist_cols = [
        "doc_id", "affiliation_index", "affiliation_type",
        "semantic_similarity",
    ]
    assert _rows(inc["affiliation_type_distances"], dist_cols) == _rows(
        full_build["affiliation_type_distances"], dist_cols
    )


def test_incremental_frozen_idf_delta_contract(
    spark, base_dir, full_build, tmp_path
):
    out = _clone(base_dir, tmp_path)
    base_topics = _triple_rows(
        spark.read.parquet(str(base_dir / "topics"))
    )
    inc = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
    )

    base_doc_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(base_dir / "documents"))
        .select("doc_id")
        .collect()
    }
    inc_topics = spark.read.parquet(str(out) + "/topics")

    # old docs' topic rows are byte-stable (their idf snapshot is kept)
    old_rows = _triple_rows(
        inc_topics.filter(F.col("doc_id").isin(list(base_doc_ids)))
    )
    assert old_rows == base_topics

    # delta docs' topic rows match the full rebuild exactly: they were
    # mined against the merged corpus-wide df and the combined n_docs
    delta_rows = _triple_rows(
        inc_topics.filter(~F.col("doc_id").isin(list(base_doc_ids)))
    )
    full_delta_rows = _triple_rows(
        full_build["triples"].filter(
            (F.col("pred") == "HAS_TOPIC")
            & ~F.col("doc_id").isin(list(base_doc_ids))
        )
    )
    assert delta_rows == full_delta_rows

    # the merged term_df IS the union corpus's document frequencies
    term_df = _rows(spark.read.parquet(str(out) + "/term_df"), ["phrase", "df"])
    from convei_abstract_relational_knowledge_explorer_spark.operators.topics import (
        phrase_document_frequency,
    )

    expected_df = _rows(
        phrase_document_frequency(full_build["documents"]), ["phrase", "df"]
    )
    assert term_df == expected_df

    # non-topic triples are exact regardless of topics_mode
    assert _triple_rows(
        inc["triples"].filter(F.col("pred") != "HAS_TOPIC")
    ) == _triple_rows(
        full_build["triples"].filter(F.col("pred") != "HAS_TOPIC")
    )


def test_incremental_sketch_edges(spark, base_dir, tmp_path):
    out = _clone(base_dir, tmp_path)
    # increment 1 BACKFILLS entity_stats/entity_surfaces from the combined
    # triples; increment 2 exercises the surface-level MERGE path
    incremental_update(
        spark,
        out,
        web_pages(spark, 105, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )
    inc = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )
    exact = aggregate_edges(inc["triples"], inc["nodes"])
    exact_rows = {
        (r["pred"], r["canonical_id"]): (
            r["n_docs"], r["n_mentions"], tuple(r["years"])
        )
        for r in exact.collect()
    }
    sketch_rows = {
        (r["pred"], r["canonical_id"]): (
            r["n_docs"], r["n_mentions"], tuple(r["years"])
        )
        for r in inc["edges"].collect()
    }
    assert set(sketch_rows) == set(exact_rows)
    for key, (docs, mentions, years) in exact_rows.items():
        s_docs, s_mentions, s_years = sketch_rows[key]
        assert s_mentions == mentions          # exactly mergeable
        assert s_years == years                # exactly mergeable
        # HLL default lgConfigK=12 → ~1.6% standard error
        assert abs(s_docs - docs) <= max(1, 0.05 * docs)

    # entity_stats stage exists and is surface-sized, not triple-sized
    n_stats = spark.read.parquet(str(out) + "/entity_stats").count()
    assert n_stats == inc["nodes"].count()


def test_incremental_within_batch_url_dedupe(spark, base_dir, tmp_path):
    """A crawl batch recrawls pages: two captures of one NEW url must
    collapse to the latest capture before ingest (doc_id is a url hash,
    so double-ingest would duplicate every per-document stage)."""
    out = _clone(base_dir, tmp_path)
    base_urls = spark.read.parquet(str(base_dir / "documents")).select("url")
    new_page = web_pages(spark, N_BASE + 1, partitions=2).join(
        base_urls, "url", "left_anti"
    )
    assert new_page.count() == 1
    stale = new_page.withColumn(
        "warc_ts", F.expr("warc_ts - interval 1 day")
    ).withColumn("html", F.to_binary(F.lit("stale"), F.lit("utf-8")))
    inc = incremental_update(spark, out, new_page.unionByName(stale))

    docs = inc["documents"]
    assert docs.count() == N_BASE + 1
    new_doc = docs.join(base_urls, "url", "left_anti").collect()
    assert len(new_doc) == 1
    # keeper is the LATEST capture, not the stale duplicate
    expected_ts = new_page.select("warc_ts").collect()[0][0]
    assert new_doc[0]["warc_ts"] == expected_ts


def test_incremental_canonicalize_bridging_and_min_labels(spark):
    """Pure-function contract: a new surface that bridges two old
    components relabels BOTH to the global min id, whether the bridge is
    a norm edge or an LSH band edge; ids smaller than any old canonical
    win the min (label composition)."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        incremental_canonicalize,
    )

    old_nodes = spark.createDataFrame(
        [
            ("topic", "aa bb", 10, 10),
            ("topic", "aa-bb", 11, 10),   # merged with 10 by norm
            ("topic", "cc dd", 20, 20),
        ],
        "entity_type string, name string, entity_id long, canonical_id long",
    )
    new_ents = spark.createDataFrame(
        [
            ("topic", "AA  BB!", 7),   # norm 'aa bb' -> bridges into {10,11}
            ("topic", "ee ff gg", 5),  # band edge to 20 (below)
            ("topic", "zz yy", 99),    # no edges: stays a singleton
        ],
        "entity_type string, name string, entity_id long",
    )
    empty_bands = "entity_id long, band int, bucket string"
    new_bands = spark.createDataFrame([(5, 0, "B")], empty_bands)
    all_bands = spark.createDataFrame(
        [(5, 0, "B"), (20, 0, "B")], empty_bands
    )
    got = {
        r["entity_id"]: r["canonical_id"]
        for r in incremental_canonicalize(
            old_nodes, new_ents, new_bands, all_bands
        ).collect()
    }
    assert got == {10: 7, 11: 7, 7: 7, 20: 5, 5: 5, 99: 99}


def test_incremental_nodes_parity_with_full_canonicalize(
    spark, base_dir, tmp_path
):
    """Two frozen-idf increments maintain nodes incrementally (delta-only
    LSH + CC over contracted components); the labeling must be IDENTICAL
    to a full canonicalize_entities over the same surface set."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        canonicalize_entities,
    )

    out = _clone(base_dir, tmp_path)
    incremental_update(
        spark, out, web_pages(spark, 105, partitions=4),
        topics_mode="frozen_idf", edge_counts="sketch",
    )
    inc = incremental_update(
        spark, out, web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf", edge_counts="sketch",
    )
    # the band index was maintained, not invalidated
    progress = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert progress["surface_bands"]["status"] == "complete"

    surfaces = spark.read.parquet(str(tmp_path / "graph" / "entity_surfaces"))
    full = canonicalize_entities(spark, surfaces)
    cols = ["entity_type", "name", "entity_id", "canonical_id"]
    assert _rows(inc["nodes"], cols) == _rows(full, cols)


def test_refresh_increment_invalidates_band_index(spark, base_dir, tmp_path):
    """A topics_mode='refresh' increment can retract surfaces, so it must
    drop the incremental band index (and term_df) rather than leave a
    stale one for a later incremental call."""
    out = _clone(base_dir, tmp_path)
    incremental_update(
        spark, out, web_pages(spark, 105, partitions=4),
        topics_mode="frozen_idf",
    )
    progress = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert "surface_bands" in progress
    incremental_update(
        spark, out, web_pages(spark, N_ALL, partitions=4),
        topics_mode="refresh",
    )
    progress = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert "surface_bands" not in progress
    assert not (tmp_path / "graph" / "surface_bands").exists()


def test_incremental_noop_on_duplicate_batch(spark, base_dir, tmp_path):
    out = _clone(base_dir, tmp_path)
    before = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    inc = incremental_update(
        spark, out, web_pages(spark, N_BASE, partitions=4)
    )
    after = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert after == before
    assert inc["documents"].count() == N_BASE


def test_partitioning_recovered_from_directory_layout(spark, base_dir, tmp_path):
    """A pre-r4 ledger has no partition_by key; the layout must then be
    recovered from the hive-style directory itself, or a later append
    writes root-level files that partition discovery silently drops."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    out = _clone(base_dir, tmp_path)
    ledger_path = tmp_path / "graph" / "_progress.json"
    ledger = json.loads(ledger_path.read_text())
    for entry in ledger.values():
        entry.pop("partition_by", None)
    ledger_path.write_text(json.dumps(ledger))

    ck = Checkpointer(spark, out, materialize="parquet")
    assert ck.partitioning("documents") == ["year"]
    assert ck.partitioning("triples") == ["year"]  # 'parts' ledger fallback
    assert ck.partitioning("term_df") is None


def test_compact_preserves_rows_and_reduces_files(spark, base_dir, tmp_path):
    """Fast-appends accrue small files; compact() must rewrite them into
    fewer files with byte-identical table contents, preserving layout."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    out = _clone(base_dir, tmp_path)
    incremental_update(
        spark, out, web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
    )
    ck = Checkpointer(spark, out, materialize="parquet")

    def _files(stage):
        return [
            p for p in (tmp_path / "graph" / stage).rglob("*.parquet")
            if p.is_file()
        ]

    # triples took a fast-append: each year= dir holds base + delta
    # files, so compaction must strictly shrink the file count.  term_df
    # was refresh-written (may already be one file): contents-stable and
    # no-growth is the contract there.
    for stage, strict in (("triples", True), ("term_df", False)):
        before_rows = _triple_rows(ck.load(stage)) if stage == "triples" else (
            _rows(ck.load(stage), ["phrase", "df"])
        )
        n_before = len(_files(stage))
        ck.compact(stage)
        n_after = len(_files(stage))
        assert n_after < n_before if strict else n_after <= n_before
        after_rows = _triple_rows(ck.load(stage)) if stage == "triples" else (
            _rows(ck.load(stage), ["phrase", "df"])
        )
        assert after_rows == before_rows
    # layout survives: triples still hive-partitioned by year
    assert ck.partitioning("triples") == ["year"]
    assert any(
        p.name.startswith("year=")
        for p in (tmp_path / "graph" / "triples").iterdir()
    )


def test_stream_graph_updates_folds_drops(spark, base_dir, tmp_path):
    """foreachBatch bridge: parquet drops landing in a watched directory
    are folded into the graph via incremental_update; a re-run against
    the same checkpoint reprocesses nothing."""
    from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
        WEB_PAGES_SCHEMA,
    )
    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stream_graph_updates,
    )

    out = _clone(base_dir, tmp_path)
    drops = tmp_path / "drops"
    ckpt = str(tmp_path / "stream_ckpt")
    # two drops: one overlapping re-crawl (first 105 urls), one extension
    web_pages(spark, 105, partitions=2).write.parquet(
        str(drops / "d1"), mode="overwrite"
    )
    web_pages(spark, N_ALL, partitions=2).write.parquet(
        str(drops / "d2"), mode="overwrite"
    )
    stream_graph_updates(
        spark, str(drops / "*"), WEB_PAGES_SCHEMA, out, ckpt,
        topics_mode="frozen_idf", edge_counts="sketch",
    )
    docs = spark.read.parquet(str(tmp_path / "graph" / "documents"))
    assert docs.count() == N_ALL
    assert docs.select("url").distinct().count() == N_ALL

    # replay with the same checkpoint: no new files -> graph untouched
    before = json.loads(
        (tmp_path / "graph" / "_progress.json").read_text()
    )
    stream_graph_updates(
        spark, str(drops / "*"), WEB_PAGES_SCHEMA, out, ckpt,
        topics_mode="frozen_idf", edge_counts="sketch",
    )
    after = json.loads((tmp_path / "graph" / "_progress.json").read_text())
    assert after == before


def test_incremental_requires_complete_build(spark, tmp_path):
    with pytest.raises(ValueError, match="run build_graph first"):
        incremental_update(
            spark, str(tmp_path / "nothing"), web_pages(spark, 5, partitions=2)
        )


def test_sketch_requires_frozen_idf(spark, base_dir, tmp_path):
    out = _clone(base_dir, tmp_path)
    with pytest.raises(ValueError, match="frozen_idf"):
        incremental_update(
            spark,
            out,
            web_pages(spark, N_ALL, partitions=4),
            edge_counts="sketch",
        )


# ---------------------------------------------------------------------------
# exactly-once across crash + replay (the batch journal)
# ---------------------------------------------------------------------------


def _incr_frozen(spark, out):
    return incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )


@pytest.mark.parametrize(
    "kill_method,kill_stage",
    [
        ("publish_batch", "documents"),
        ("publish_batch", "triples"),
        ("refresh_batch", "term_df"),
        ("refresh_batch", "nodes"),
    ],
)
def test_incremental_crash_replay_exactly_once(
    spark, base_dir, tmp_path, monkeypatch, kill_method, kill_stage
):
    """Kill the increment at a stage boundary, replay the SAME batch, and
    require byte-identical results to an uninterrupted run.  Without the
    batch journal the replay's url anti-join sees the already-published
    documents, derives an empty delta, and silently drops the batch from
    every not-yet-written stage (at-most-once, the r4 review finding)."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    expected_out = _clone(base_dir, tmp_path / "expected")
    expected = _incr_frozen(spark, expected_out)
    exp_triples = _triple_rows(expected["triples"])
    exp_docs = expected["documents"].count()
    exp_nodes = _rows(
        expected["nodes"], ["entity_type", "name", "canonical_id"]
    )

    out = _clone(base_dir, tmp_path / "crashed")
    real = getattr(Checkpointer, kill_method)

    def boom(self, stage, batch_id, *a, **kw):
        if stage == kill_stage:
            raise RuntimeError(f"injected crash at {kill_method}({stage})")
        return real(self, stage, batch_id, *a, **kw)

    monkeypatch.setattr(Checkpointer, kill_method, boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        _incr_frozen(spark, out)
    monkeypatch.setattr(Checkpointer, kill_method, real)

    inc = _incr_frozen(spark, out)  # replay of the same batch
    assert inc["documents"].count() == exp_docs
    assert _triple_rows(inc["triples"]) == exp_triples
    assert (
        _rows(inc["nodes"], ["entity_type", "name", "canonical_id"])
        == exp_nodes
    )
    # the batch journal closed: a third presentation is a pure no-op
    ledger = json.loads((tmp_path / "crashed" / "graph" / "_batches.json").read_text())
    assert all(v["status"] == "complete" for v in ledger.values())


def test_publish_batch_idempotent_after_journal_loss(
    spark, base_dir, tmp_path
):
    """Crash between the hard-link fold and the journal write: the replay
    re-links (every link already exists) and must not duplicate rows."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    out = _clone(base_dir, tmp_path)
    ck = Checkpointer(spark, out, materialize="parquet")
    # delta columns must match the stage; derive from the real table
    docs = ck.load("documents")
    delta = docs.limit(3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10**15)
    )
    before = ck.progress["documents"]["rows"]
    ck.append_batch("documents", "deadbeef-3", lambda: delta)
    rows_once = ck.load("documents").count()
    assert rows_once == before + 3
    # simulate the lost journal write
    ck.batches["deadbeef-3"]["published"].remove("documents")
    ck.publish_batch("documents", "deadbeef-3")  # replay
    assert ck.load("documents").count() == rows_once


def test_refresh_recovers_complete_next_when_final_missing(
    spark, tmp_path
):
    """Crash between rmtree(final) and the rename: __next holds the ONLY
    copy — refresh must finish the swap, not delete it (r4 review #1)."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    ck = Checkpointer(spark, str(tmp_path / "g"), materialize="parquet")
    ck.run("s", lambda: spark.range(5).selectExpr("id as v"))
    # simulate the crash window
    shutil.copytree(tmp_path / "g" / "s", tmp_path / "g" / "s__next")
    shutil.rmtree(tmp_path / "g" / "s")
    out = ck.refresh("s", lambda: ck.load("s").filter(F.col("v") < 3))
    assert out.count() == 3  # the build read the RECOVERED table


def test_refresh_batch_token_makes_merge_exactly_once(spark, tmp_path):
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    ck = Checkpointer(spark, str(tmp_path / "g"), materialize="parquet")
    ck.run("t", lambda: spark.range(5).selectExpr("id as v"))
    calls = []

    def merge():
        calls.append(1)
        return ck.load("t").unionByName(
            spark.range(100, 103).selectExpr("id as v")
        )

    assert ck.refresh_batch("t", "batch-1", merge).count() == 8
    # replay of the same batch: token matches, merge NOT re-run
    assert ck.refresh_batch("t", "batch-1", merge).count() == 8
    assert len(calls) == 1
    # a NEW batch merges again
    assert ck.refresh_batch("t", "batch-2", merge).count() == 11
    assert len(calls) == 2


def test_refresh_batch_finishes_crashed_swap(spark, tmp_path):
    """Crash between the __next write and the swap: the token-matching
    __next is complete — finish the swap instead of re-merging."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    ck = Checkpointer(spark, str(tmp_path / "g"), materialize="parquet")
    ck.run("t", lambda: spark.range(5).selectExpr("id as v"))
    merged = ck.load("t").unionByName(
        spark.range(100, 102).selectExpr("id as v")
    )
    merged.write.mode("overwrite").parquet(str(tmp_path / "g" / "t__next"))
    (tmp_path / "g" / "t__next" / "_BATCH").write_text("b-9")

    def must_not_run():
        raise AssertionError("merge re-ran after a completed __next write")

    out = ck.refresh_batch("t", "b-9", must_not_run)
    assert out.count() == 7
    assert not (tmp_path / "g" / "t__next").exists()


def test_deferred_sweep_spares_caller_blocks(spark, base_dir, tmp_path):
    """The concurrent-chain increment sweeps its own scaffolding ONCE at
    region exit while caller-owned persisted blocks (localCheckpoints
    created BEFORE the increment, which have no lineage to recompute
    from) survive and stay readable (plans/pipeline.py::deferred_sweep)."""
    out = _clone(base_dir, tmp_path)
    caller_owned = (
        web_pages(spark, 10, partitions=2)
        .select("url")
        .localCheckpoint(eager=True)
    )
    pre_ids = {
        rdd.id()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values()
    }
    incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )
    post_ids = {
        rdd.id()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values()
    }
    # everything the increment persisted (shared tf, CC round
    # checkpoints, entity lists) was freed by the end-of-region sweep
    assert post_ids <= pre_ids
    # the caller's block survived AND is still materialized (an
    # unpersisted localCheckpoint would have no copy left to read)
    assert caller_owned.count() == 10
    caller_owned.unpersist()


def test_concurrent_chain_failure_is_replayable(spark, base_dir, tmp_path):
    """A thread failure inside the concurrent chain region surfaces to
    the caller after all chains join, and a clean retry completes the
    batch exactly-once (same journal path as a mid-batch crash)."""
    import convei_abstract_relational_knowledge_explorer_spark.plans.pipeline as pl

    out = _clone(base_dir, tmp_path)
    orig = pl.affiliation_type_distances

    def boom(*a, **kw):
        raise RuntimeError("injected chain failure")

    pl.affiliation_type_distances = boom
    try:
        with pytest.raises(RuntimeError, match="injected chain failure"):
            incremental_update(
                spark,
                out,
                web_pages(spark, N_ALL, partitions=4),
                topics_mode="frozen_idf",
                edge_counts="sketch",
            )
    finally:
        pl.affiliation_type_distances = orig
    tables = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )
    docs = tables["documents"]
    assert docs.count() == docs.select("url").distinct().count() == N_ALL
    dist = tables["affiliation_type_distances"]
    # the failed chain's stages completed on retry, exactly once
    assert dist.groupBy(
        "doc_id", "affiliation_index", "affiliation_type"
    ).count().filter(F.col("count") > 1).count() == 0


def test_auto_compaction_retires_append_debt(spark, base_dir, tmp_path):
    """With a tiny compact_threshold the increment compacts fast-append
    stages after the batch journals complete: data-file count drops,
    row counts and values are unchanged, and the NEXT increment still
    applies cleanly over the rewritten files (hard-link publish onto
    compacted directories)."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        Checkpointer,
    )

    out = _clone(base_dir, tmp_path)
    ck = Checkpointer(spark, out)
    incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
        compact_threshold=None,
    )
    files_before = ck.data_file_count("triples")
    rows_before = spark.read.parquet(out + "/triples").count()

    tables = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL + 20, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
        compact_threshold=1,
    )
    files_after = ck.data_file_count("triples")
    assert files_after < files_before
    t = spark.read.parquet(out + "/triples")
    assert t.count() > rows_before  # the second delta's rows landed
    assert tables["documents"].count() == N_ALL + 20

    # a third increment over the compacted layout applies cleanly
    tables = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL + 40, partitions=4),
        topics_mode="frozen_idf",
        edge_counts="sketch",
    )
    docs = tables["documents"]
    assert docs.count() == docs.select("url").distinct().count() == N_ALL + 40


def test_incremental_returned_frames_survive_compaction(
    spark, base_dir, tmp_path
):
    """compact_threshold=1 forces every fast-append stage to compact at
    the end of the increment; the RETURNED DataFrames must still be
    actionable afterwards.  Regression: all_triples was captured before
    the compaction swapped the triples/topics directories, so its stale
    FileIndex raised FileNotFoundException on the first count() (hit by
    bench.py's sf0.1 pipeline run)."""
    out = _clone(base_dir, tmp_path)
    inc = incremental_update(
        spark,
        out,
        web_pages(spark, N_ALL, partitions=4),
        compact_threshold=1,
    )
    # every returned frame acts cleanly post-compaction
    assert inc["triples"].count() > 0
    assert inc["documents"].count() == N_ALL
    assert inc["nodes"].count() > 0 and inc["edges"].count() > 0
    assert inc["cleaned_affiliations"].count() > 0
