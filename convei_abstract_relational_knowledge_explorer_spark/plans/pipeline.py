"""End-to-end KG pipeline: web_pages → documents → triples → nodes/edges.

Stage graph (SURVEY.md §7.1), each stage materialized as parquet (the
sandbox stand-in for Iceberg tables — same layout levers: partition by
entity_type/year, bucket-ready canonical ids) and checkpointed in a
``_progress`` table so a killed run resumes per-stage (the Spark analog of
the reference's process-where-NULL idiom, SURVEY.md §2.B3/C2).

Metrics: every stage appends (stage, rows_out, seconds) to ``_metrics`` —
the reference's printed counters
(/root/reference/populate_author_locations.py:407-410) as a table.
"""

from __future__ import annotations

import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..operators.affiliations import (
    affiliation_type_distances,
    clean_affiliations,
)
from ..operators._parallel import ensure_parallel_scan
from ..operators.components import components_with_singletons
from ..operators.dedup import lsh_band_buckets, minhash_signatures, shingles
from ..operators.extract import extract_documents
from ..operators.mentions import affiliation_segments
from ..operators.topics import (
    dedup_topics_within_doc,
    mine_topics,
    phrase_document_frequency,
    phrase_tf,
    topic_triples,
)
from ..operators.triples import emit_triples

# serializes (stage build → persisted-block sweep) critical sections across
# every Checkpointer in the process — see Checkpointer._free_persisted
_SWEEP_LOCK = threading.Lock()

STAGES = (
    "documents",
    "triples",
    "topics",
    "cleaned_affiliations",
    "affiliation_type_distances",
    "nodes",
    "edges",
)


class Checkpointer:
    """Per-stage checkpoints with a JSON progress ledger.

    materialize="parquet" (default): durable stage tables — the sandbox
    stand-in for Iceberg snapshots; gives kill-and-resume.

    materialize="memory": persist() + count() instead of a parquet write.
    Used by the scaling benchmark: the sandbox has ONE shared local disk,
    so durable writes are I/O-bound at a core-independent rate — a
    single-VM artifact.  On a real cluster every executor writes its own
    partitions to distributed storage, so write bandwidth scales with the
    executor count; memory mode isolates the compute+shuffle path that the
    N→4N criterion is about.
    """

    def __init__(self, spark: SparkSession, out_dir: str,
                 materialize: str = "parquet"):
        self.spark = spark
        self.materialize = materialize
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.progress_path = self.out / "_progress.json"
        self.metrics_path = self.out / "_metrics.json"
        self.progress = (
            json.loads(self.progress_path.read_text())
            if self.progress_path.exists()
            else {}
        )
        self.metrics = (
            json.loads(self.metrics_path.read_text())
            if self.metrics_path.exists()
            else []
        )
        # exactly-once increment journal: batch_id -> {"status",
        # "published": [stages]} — see append_batch/refresh_batch
        self.batches_path = self.out / "_batches.json"
        self.batches = (
            json.loads(self.batches_path.read_text())
            if self.batches_path.exists()
            else {}
        )
        self._cached: dict[str, DataFrame] = {}
        # serializes ledger/journal mutation (progress, metrics, batches)
        # when independent stages of one increment run on driver threads
        self._ledger_lock = threading.Lock()
        self._defer_sweep = False

    def done(self, stage: str) -> bool:
        path = self.out / stage
        return (
            self.materialize == "parquet"
            and self.progress.get(stage, {}).get("status") == "complete"
            and (path / "_SUCCESS").exists()
        )

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self.out / stage))

    def _record(self, stage: str, rows: int, start: float,
                partition_by: list[str] | None = None) -> None:
        seconds = time.time() - start
        with self._ledger_lock:
            entry = {"status": "complete", "rows": rows}
            if partition_by:
                entry["partition_by"] = list(partition_by)
            self.progress[stage] = entry
            self.metrics.append(
                {"stage": stage, "rows_out": rows,
                 "seconds": round(seconds, 3)}
            )
            self.progress_path.write_text(json.dumps(self.progress, indent=1))
            self.metrics_path.write_text(json.dumps(self.metrics, indent=1))

    def _persistent_ids(self) -> set:
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        return {rdd.id() for rdd in jmap.values()}

    def _free_persisted(self, keep=frozenset()) -> None:
        """Unpersist the cached/localCheckpointed RDDs left behind by a
        stage build (the topics tf subtree, CC round checkpoints, entity
        lists).  Once a stage is durable parquet, those blocks are dead
        weight in the executors' block managers; dropping them per stage
        keeps storage memory flat across a long pipeline instead of
        accumulating every stage's scaffolding.  ``keep`` holds the RDD
        ids that were already persisted BEFORE the stage build — caller-
        owned caches and localCheckpoints (which have no lineage to
        recompute from!) must survive the sweep.  Parquet mode only —
        memory mode's persisted stage outputs ARE the materialization.

        CONCURRENCY CONTRACT (r03 ADVICE): the sweep sees every RDD
        persisted session-wide, so a block persisted by ANOTHER thread
        DURING this build would be swept too — fatal for a concurrent
        localCheckpoint (no lineage to recompute).  Stage builds therefore
        either hold the process-wide :data:`_SWEEP_LOCK` around
        build+write+sweep (the default, via :meth:`_sweep_guard`) or run
        inside a :meth:`deferred_sweep` scope, where no sweep happens
        until every thread of the region has joined.  Two Checkpointer
        instances on the same SparkSession are safe against each other;
        threads persisting OUTSIDE this module while a default-mode stage
        builds remain unsupported and are documented as such here."""
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            if rdd.id() not in keep:
                rdd.unpersist(False)

    @contextmanager
    def _sweep_guard(self):
        """Per-write sweep scope: lock + build/write + litter sweep.

        Under :meth:`deferred_sweep` the guard is a no-op — concurrent
        stage writes must not serialize on the process-wide sweep lock,
        and the single deferred sweep at scope exit frees everything the
        whole increment persisted (nothing created inside the scope is
        caller-owned — and ``Dataset.unpersist()`` could not free the
        scope's localCheckpoints anyway: it only clears CacheManager
        entries, a no-op for checkpointed frames)."""
        if self._defer_sweep:
            yield
            return
        with _SWEEP_LOCK:
            pre = self._persistent_ids()
            yield
            self._free_persisted(keep=pre)

    @contextmanager
    def deferred_sweep(self):
        """Run a multi-stage region with ONE litter sweep at exit.

        Enables concurrent stage writes from driver threads (FAIR
        scheduler pools): the per-stage sweep both holds a global lock
        across the whole build+write — which would serialize the threads
        — and is unsafe while a sibling thread is mid-localCheckpoint
        (the sweep would free the sibling's only copy).  Deferring keeps
        the r03 concurrency contract: blocks persisted BEFORE the scope
        survive; everything persisted inside it is increment scaffolding
        and is freed once, after all threads have joined."""
        with _SWEEP_LOCK:
            pre = self._persistent_ids()
        self._defer_sweep = True
        try:
            yield
        finally:
            self._defer_sweep = False
            with _SWEEP_LOCK:
                self._free_persisted(keep=pre)

    def run(self, stage: str, build, partition_by: list[str] | None = None) -> DataFrame:
        """Build + materialize a stage unless already complete (resume)."""
        if self.done(stage):
            return self.load(stage)
        start = time.time()
        if self.materialize == "memory":
            # the persisted frame IS the materialization — it must not
            # meet any sweep (including a deferred scope's exit sweep,
            # which is why memory-mode builds stay sequential)
            with _SWEEP_LOCK:
                df = build().persist()
                rows = df.count()
            self._cached[stage] = df
            self._record(stage, rows, start)
            return df
        with self._sweep_guard():
            writer = build().write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(self.out / stage))
        out_df = self.load(stage)
        rows = out_df.count()
        self._record(stage, rows, start, partition_by=partition_by)
        return out_df

    def partitioning(self, stage: str) -> list[str] | None:
        """The stage table's recorded directory-partition columns.

        ``run``/``append``/``refresh`` record ``partition_by`` in the
        ledger; ``run_partitioned`` records its ``partition_col``.  Every
        later append MUST reuse this layout: an unpartitioned append into
        a ``col=v``-partitioned directory leaves data files whose
        embedded ``col`` column collides with the discovered partition
        column, and Spark silently drops those rows on read (the r4
        sketch-edges bug — 47 phantom stats surfaces).
        """
        entry = self.progress.get(stage, {})
        if entry.get("partition_by"):
            return list(entry["partition_by"])
        # ledger predates the partition_by key (including pre-r4
        # run_partitioned ledgers, which recorded only "parts"): recover
        # the layout from the directory itself (hive-style <col>=<v>
        # subdirectories) — never guess a column name the ledger doesn't
        # actually hold
        stage_dir = self.out / stage
        if stage_dir.is_dir():
            for child in stage_dir.iterdir():
                if child.is_dir() and "=" in child.name:
                    return [child.name.split("=", 1)[0]]
        return None

    def append(self, stage: str, df: DataFrame) -> DataFrame:
        """Append delta rows to an already-complete stage (parquet only).

        The incremental-update primitive for per-document stages: the
        delta batch's rows land as new files (new ``<col>=v`` directories
        for unseen partition values), the ledger's row count advances,
        and a metrics row records the append — existing files are never
        rewritten, which is the Iceberg fast-append snapshot shape.

        The directory-partition layout is NOT a parameter: it is read
        from the ledger (:meth:`partitioning`), because a mixed layout is
        silent data loss — Spark's partition discovery ignores root-level
        data files once ``col=v`` directories exist.

        The caller must ensure ``df`` does not lazily re-list this
        stage's own parquet directory (eagerly localCheckpoint any delta
        derived from stage tables before appending — see
        :func:`incremental_update`).
        """
        if self.materialize != "parquet":
            raise ValueError("append requires parquet materialization")
        if not self.done(stage):
            raise ValueError(f"append target stage {stage!r} is not complete")
        partition_by = self.partitioning(stage)
        start = time.time()
        entry = self.progress.get(stage, {})
        prev = entry.get("rows", 0)
        with _SWEEP_LOCK:
            pre = self._persistent_ids()
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(self.out / stage))
            self._free_persisted(keep=pre)
        out_df = self.load(stage)
        rows = out_df.count()  # parquet footer count — metadata-only
        entry.update({"status": "complete", "rows": rows})
        if partition_by:
            entry["partition_by"] = partition_by
        self.progress[stage] = entry
        self.metrics.append(
            {
                "stage": stage,
                "rows_out": rows,
                "rows_added": rows - prev,
                "mode": "append",
                "seconds": round(time.time() - start, 3),
            }
        )
        self.progress_path.write_text(json.dumps(self.progress, indent=1))
        self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return out_df

    def refresh(self, stage: str, build,
                partition_by: list[str] | None = None) -> DataFrame:
        """Rebuild a stage whose input changed (parquet only).

        Unlike :meth:`run`, executes even when the stage is already
        complete; unlike a naive overwrite, the build may READ the
        stage's current table (e.g. merging a delta into ``term_df``):
        the new version is written to ``<stage>__next`` first and swapped
        in only after the write succeeds — the read side never sees its
        own half-written output, and a crash mid-refresh leaves the old
        version intact (the snapshot-then-commit shape of an Iceberg
        RewriteFiles operation).
        """
        if self.materialize != "parquet":
            raise ValueError("refresh requires parquet materialization")
        import shutil

        start = time.time()
        next_path = self.out / f"{stage}__next"
        final = self.out / stage
        if next_path.exists():
            # leftover from a crashed refresh.  Two cases:
            #  - the crash hit BETWEEN rmtree(final) and the rename: the
            #    complete new version at __next is the ONLY copy — finish
            #    the swap (deleting it here would destroy the stage, and
            #    the build lambda may read the stage's own table);
            #  - the stage still exists (crash during or right after the
            #    __next write): the old version is intact, discard the
            #    leftover and rebuild.
            if (next_path / "_SUCCESS").exists() and not final.exists():
                next_path.rename(final)
            else:
                shutil.rmtree(next_path)
        with _SWEEP_LOCK:
            pre = self._persistent_ids()
            df = build()
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(next_path))
            self._free_persisted(keep=pre)
        if final.exists():
            shutil.rmtree(final)
        next_path.rename(final)
        out_df = self.load(stage)
        rows = out_df.count()
        entry = {"status": "complete", "rows": rows}
        if partition_by:
            entry["partition_by"] = list(partition_by)
        self.progress[stage] = entry
        self.metrics.append(
            {
                "stage": stage,
                "rows_out": rows,
                "mode": "refresh",
                "seconds": round(time.time() - start, 3),
            }
        )
        self.progress_path.write_text(json.dumps(self.progress, indent=1))
        self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return out_df

    # ---- exactly-once incremental batches ---------------------------------
    #
    # A crawl increment touches MANY stages; a crash between two stage
    # appends followed by a replay must neither drop the batch's rows from
    # the not-yet-appended stages (the url anti-join sees the already-
    # appended documents and derives an EMPTY delta) nor double-append the
    # already-written ones.  The journal + staging protocol below makes
    # every (stage, batch) append and every (stage, batch) merge-refresh
    # exactly-once, whatever instant the process dies:
    #
    #  1. the batch's delta rows are STAGED durably under
    #     ``_batches/<batch_id>/<stage>`` (``_SUCCESS`` marks the staging
    #     write complete; a partial staging is simply overwritten);
    #  2. PUBLISH hard-links each staged data file into the stage
    #     directory under a batch-prefixed name, then journals the stage
    #     as published.  Links are skipped when the target already exists,
    #     so a crash anywhere inside publish replays to the same file set
    #     — and the staging stays readable, so downstream stages of a
    #     resumed batch reuse the exact staged delta instead of
    #     recomputing it from now-inconsistent state;
    #  3. merge-refreshes (term_df, entity_stats, nodes, ...) write a
    #     ``_BATCH`` token into the new version before the swap: a replay
    #     whose token already matches skips the merge instead of folding
    #     the delta in twice;
    #  4. when every stage is through, the batch is journaled complete and
    #     its staging directory is deleted.  A completed batch replays as
    #     a pure no-op.
    #
    # Single-writer contract (same as the rest of the Checkpointer): one
    # increment per graph directory at a time.

    def batch_dir(self, batch_id: str, stage: str | None = None) -> Path:
        d = self.out / "_batches" / batch_id
        return d / stage if stage else d

    def _batch_entry(self, batch_id: str) -> dict:
        return self.batches.setdefault(
            batch_id, {"status": "in_progress", "published": []}
        )

    def _write_batches(self) -> None:
        self.batches_path.write_text(json.dumps(self.batches, indent=1))

    def batch_is_complete(self, batch_id: str) -> bool:
        return self.batches.get(batch_id, {}).get("status") == "complete"

    def batch_mark_complete(self, batch_id: str) -> None:
        """Journal the batch complete and drop its staging directory."""
        import shutil

        entry = self._batch_entry(batch_id)
        entry["status"] = "complete"
        self._write_batches()
        shutil.rmtree(self.batch_dir(batch_id), ignore_errors=True)

    def stage_batch(self, stage: str, batch_id: str, build) -> DataFrame:
        """Write the batch's delta for ``stage`` to durable staging.

        Returns a reader over the STAGED rows — stable across crash
        replays (a resumed batch gets byte-identical delta rows without
        re-running ``build`` against post-crash state).  No-op when the
        staging already completed (``_SUCCESS`` present).
        """
        if self.materialize != "parquet":
            raise ValueError("stage_batch requires parquet materialization")
        staging = self.batch_dir(batch_id, stage)
        # constructing the plan is lazy and cheap; its schema makes the
        # read-back well-defined even for an EMPTY staged delta (zero
        # data files — schema inference has nothing to read)
        df = build()
        if not (staging / "_SUCCESS").exists():
            start = time.time()
            partition_by = self.partitioning(stage)
            with self._sweep_guard():
                writer = df.write.mode("overwrite")
                if partition_by:
                    writer = writer.partitionBy(*partition_by)
                writer.parquet(str(staging))
            with self._ledger_lock:
                self.metrics.append(
                    {
                        "stage": stage,
                        "mode": "stage-batch",
                        "batch": batch_id[:16],
                        "seconds": round(time.time() - start, 3),
                    }
                )
                self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return self.spark.read.schema(df.schema).parquet(str(staging))

    def publish_batch(self, stage: str, batch_id: str) -> None:
        """Atomically fold the staged delta into the stage table.

        Per-file hard links (rename-equivalent atomicity, no data copy;
        the staging stays intact for the rest of the batch).  Idempotent:
        already-linked files are skipped, so a replay after a crash at
        ANY point lands the same file set exactly once.  File names are
        prefixed with the batch id — per-file lineage of which increment
        brought which rows.
        """
        import os

        entry = self._batch_entry(batch_id)
        if stage in entry["published"]:
            return
        staging = self.batch_dir(batch_id, stage)
        if not (staging / "_SUCCESS").exists():
            raise ValueError(
                f"publish_batch({stage!r}): staging incomplete — call "
                "stage_batch first"
            )
        if not self.done(stage):
            raise ValueError(
                f"publish_batch target stage {stage!r} is not complete"
            )
        start = time.time()
        target_root = self.out / stage
        prefix = f"incr-{batch_id[:16]}"
        prev = self.progress.get(stage, {}).get("rows", 0)
        for src in staging.rglob("*"):
            if not src.is_file() or src.name.startswith(("_", ".")):
                continue
            rel = src.relative_to(staging)
            dst = target_root / rel.parent / f"{prefix}-{src.name}"
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                os.link(src, dst)
            except FileExistsError:
                pass  # replay of a crashed publish — already landed
        # ledger row count: prev + the STAGED delta's footer count — the
        # staging dir is ~O(delta) files, where a full-table recount
        # would list and read footers of every file the stage has ever
        # accumulated (O(increments x files), growing forever).  The
        # per-stage "batch" marker disambiguates the one crash window a
        # plain prev+delta cannot: died after the ledger write but
        # before the journal append — on that replay prev ALREADY holds
        # the delta, so adding it again would double-count.
        pentry = self.progress.get(stage, {})
        if pentry.get("batch") == batch_id:
            rows = pentry["rows"]  # ledger already includes this delta
        else:
            rows = prev + self.spark.read.parquet(str(staging)).count()
        with self._ledger_lock:
            pentry.update(
                {"status": "complete", "rows": rows, "batch": batch_id}
            )
            self.progress[stage] = pentry
            self.metrics.append(
                {
                    "stage": stage,
                    "rows_out": rows,
                    "rows_added": rows - prev,
                    "mode": "append-batch",
                    "batch": batch_id[:16],
                    "seconds": round(time.time() - start, 3),
                }
            )
            self.progress_path.write_text(json.dumps(self.progress, indent=1))
            self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
            # journal LAST: a crash anywhere above replays into idempotent
            # re-links + a ledger recount; journaling first would let a
            # crash freeze the ledger's pre-batch row count forever
            entry["published"].append(stage)
            self._write_batches()

    def append_batch(self, stage: str, batch_id: str, build) -> DataFrame:
        """Exactly-once append of a batch's delta rows (stage + publish).

        Returns the STAGED delta (not the whole table): downstream
        derivations of the same batch must read the delta, and the staged
        copy is the one that is stable on replay.
        """
        staged = self.stage_batch(stage, batch_id, build)
        self.publish_batch(stage, batch_id)
        return staged

    def refresh_batch(self, stage: str, batch_id: str, build,
                      partition_by: list[str] | None = None) -> DataFrame:
        """Exactly-once :meth:`refresh` for merge-style rebuilds.

        ``build`` may fold the batch's delta into the stage's CURRENT
        table (``term_df + delta_df``); replaying that after the swap
        would fold the delta in twice.  The new version carries a
        ``_BATCH`` token (underscore-prefixed — invisible to Spark's file
        index): a replay whose token already matches returns the table
        as-is; a crash between the swap steps is finished from the
        token-matching ``__next``.
        """
        if self.materialize != "parquet":
            raise ValueError("refresh_batch requires parquet materialization")
        import shutil

        final = self.out / stage
        next_path = self.out / f"{stage}__next"
        token = final / "_BATCH"
        if token.exists() and token.read_text() == batch_id:
            # this batch already refreshed it; re-sync the ledger row
            # count if the crash hit between the swap and the record
            out_df = self.load(stage)
            if self.progress.get(stage, {}).get("rows") != out_df.count():
                return self._record_refresh(stage, partition_by, time.time())
            return out_df
        if next_path.exists():
            ntoken = next_path / "_BATCH"
            if (
                (next_path / "_SUCCESS").exists()
                and ntoken.exists()
                and ntoken.read_text() == batch_id
            ):
                # crashed between write and swap: the new version is
                # complete — finish the swap instead of re-merging
                if final.exists():
                    shutil.rmtree(final)
                next_path.rename(final)
                return self._record_refresh(stage, partition_by, time.time())
            shutil.rmtree(next_path)  # stale leftover (other batch/partial)
        start = time.time()
        with self._sweep_guard():
            writer = build().write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(next_path))
        (next_path / "_BATCH").write_text(batch_id)
        if final.exists():
            shutil.rmtree(final)
        next_path.rename(final)
        return self._record_refresh(stage, partition_by, start)

    def _record_refresh(self, stage: str, partition_by, start) -> DataFrame:
        out_df = self.load(stage)
        rows = out_df.count()
        with self._ledger_lock:
            entry = {"status": "complete", "rows": rows}
            if partition_by:
                entry["partition_by"] = list(partition_by)
            self.progress[stage] = entry
            self.metrics.append(
                {
                    "stage": stage,
                    "rows_out": rows,
                    "mode": "refresh",
                    "seconds": round(time.time() - start, 3),
                }
            )
            self.progress_path.write_text(json.dumps(self.progress, indent=1))
            self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return out_df

    def compact(self, stage: str,
                target_rows_per_file: int = 4_000_000) -> DataFrame:
        """Rewrite a stage's files into fewer, larger ones (parquet only).

        The Iceberg RewriteFiles analog for the small-files debt
        fast-appends accrue: every :meth:`append` adds a task's worth of
        files, so after many increments a table scan pays listing +
        task-per-file overhead on thousands of tiny files — the classic
        100 TB operational failure.  Hive-partitioned stages are
        re-shuffled BY their partition columns so each ``col=v``
        directory collapses to one file per shuffle task that holds the
        value (usually one); unpartitioned stages coalesce to
        ``ceil(rows / target_rows_per_file)`` files.  The swap goes
        through :meth:`refresh`'s write-to-``__next``-then-rename path,
        so a crash mid-compaction leaves the old files intact.  Row
        count is asserted unchanged — compaction must never create or
        drop a row.
        """
        if self.materialize != "parquet":
            raise ValueError("compact requires parquet materialization")
        if not self.done(stage):
            raise ValueError(f"compact target stage {stage!r} is not complete")
        partition_by = self.partitioning(stage)
        rows_before = self.progress.get(stage, {}).get("rows", 0)
        if partition_by:
            build = lambda: self.load(stage).repartition(*partition_by)  # noqa: E731
        else:
            n_files = max(1, -(-rows_before // target_rows_per_file))
            build = lambda: self.load(stage).coalesce(n_files)  # noqa: E731
        out_df = self.refresh(stage, build, partition_by=partition_by)
        rows_after = self.progress[stage]["rows"]
        if rows_after != rows_before:
            raise RuntimeError(
                f"compact({stage!r}) changed row count: "
                f"{rows_before} -> {rows_after}"
            )
        self.metrics[-1]["mode"] = "compact"
        self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return out_df

    def data_file_count(self, stage: str) -> int:
        """Number of parquet data files in a stage directory (cheap
        directory walk, no Spark job; underscore/dot files excluded)."""
        stage_dir = self.out / stage
        if not stage_dir.is_dir():
            return 0
        return sum(
            1
            for p in stage_dir.rglob("*")
            if p.is_file() and not p.name.startswith(("_", "."))
        )

    def maybe_compact(self, stage: str, max_files: int = 512,
                      target_rows_per_file: int = 4_000_000) -> bool:
        """Retire small-files debt when (and only when) it has accrued.

        The operational loop fast-appends leave open at 100 TB: every
        increment adds a task's worth of files per stage, and after
        hundreds of increments a scan pays listing + task-per-file
        overhead on tens of thousands of tiny files.  Compacting after
        EVERY increment would be an O(table) rewrite per O(delta) of new
        data — quadratic over the table's life — so the policy is a file
        -count threshold: rewrite only when the stage holds more than
        ``max_files`` data files, which amortizes the O(table) rewrite
        over the ~max_files/files-per-increment increments that accrued
        it.  Crash-safe (compact goes through refresh's ``__next`` swap)
        and a no-op for stages that are not complete yet.  Returns
        whether a compaction ran.
        """
        if self.materialize != "parquet" or not self.done(stage):
            return False
        if self.data_file_count(stage) <= max_files:
            return False
        self.compact(stage, target_rows_per_file=target_rows_per_file)
        return True

    def run_partitioned(
        self,
        stage: str,
        build_part,
        values: list,
        partition_col: str = "year",
        build_full=None,
    ) -> DataFrame:
        """Per-PARTITION checkpoints (north_rule: "resumable from
        per-partition checkpoints"): each partition value is built and
        written independently (``<stage>/<partition_col>=<v>/``) and
        recorded in the ledger, so a run killed mid-stage resumes at the
        first incomplete partition instead of rebuilding the whole stage —
        the Iceberg-snapshot-per-partition analog.

        ``build_part(v)`` returns that partition's rows (the
        ``partition_col`` column is dropped before the write and recovered
        by partition discovery on read).  In memory mode (scaling harness)
        falls back to one unpartitioned pass.
        """
        if self.materialize == "memory":
            if build_full is None:
                raise ValueError("memory mode needs build_full")
            return self.run(stage, build_full)
        if not values:
            # no partition values (empty input): per-partition checkpoints
            # degenerate to one per-stage checkpoint of the full build
            if build_full is None:
                raise ValueError(f"{stage}: empty values needs build_full")
            return self.run(stage, build_full)
        if self.done(stage):
            return self.load(stage)
        state = self.progress.setdefault(
            stage,
            {
                "status": "partial",
                "parts": {},
                "partition_by": [partition_col],
            },
        )
        parts: dict = state.setdefault("parts", {})
        start = time.time()
        with self._sweep_guard():
            for v in values:
                if str(v) in parts:
                    continue
                part_start = time.time()
                pdf = build_part(v).drop(partition_col)
                pdf.write.mode("overwrite").parquet(
                    str(self.out / stage / f"{partition_col}={v}")
                )
                parts[str(v)] = {
                    "seconds": round(time.time() - part_start, 3)
                }
                with self._ledger_lock:
                    self.progress_path.write_text(
                        json.dumps(self.progress, indent=1)
                    )
            # root-level marker so done() sees the whole stage (Spark
            # ignores underscore-prefixed files during partition
            # discovery); the stage dir may not exist yet if every
            # partition was resumed from a ledger whose directories were
            # externally removed
            (self.out / stage).mkdir(parents=True, exist_ok=True)
            (self.out / stage / "_SUCCESS").touch()
        out_df = self.load(stage)
        rows = out_df.count()
        with self._ledger_lock:
            state["status"] = "complete"
            state["rows"] = rows
            self.metrics.append(
                {
                    "stage": stage,
                    "rows_out": rows,
                    "seconds": round(time.time() - start, 3),
                    "partitions": {k: v["seconds"] for k, v in parts.items()},
                }
            )
            self.progress_path.write_text(json.dumps(self.progress, indent=1))
            self.metrics_path.write_text(json.dumps(self.metrics, indent=1))
        return out_df


def aggregate_edges(
    all_triples: DataFrame,
    nodes: DataFrame,
    n_entities: int = 0,
) -> DataFrame:
    """(pred, canonical_id) → n_docs, n_mentions, years.  Skew-hardened.

    The canonical-entity dictionary is small against the triples (a
    few thousand rows vs 27M+ at the 2M bench) — broadcast explicitly
    rather than leaving AQE a bistable choice (r01 lesson).  But the
    dictionary CONTAINS the mined topic vocabulary, which grows with
    the corpus, so the hint is gated on the nodes stage's recorded
    row count (no extra job): past ~2M entries the join falls back to
    shuffle (where AQE may still broadcast if the bytes allow) instead
    of hitting the 8 GB broadcast cliff at the 10^12-doc design point.
    The aggregate groups on (pred, canonical_id): a FEW head entities
    carry a large share of all mentions, so the distinct-doc count
    runs two-phase over a doc-hash salt (operators/skew.py pattern) —
    the hot key fans out over n_salts reducers, exact by construction
    because the salt is a function of the counted value.
    """
    ent = nodes.select(
        F.col("entity_type").alias("pred"),
        F.col("name").alias("obj"),
        "canonical_id",
    )
    dict_side = F.broadcast(ent) if n_entities <= 2_000_000 else ent
    joined = all_triples.join(dict_side, ["pred", "obj"])
    partial = (
        joined.withColumn(
            "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(16))
        )
        .groupBy("pred", "canonical_id", "_salt")
        .agg(
            F.countDistinct("doc_id").alias("_docs"),
            F.count("*").alias("_mentions"),
            F.collect_set("year").alias("_years"),
        )
    )
    return partial.groupBy("pred", "canonical_id").agg(
        F.sum("_docs").cast("long").alias("n_docs"),
        F.sum("_mentions").cast("long").alias("n_mentions"),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list("_years")))
        ).alias("years"),
    )


def _surface_norm():
    """Blocking key for exact-duplicate surfaces: lowercased,
    non-alphanumeric collapsed to single spaces, trimmed.  ONE definition
    shared by full and incremental canonicalization — the equivalence
    proof of the incremental path assumes the edge predicates are
    identical expressions."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("name"), "[^a-z0-9]+", " "), "\\s+", " "
        )
    )


def _surface_band_index(entities: DataFrame) -> DataFrame:
    """(entity_id, band, bucket) LSH band index over topic-like surfaces.

    Pure per-entity function of the name (3+ token names only, k=2 word
    shingles, 16 minhash lanes, 8 bands × 2 rows) — the SAME parameters
    :func:`canonicalize_entities` uses, so an index built incrementally
    (backfill once, then append each batch's new surfaces) reproduces
    exactly the candidate pairs the full rebuild's LSH would emit.
    """
    topicish = entities.filter(F.size(F.split("name", " ")) >= 3)
    sh = shingles(
        topicish.select(F.col("entity_id").alias("doc_id"), "name"),
        id_col="doc_id",
        text_col="name",
        k=2,
    )
    sigs = minhash_signatures(sh, num_hashes=16)
    return lsh_band_buckets(sigs, bands=8, rows_per_band=2).select(
        F.col("doc_id").alias("entity_id"), "band", "bucket"
    )


def canonicalize_entities(
    spark: SparkSession,
    triples: DataFrame,
    max_component_size: int | None = None,
) -> DataFrame:
    """Merge duplicate entity surfaces → canonical nodes (stage 4+5).

    1. blocking key = normalized surface (broadcast-dictionary alias
       resolution already happened inside the cascade),
    2. MinHash-LSH candidate pairs over entity-name shingles (catches
       near-identical topic phrases),
    3. connected components over the union of exact-normalized and LSH
       edges → canonical_id = min member id.

    Returns (entity_type, name, entity_id, canonical_id).

    ``max_component_size`` (r03 VERDICT "what's missing" #1): transitive
    CC can chain-merge thousands of distinct head topics into one
    canonical id where the reference's Leiden would keep them apart; with
    the bound set, oversized components are re-split by modularity local
    moves (:func:`..operators.components.guarded_components`) — only
    surfaces whose linkage beats the configuration-model expectation stay
    merged.  Default None preserves the pure-CC labels (the near-dup
    regime where the transitive closure IS the semantics, and the
    oracle-checked default).
    """
    entities = (
        triples.select(
            F.col("pred").alias("entity_type"), F.col("obj").alias("name")
        )
        .distinct()
        .withColumn("entity_id", F.xxhash64("entity_type", "name"))
        # referenced by the exact-pair self-join, the LSH branch, the CC
        # node list, and the final join — materialize once
        .localCheckpoint(eager=True)
    )

    # exact-normalized edges: same (type, normalized name) → pair.
    # JVM expression (not the Python kernel): blocking only needs a
    # deterministic key, and lower() == casefold() on entity names here.
    normed = entities.withColumn("norm", _surface_norm())
    exact_pairs = (
        normed.alias("a")
        .join(normed.alias("b"), ["entity_type", "norm"])
        .filter(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("src"), F.col("b.entity_id").alias("dst")
        )
    )

    # LSH near-dup edges over topic-like names (3+ tokens).  Built
    # unconditionally: when no name qualifies the branch is an empty
    # DataFrame and the union below is a no-op — no probe job (r02 ran an
    # extra limit(1).count() here just to skip it).  Same band family as
    # _surface_band_index (the incremental path's stored index).
    banded = _surface_band_index(entities).withColumnRenamed(
        "entity_id", "doc_id"
    )
    a, b = banded.alias("a"), banded.alias("b")
    near_pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .distinct()
    )

    cc = components_with_singletons(
        entities.select(F.col("entity_id").alias("node")),
        exact_pairs.unionByName(near_pairs),
        max_component_size=max_component_size,
    )
    return entities.join(
        cc, entities.entity_id == cc.node, "left"
    ).select(
        "entity_type",
        "name",
        "entity_id",
        F.coalesce("component", "entity_id").alias("canonical_id"),
    )


def incremental_canonicalize(
    old_nodes: DataFrame,
    new_ents: DataFrame,
    new_bands: DataFrame,
    all_bands: DataFrame,
) -> DataFrame:
    """O(delta)-work entity canonicalization: fold NEW surfaces into an
    existing labeling without re-running LSH + CC over every surface.

    Exactness argument (why this equals ``canonicalize_entities`` over the
    union surface set, for the append-only / unguarded regime):

    - both edge predicates are PAIRWISE-deterministic functions of the two
      surfaces alone — norm equality (:func:`_surface_norm`) and shared
      LSH band bucket (:func:`_surface_band_index`) — so the old×old edge
      set is unchanged by new arrivals, and ``old_nodes``'s components
      summarize exactly its connectivity;
    - contracting each old component to its canonical_id and running CC
      over {contracted old nodes ∪ new entities} with only the NEW edges
      (new×all norm matches + new×all band-bucket matches) yields the
      same partition as CC over the full graph (edge contraction
      preserves connectivity);
    - labels compose: an old canonical_id is the MIN member entity_id of
      its component, so min over merged contracted ids = min over all
      member entity ids — the exact label a full rebuild assigns.

    The delta side of every join is broadcast (new surfaces per crawl
    batch are dictionary-small); the entity-sized tables are scanned
    once, never self-joined, and the CC iterations run over just the
    delta-touched subgraph.  Returns the full (entity_type, name,
    entity_id, canonical_id) table.
    """
    old_keyed = old_nodes.select("entity_type", "name", "entity_id")
    all_normed = (
        old_keyed.unionByName(new_ents.select("entity_type", "name", "entity_id"))
        .withColumn("norm", _surface_norm())
    )
    new_normed = new_ents.withColumn("norm", _surface_norm())
    norm_edges = (
        F.broadcast(
            new_normed.select(
                "entity_type", "norm", F.col("entity_id").alias("src")
            )
        )
        .join(
            all_normed.select(
                "entity_type", "norm", F.col("entity_id").alias("dst")
            ),
            ["entity_type", "norm"],
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    lsh_edges = (
        F.broadcast(
            new_bands.select("band", "bucket", F.col("entity_id").alias("src"))
        )
        .join(
            all_bands.select("band", "bucket", F.col("entity_id").alias("dst")),
            ["band", "bucket"],
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = norm_edges.unionByName(lsh_edges)

    # contract: old entity → its component's canonical id; new → itself
    contract = old_nodes.select("entity_id", "canonical_id").unionByName(
        new_ents.select(
            "entity_id", F.col("entity_id").alias("canonical_id")
        )
    )
    cedges = (
        F.broadcast(edges)
        .join(
            contract.select(
                F.col("entity_id").alias("src"),
                F.col("canonical_id").alias("csrc"),
            ),
            "src",
        )
        .join(
            contract.select(
                F.col("entity_id").alias("dst"),
                F.col("canonical_id").alias("cdst"),
            ),
            "dst",
        )
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .localCheckpoint(eager=True)
    )
    mini_nodes = (
        new_ents.select(F.col("entity_id").alias("node"))
        .unionByName(cedges.select(F.col("src").alias("node")))
        .unionByName(cedges.select(F.col("dst").alias("node")))
        .distinct()
    )
    cc = components_with_singletons(mini_nodes, cedges)
    relabel = cc.filter(F.col("node") != F.col("component"))

    old_rows = (
        old_nodes.join(
            F.broadcast(relabel),
            old_nodes.canonical_id == relabel.node,
            "left",
        )
        .select(
            "entity_type",
            "name",
            "entity_id",
            F.coalesce("component", old_nodes.canonical_id).alias(
                "canonical_id"
            ),
        )
    )
    new_rows = (
        new_ents.join(
            F.broadcast(relabel),
            new_ents.entity_id == relabel.node,
            "left",
        )
        .select(
            "entity_type",
            "name",
            "entity_id",
            F.coalesce("component", new_ents.entity_id).alias("canonical_id"),
        )
    )
    return old_rows.unionByName(new_rows)


def build_graph(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    with_topics: bool = True,
    with_affiliations: bool = True,
    materialize: str = "parquet",
    triples_granularity: str = "year",
    max_component_size: int | None = None,
) -> dict[str, DataFrame]:
    """Run all stages with checkpointing; returns the tables.

    ``triples_granularity="year"``: the triples stage (the expensive Arrow
    mention pass) checkpoints PER YEAR PARTITION — a killed 10-hour run
    resumes at the first unfinished year.  Each partition job carries
    ~20-25 s of fixed scheduling/commit overhead in the sandbox — nothing
    at the 10^12-doc design point where a partition is hours of work, but
    dominant in a minutes-long benchmark; pass ``"none"`` to run the stage
    as one job (per-stage checkpoint only).  Corpus-level stages (topics
    df/idf, nodes CC) are always per-stage: splitting them would change
    their statistics.
    """
    ck = Checkpointer(spark, out_dir, materialize=materialize)

    docs = ck.run(
        "documents", lambda: extract_documents(pages), partition_by=["year"]
    )
    n_docs = ck.progress.get("documents", {}).get("rows")

    # ---- independent per-document chains (same shape as the increment's:
    # triples | topics | affiliation cleaning→distances).  In parquet mode
    # the chains run on driver threads in per-chain FAIR pools under ONE
    # deferred persisted-block sweep — stage-barrier dead time in one
    # chain is filled with sibling-chain work (the move that cut the
    # incremental path's wall 25%+).  Memory mode stays sequential: its
    # persisted stage outputs must never meet the scope's exit sweep.
    results: dict[str, DataFrame] = {}

    def _chain_triples() -> None:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", "build-triples"
        )
        # job-group tag: lets the bench attribute per-chain EXECUTOR
        # TASK TIME (AppStatusStore) instead of wall-span subtraction,
        # which double-credits overlap under concurrent chains
        spark.sparkContext.setLocalProperty(
            "spark.jobGroup.id", "build-triples"
        )
        if triples_granularity == "year":
            years = [
                r["year"] for r in docs.select("year").distinct().collect()
            ]
            results["triples"] = ck.run_partitioned(
                "triples",
                lambda y: emit_triples(
                    spark, docs.filter(F.col("year") == y)
                ),
                sorted(years),
                partition_col="year",
                build_full=lambda: emit_triples(spark, docs),
            )
        else:
            results["triples"] = ck.run(
                "triples", lambda: emit_triples(spark, docs)
            )

    def _chain_topics() -> None:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", "build-topics"
        )
        # job-group tag: lets the bench attribute per-chain EXECUTOR
        # TASK TIME (AppStatusStore) instead of wall-span subtraction,
        # which double-credits overlap under concurrent chains
        spark.sparkContext.setLocalProperty(
            "spark.jobGroup.id", "build-topics"
        )
        # within-doc fuzzy dedup BEFORE emitting HAS_TOPIC, matching the
        # reference (topic_discovery_pipeline.py:421-472 dedup_token_set
        # runs on the per-doc candidate list before DB insert); the
        # applyInPandas groups are <= top_k rows, so it's one cheap
        # shuffle of the already-reduced topics table
        results["topics"] = ck.run(
            "topics",
            lambda: topic_triples(
                docs,
                dedup_topics_within_doc(mine_topics(docs, n_docs=n_docs)),
            ),
        )

    def _chain_affiliations() -> None:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", "build-affiliations"
        )
        # job-group tag: lets the bench attribute per-chain EXECUTOR
        # TASK TIME (AppStatusStore) instead of wall-span subtraction,
        # which double-credits overlap under concurrent chains
        spark.sparkContext.setLocalProperty(
            "spark.jobGroup.id", "build-affiliations"
        )
        cleaned = ck.run(
            "cleaned_affiliations",
            lambda: clean_affiliations(affiliation_segments(docs)),
        )
        results["cleaned_affiliations"] = cleaned
        results["affiliation_type_distances"] = ck.run(
            "affiliation_type_distances",
            lambda: affiliation_type_distances(spark, cleaned),
        )

    chains = [_chain_triples]
    if with_topics:
        chains.append(_chain_topics)
    if with_affiliations:
        chains.append(_chain_affiliations)

    if len(chains) > 1 and materialize == "parquet":
        with ck.deferred_sweep():
            with ThreadPoolExecutor(max_workers=len(chains)) as tpe:
                futures = [tpe.submit(c) for c in chains]
            for fut in futures:
                fut.result()
    else:
        for chain in chains:
            chain()
        # sequential path runs the chains on THIS thread — clear the
        # chain tags so downstream stages (nodes/edges) aren't
        # misattributed to the last chain's job group
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    triples = results["triples"]
    all_triples = (
        triples.unionByName(results["topics"]) if with_topics else triples
    )
    extra_tables = (
        {
            "cleaned_affiliations": results["cleaned_affiliations"],
            "affiliation_type_distances": results[
                "affiliation_type_distances"
            ],
        }
        if with_affiliations
        else {}
    )

    nodes = ck.run(
        "nodes",
        lambda: canonicalize_entities(
            spark, all_triples, max_component_size=max_component_size
        ),
        partition_by=["entity_type"],
    )

    n_ents = ck.progress.get("nodes", {}).get("rows", 0)
    edges = ck.run(
        "edges",
        lambda: aggregate_edges(all_triples, nodes, n_entities=n_ents),
        partition_by=["pred"],
    )

    return {
        "documents": docs,
        "triples": all_triples,
        "nodes": nodes,
        "edges": edges,
        **extra_tables,
    }


def incremental_update(
    spark: SparkSession,
    out_dir: str,
    new_pages: DataFrame,
    with_topics: bool = True,
    with_affiliations: bool = True,
    topics_mode: str = "refresh",
    edge_counts: str = "exact",
    nodes_mode: str = "auto",
    max_component_size: int | None = None,
    compact_threshold: int | None = 4096,
) -> dict[str, DataFrame]:
    """Fold a new crawl batch into an existing :func:`build_graph` output.

    ``compact_threshold``: after the batch journals complete, any
    fast-append stage holding more than this many data files is
    compacted (:meth:`Checkpointer.maybe_compact`) — the amortized
    retirement of small-files debt that appends accrue over hundreds of
    increments.  ``None`` disables auto-compaction.  The returned
    DataFrames are (re)loaded AFTER any compaction, so their file
    listings are always the post-swap ones — callers can act on them
    without a REFRESH TABLE equivalent.

    The monthly-Common-Crawl shape: pages whose url is already in the
    ``documents`` stage are skipped (left-anti, the table-level form of
    the reference's process-where-NULL resumability idiom, SURVEY.md
    §2.B3/C2); the per-document stages (extract, triples, affiliation
    cleaning) run on the DELTA ONLY and fast-append to their stage
    tables; the entity-level stages (canonicalization, edges) are
    rebuilt from entity-sized inputs — never from a rescan of old
    documents.

    Cost model at the 10^12-doc design point, per increment of d docs
    into a corpus of n >> d docs:

    - documents / triples / cleaned_affiliations /
      affiliation_type_distances: O(d) — the expensive Arrow mention
      pass touches only new pages, and type distances append too (each
      row depends only on its own cleaned text and the fixed type
      vectors).
    - nodes: O(delta) compute + O(entities) rewrite.  When the surface
      set is append-only (``topics_mode="frozen_idf"`` or
      ``with_topics=False``) and unguarded, ``nodes_mode="auto"`` uses
      :func:`incremental_canonicalize`: only the batch's NEW surfaces are
      shingled/minhashed and CC'd against the CONTRACTED old components
      (old canonical ids as super-nodes), with the stored
      ``surface_bands`` LSH index supplying old-side candidates — exactly
      the labels a full re-canonicalization would produce, proven by
      edge contraction (see its docstring) and the parity test.
      Otherwise (``topics_mode="refresh"``, a ``max_component_size``
      guard, or ``nodes_mode="full"``) canonicalization re-runs over the
      incrementally maintained ``entity_surfaces`` stage — still never a
      rescan of old documents.  Canonical ids are min-member
      ids, so a delta surface that bridges two old components CAN change
      old rows' canonical_id — by design (that is what new evidence of
      sameness means); downstream consumers must treat canonical_id as
      a snapshot-scoped key, exactly like the reference's re-runs.
    - topics + edges: choose the semantics —

      ``topics_mode="refresh"`` (default, exact): re-mines topics over
      the combined corpus, so results are IDENTICAL to a from-scratch
      :func:`build_graph` on the union — the parity-testable contract.
      O(n) per increment.
      ``topics_mode="frozen_idf"`` (the at-scale path): maintains a
      ``term_df`` stage of mergeable document frequencies (df over A∪B =
      df(A)+df(B) for disjoint batches) and mines ONLY the delta docs
      against the merged corpus-wide statistics — delta docs get exactly
      the topics a full rebuild would give them; topics already mined
      for OLD docs are kept as-is (their idf snapshot is the corpus at
      their ingest time — vocabulary versioning, the standard production
      trade).  O(d + |vocabulary|) per increment.

      ``edge_counts="exact"`` (default): re-aggregates edges from the
      combined triples table — one O(n_triples) column-pruned scan, the
      only corpus-sized pass in the default increment.
      ``edge_counts="sketch"``: maintains an ``entity_stats`` stage of
      per-surface mergeable aggregates — n_mentions and years exactly,
      distinct-doc counts as HLL sketches (`hll_sketch_agg`) — and
      builds edges from stats ⋈ nodes alone: n_docs becomes a ±~2%
      HLL estimate (a doc mentioning two surfaces of one canonical
      entity must not double-count, so per-surface EXACT counts cannot
      be merged — the sketch union can).  Requires
      ``topics_mode="frozen_idf"`` (old docs' topic rows must be
      immutable for the stats to stay mergeable).  O(d + |entities|).

    Crash safety: the whole increment is EXACTLY-ONCE per batch.  A
    deterministic batch id (order-independent content hash of the
    incoming pages) keys the Checkpointer's batch journal; the delta is
    staged durably before anything publishes; per-stage publishes are
    idempotent hard-link folds and the merge-refreshes carry a
    ``_BATCH`` token — so a process killed between ANY two stage writes
    replays to the exact state an uninterrupted run would have produced
    (pytest-proven by killing mid-increment at every stage boundary),
    and a completed batch replays as a pure no-op.  Without this, a
    replay would re-derive the delta against half-applied state: the
    url anti-join sees the already-published documents and silently
    drops the batch from every later stage.

    Returns the same table dict as :func:`build_graph`.
    """
    if topics_mode not in ("refresh", "frozen_idf"):
        raise ValueError(f"unknown topics_mode {topics_mode!r}")
    if edge_counts not in ("exact", "sketch"):
        raise ValueError(f"unknown edge_counts {edge_counts!r}")
    if nodes_mode not in ("auto", "full", "incremental"):
        raise ValueError(f"unknown nodes_mode {nodes_mode!r}")
    # incremental canonicalization is exact ONLY when the surface set is
    # append-only (refresh re-mines topics, which can retract old docs'
    # surfaces — contracted components cannot split) and unguarded
    # (guarded_components' modularity splits depend on the full internal
    # edge structure that contraction summarizes away)
    incr_nodes_ok = max_component_size is None and (
        not with_topics or topics_mode == "frozen_idf"
    )
    if nodes_mode == "incremental" and not incr_nodes_ok:
        raise ValueError(
            "nodes_mode='incremental' needs append-only surfaces "
            "(topics_mode='frozen_idf' or with_topics=False) and "
            "max_component_size=None"
        )
    use_incr_nodes = nodes_mode == "incremental" or (
        nodes_mode == "auto" and incr_nodes_ok
    )
    if edge_counts == "sketch" and with_topics and topics_mode != "frozen_idf":
        raise ValueError(
            "edge_counts='sketch' merges per-surface stats incrementally; "
            "topics_mode='refresh' rewrites old docs' topic rows, which "
            "would desynchronize the stats — use topics_mode='frozen_idf'"
        )
    ck = Checkpointer(spark, out_dir, materialize="parquet")
    required = ["documents", "triples", "nodes", "edges"]
    if with_topics:
        required.append("topics")
    if with_affiliations:
        required += ["cleaned_affiliations", "affiliation_type_distances"]
    for stage in required:
        if not ck.done(stage):
            raise ValueError(
                f"incremental_update needs a complete build_graph output; "
                f"stage {stage!r} is missing — run build_graph first"
            )

    def _load_all() -> dict[str, DataFrame]:
        docs = ck.load("documents")
        triples = ck.load("triples")
        if with_topics:
            triples = triples.unionByName(ck.load("topics"))
        out = {
            "documents": docs,
            "triples": triples,
            "nodes": ck.load("nodes"),
            "edges": ck.load("edges"),
        }
        if with_affiliations:
            out["cleaned_affiliations"] = ck.load("cleaned_affiliations")
            out["affiliation_type_distances"] = ck.load(
                "affiliation_type_distances"
            )
        return out

    # ---- batch identity: exactly-once across crash + replay ---------------
    # order-independent content hash of the incoming pages: a replayed
    # batch (streaming foreachBatch retry, operator rerun after a kill)
    # maps to the same journal entry under ANY partitioning; a different
    # crawl drop gets a fresh one.  One column-pruned aggregate.
    idrow = new_pages.select(
        F.expr("bit_xor(xxhash64(url, warc_ts))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    batch_id = f"{(idrow['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}-{idrow['n']}"
    if ck.batch_is_complete(batch_id):
        return _load_all()  # pure no-op replay of a finished batch

    # ---- delta discovery: pages not yet ingested ---------------------------
    def _derive_delta() -> DataFrame:
        # in-flight dedupe (SURVEY §2.G3): a crawl batch recrawls pages,
        # and doc_id = xxhash64(url), so two captures of one url must
        # collapse BEFORE ingest or every per-document stage double-counts
        # the doc.  Keeper = latest capture, ties broken by content hash
        # (deterministic under any partitioning).
        delta_pages = new_pages.join(
            ck.load("documents").select("url"), "url", "left_anti"
        )
        w_url = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.desc(F.xxhash64("html"))
        )
        return extract_documents(
            delta_pages.withColumn("_rn", F.row_number().over(w_url))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # stage (durable) BEFORE any publish: the anti-join above is only
    # correct while the batch's documents are unpublished — a crash
    # replay reuses the staged delta verbatim instead of re-deriving an
    # empty one from the half-applied state (exactly-once, not
    # at-most-once)
    # widen the staged delta's scan once for every consumer below: the
    # parquet reader packs a ~100 MB delta into 1-2 splits (128 MB
    # maxPartitionBytes) no matter how many files staging wrote, which
    # would run the map side of EVERY delta stage — the fused mention
    # Arrow pass, topic mining's tokenize/explode, term_df — on 1-2
    # cores.  One cheap round-robin exchange of the delta; a delta
    # already wider than the core count is returned untouched.
    delta_docs = ensure_parallel_scan(
        ck.stage_batch("documents", batch_id, _derive_delta)
    )
    n_delta = delta_docs.count()

    if n_delta == 0:
        ck.batch_mark_complete(batch_id)
        return _load_all()

    # ---- term_df backfill must read the PRE-publish documents table -------
    if with_topics and topics_mode == "frozen_idf" and not ck.done("term_df"):
        # first increment against a build that predates term_df: one
        # backfill scan of the already-ingested docs, never repeated
        ck.run("term_df", lambda: phrase_document_frequency(
            ck.load("documents")
        ))

    # ---- per-document stages: delta-only, exactly-once fast-append --------
    # each publish reuses the layout the ledger recorded for its stage —
    # a second increment must keep writing year= directories, never
    # root-level files (Checkpointer.partitioning docstring)
    ck.publish_batch("documents", batch_id)
    n_all_docs = ck.progress["documents"]["rows"]

    # The ENTIRE stage section runs under one deferred persisted-block
    # sweep: (a) concurrent chains must not serialize on the per-write
    # global sweep lock nor sweep a sibling's mid-flight checkpoint, and
    # (b) Dataset.unpersist() is a CacheManager no-op for
    # localCheckpointed frames (measured), so the increment's owned
    # checkpoints (shared delta tf, new_ents, emit_triples' internal
    # one) can ONLY be freed by an RDD-level sweep — one sweep at scope
    # exit frees all increment scaffolding while caller-owned blocks
    # persisted before the increment survive.  A long-running driver
    # (streaming foreachBatch) folds many increments through one
    # session, so leaking them is not an option.
    with ck.deferred_sweep():
        # ---- independent delta chains: triples | tf→df→topics | affiliations --
        # Each chain is a dependency-ordered sequence of exactly-once stage
        # writes over the SAME durably staged delta; the chains share nothing
        # else, so they are submitted from separate driver threads into
        # separate FAIR scheduler pools.  On a real cluster this is the
        # standard move for phases whose individual stages cannot saturate
        # the executors (stage barriers, small reduce phases, Arrow batch
        # tails): concurrent jobs fill each other's idle slots.  Measured on
        # the 100k-doc increment at local[8], the sequential chain spends
        # ~35 s of which ~28 s does not shrink with added cores — per-stage
        # dead time, not compute — which capped the N→4N incremental scaling
        # efficiency; overlap converts that dead time into work.  Crash
        # safety is unchanged: each stage keeps its own staging/_BATCH
        # journal entry, and a replay re-enters the same chains (a thread
        # failure surfaces after all chains join, like any mid-batch crash).
        results: dict[str, DataFrame] = {}

        def _chain_triples() -> None:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "incr-triples"
            )
            results["triples"] = ck.append_batch(
                "triples", batch_id, lambda: emit_triples(spark, delta_docs)
            )

        def _chain_topics() -> None:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "incr-topics"
            )
            # ONE phrase-extraction pass over the delta, shared by the df
            # fold and the topic-scoring pass below — each increment
            # previously paid the tokenize→n-gram→explode kernel twice (the
            # most expensive non-triples delta stage, ~6 s per 100k-doc
            # delta at 8 cores).  Freed by the deferred sweep even if a
            # stage write below raises.
            delta_tf = phrase_tf(delta_docs).localCheckpoint(eager=True)
            # self-merge: replaying it after the swap would fold the delta's
            # document frequencies in TWICE — refresh_batch's _BATCH token
            # makes it exactly-once
            ck.refresh_batch(
                "term_df",
                batch_id,
                lambda: ck.load("term_df")
                .unionByName(
                    delta_tf.groupBy("phrase").agg(F.count("*").alias("df"))
                )
                .groupBy("phrase")
                .agg(F.sum("df").cast("long").alias("df")),
            )
            results["topics"] = ck.append_batch(
                "topics",
                batch_id,
                lambda: topic_triples(
                    delta_docs,
                    dedup_topics_within_doc(
                        mine_topics(
                            delta_docs,
                            n_docs=n_all_docs,
                            df_counts=ck.load("term_df"),
                            tf=delta_tf,
                        )
                    ),
                ),
            )
            # NOTE: no Dataset.unpersist() here — it is a CacheManager no-op
            # for a localCheckpointed frame; the increment-wide deferred
            # sweep below is what actually frees the tf blocks.

        def _chain_affiliations() -> None:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "incr-affiliations"
            )
            # the staged delta feeds BOTH appends (one Arrow cleaning pass);
            # per-row output depends only on the row's own cleaned text and
            # the FIXED type vectors, so distances over A ∪ B = distances(A)
            # ∪ distances(B) for disjoint docs — append the delta's rows,
            # never recompute the corpus (O(d), not O(n))
            delta_cleaned = ck.append_batch(
                "cleaned_affiliations",
                batch_id,
                lambda: clean_affiliations(affiliation_segments(delta_docs)),
            )
            ck.append_batch(
                "affiliation_type_distances",
                batch_id,
                lambda: affiliation_type_distances(spark, delta_cleaned),
            )

        chains = [_chain_triples]
        if with_topics and topics_mode != "refresh":
            chains.append(_chain_topics)
        if with_affiliations:
            chains.append(_chain_affiliations)

        if len(chains) > 1:
            with ThreadPoolExecutor(max_workers=len(chains)) as tpe:
                futures = [tpe.submit(c) for c in chains]
            for fut in futures:
                fut.result()
        else:
            chains[0]()

        delta_triples = results["triples"]
        delta_batch = delta_triples  # delta contribution to all_triples
        if with_topics:
            if topics_mode == "refresh":
                all_docs = ck.load("documents")
                ck.refresh_batch(
                    "topics",
                    batch_id,
                    lambda: topic_triples(
                        all_docs,
                        dedup_topics_within_doc(
                            mine_topics(all_docs, n_docs=n_all_docs)
                        ),
                    ),
                )
                # frozen-idf bookkeeping is meaningless after a re-mine, and a
                # re-mine can RETRACT surfaces, so the incremental band index
                # is stale too — drop both; the next frozen/incremental call
                # backfills them from the then-current state
                import shutil

                for stale in ("term_df", "surface_bands"):
                    if ck.done(stale):
                        shutil.rmtree(ck.out / stale)
                        ck.progress.pop(stale, None)
                ck.progress_path.write_text(json.dumps(ck.progress, indent=1))
            else:
                delta_batch = delta_triples.unionByName(results["topics"])
            all_triples = ck.load("triples").unionByName(ck.load("topics"))
        else:
            all_triples = ck.load("triples")

        # ---- entity_surfaces: the nodes stage's entity-sized input ------------
        if not ck.done("entity_surfaces"):
            # first increment: one column-pruned scan of the combined triples
            ck.run(
                "entity_surfaces",
                lambda: all_triples.select("pred", "obj").distinct(),
            )
        elif with_topics and topics_mode == "refresh":
            # re-mined topics may add/remove surfaces for OLD docs too
            ck.refresh_batch(
                "entity_surfaces",
                batch_id,
                lambda: all_triples.select("pred", "obj").distinct(),
            )
        else:
            # the surface set is append-only here: publish only the genuinely
            # NEW surfaces (anti-join against the current set at build time)
            # — O(delta) appended instead of the O(entities) rewrite a
            # union+distinct refresh would pay per increment
            ck.append_batch(
                "entity_surfaces",
                batch_id,
                lambda: delta_batch.select("pred", "obj")
                .distinct()
                .join(ck.load("entity_surfaces"), ["pred", "obj"], "left_anti"),
            )
        surfaces = ck.load("entity_surfaces")

        if use_incr_nodes:
            # O(delta) canonicalization: only NEW surfaces are shingled,
            # minhashed, and CC'd (against the contracted old components); the
            # band index over old surfaces is a stored stage, backfilled once
            old_nodes = ck.load("nodes")
            if not ck.done("surface_bands"):
                ck.run("surface_bands", lambda: _surface_band_index(old_nodes))
            new_ents = (
                delta_batch.select(
                    F.col("pred").alias("entity_type"),
                    F.col("obj").alias("name"),
                )
                .distinct()
                .join(
                    old_nodes.select("entity_type", "name"),
                    ["entity_type", "name"],
                    "left_anti",
                )
                .withColumn("entity_id", F.xxhash64("entity_type", "name"))
                .localCheckpoint(eager=True)
            )
            if new_ents.count() == 0:
                nodes = old_nodes
            else:
                new_bands = ck.append_batch(
                    "surface_bands",
                    batch_id,
                    lambda: _surface_band_index(new_ents),
                )
                all_bands = ck.load("surface_bands")
                nodes = ck.refresh_batch(
                    "nodes",
                    batch_id,
                    lambda: incremental_canonicalize(
                        old_nodes, new_ents, new_bands, all_bands
                    ),
                    partition_by=["entity_type"],
                )
        else:
            if ck.done("surface_bands"):
                # this increment adds surfaces without maintaining the band
                # index; drop it so a later incremental call backfills fresh
                import shutil

                shutil.rmtree(ck.out / "surface_bands")
                ck.progress.pop("surface_bands", None)
                ck.progress_path.write_text(json.dumps(ck.progress, indent=1))
            nodes = ck.refresh_batch(
                "nodes",
                batch_id,
                lambda: canonicalize_entities(
                    spark, surfaces, max_component_size=max_component_size
                ),
                partition_by=["entity_type"],
            )
        n_ents = ck.progress.get("nodes", {}).get("rows", 0)

        if edge_counts == "exact":
            edges = ck.refresh_batch(
                "edges",
                batch_id,
                lambda: aggregate_edges(all_triples, nodes, n_entities=n_ents),
                partition_by=["pred"],
            )
        else:
            def _stats_of(triples_df: DataFrame) -> DataFrame:
                return triples_df.groupBy("pred", "obj").agg(
                    F.hll_sketch_agg("doc_id").alias("docs_hll"),
                    F.count("*").alias("n_mentions"),
                    F.collect_set("year").alias("years"),
                )

            def _merge_stats(a: DataFrame, b: DataFrame) -> DataFrame:
                return (
                    a.unionByName(b)
                    .groupBy("pred", "obj")
                    .agg(
                        F.hll_union_agg("docs_hll").alias("docs_hll"),
                        F.sum("n_mentions").cast("long").alias("n_mentions"),
                        F.array_distinct(F.flatten(F.collect_list("years"))).alias(
                            "years"
                        ),
                    )
                )

            if not ck.done("entity_stats"):
                ck.run("entity_stats", lambda: _stats_of(all_triples))
            else:
                # self-merge (old stats ⊎ delta stats): exactly-once via the
                # _BATCH token or a replay double-counts the delta's mentions
                delta_stats = _stats_of(delta_batch)
                ck.refresh_batch(
                    "entity_stats",
                    batch_id,
                    lambda: _merge_stats(ck.load("entity_stats"), delta_stats),
                )
            stats = ck.load("entity_stats")
            ent = nodes.select(
                F.col("entity_type").alias("pred"),
                F.col("name").alias("obj"),
                "canonical_id",
            )
            dict_side = F.broadcast(ent) if n_ents <= 2_000_000 else ent
            edges = ck.refresh_batch(
                "edges",
                batch_id,
                lambda: stats.join(dict_side, ["pred", "obj"])
                .groupBy("pred", "canonical_id")
                .agg(
                    F.hll_sketch_estimate(F.hll_union_agg("docs_hll")).alias(
                        "n_docs"
                    ),
                    F.sum("n_mentions").cast("long").alias("n_mentions"),
                    F.sort_array(
                        F.array_distinct(F.flatten(F.collect_list("years")))
                    ).alias("years"),
                ),
                partition_by=["pred"],
            )

        # every stage is through: journal the batch complete (a replay of this
        # exact batch is now a pure no-op) and drop its staging directory
        ck.batch_mark_complete(batch_id)

        if compact_threshold is not None:
            # refresh stages (term_df, nodes, entity_stats, edges) are
            # rewritten whole each increment — only the fast-append
            # stages accrue small-files debt
            compacted = False
            for append_stage in (
                "documents",
                "triples",
                "topics",
                "cleaned_affiliations",
                "affiliation_type_distances",
                "entity_surfaces",
                "surface_bands",
            ):
                if ck.maybe_compact(append_stage, max_files=compact_threshold):
                    compacted = True
            if compacted:
                # compaction swapped stage directories out from under any
                # DataFrame captured above — its FileIndex still lists the
                # deleted pre-compaction files and the next action dies
                # with FileNotFoundException.  Rebuild the returned frame
                # from fresh post-swap listings.
                if ck.done("topics"):
                    all_triples = ck.load("triples").unionByName(
                        ck.load("topics")
                    )
                else:
                    all_triples = ck.load("triples")

    out = {
        "documents": ck.load("documents"),
        "triples": all_triples,
        "nodes": nodes,
        "edges": edges,
    }
    if with_affiliations:
        out["cleaned_affiliations"] = ck.load("cleaned_affiliations")
        out["affiliation_type_distances"] = ck.load(
            "affiliation_type_distances"
        )
    return out
