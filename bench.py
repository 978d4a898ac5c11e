"""Benchmark harness — headline queries + KG pipeline throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines:
  line 1 (full):    {"metric": ..., "queries": {all 185}, "pipeline": ...}
  last line (compact, <2 KB so a tail capture stays parseable):
                    {"metric": ..., "queries": {20 slowest}, ...}
The full line is also written to BENCH/bench_last_full.json.

Extra keys (informational): docs_per_hour for the end-to-end KG pipeline
over a synthetic web_pages corpus, per-query seconds.

Scaling evidence (north_rule): run `python bench.py --scaling` to execute
the same pipeline at local[8] and local[32] and report throughput at both
plus efficiency; results land in BENCH/BASELINE.md via tools/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
# optional best-of-N per query (r03 VERDICT #7: the driver snapshot has
# repeatedly shown 25-40% phantom regressions from host throttle windows;
# SPARK_GRAFT_BENCH_TRIALS=2 keeps the min per query, discarding one-off
# window hits).  The DEFAULT is a single trial — the driver's wall-clock
# budget rules here, so throttle forensics rely on `calib_seconds` plus
# the recorded clean-window rerun in BENCH/, which stays the cross-round
# comparison surface.
N_TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "1"))


def _calibrate() -> float:
    """Fixed single-thread CPU burn (seconds) — a host-window indicator.

    The VM's effective CPU speed swings ±20-40% between runs (observed in
    r01-r03).  Recording the SAME pure-python burn alongside the bench
    lets any reader normalize: a high calib value marks a throttled
    window, so slow query timings in that snapshot are host noise, not
    regressions.  ~0.4s on a clean window."""
    t0 = time.time()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    _ = acc
    return round(time.time() - t0, 3)


def _build_spark(cpus: int):
    from convei_abstract_relational_knowledge_explorer_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name=f"convei-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best = None
        for _trial in range(max(N_TRIALS, 1)):
            start = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            elapsed = time.time() - start
            best = elapsed if best is None else min(best, elapsed)
            _ = n
        timings[name] = round(best, 3)
    return timings


def _max_job_id(spark) -> int:
    """Highest jobId in the AppStatusStore (window marker), -1 if none."""
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    mx = -1
    for i in range(jobs.size()):
        mx = max(mx, jobs.apply(i).jobId())
    return mx


def _task_time_by_group(spark, min_job_exclusive: int) -> dict[str, int]:
    """Executor task-time (ms) per jobGroup for jobs AFTER the marker.

    Sound decomposition under the FAIR-pool concurrent chains (r4
    VERDICT "what's wrong" #1): wall-span subtraction double-credits
    overlapped chains, but executor task-time is additive — each stage
    is attributed exactly once (to its earliest submitting job; skipped
    stages have no attempt and no task time, their work was counted at
    the original attempt).  Jobs without a group tag land in
    "ungrouped" (documents scan, nodes/edges downstream)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() <= min_job_exclusive:
            continue
        grp = j.jobGroup()
        g = grp.get() if grp.isDefined() else "ungrouped"
        sids = j.stageIds()
        rows.append(
            (j.jobId(), g, [sids.apply(k) for k in range(sids.size())])
        )
    seen: set[int] = set()
    out: dict[str, int] = {}
    for _jid, g, sids in sorted(rows):
        for sid in sids:
            if sid in seen:
                continue
            seen.add(sid)
            try:
                ms = store.lastStageAttempt(sid).executorRunTime()
            except Exception:
                continue
            out[g] = out.get(g, 0) + ms
    return out


def run_pipeline(spark, n_docs: int) -> dict[str, float]:
    """End-to-end KG build on a generated corpus; returns docs/hour."""
    import os
    import shutil
    import tempfile

    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        build_graph,
        incremental_update,
    )
    from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
        web_pages,
    )

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix="convei_bench_", dir=tmp_root)
    try:
        pages = web_pages(spark, n_docs)
        job_marker = _max_job_id(spark)
        start = time.time()
        tables = build_graph(spark, pages, out, with_topics=True)
        n_triples = tables["triples"].count()
        seconds = time.time() - start
        # cost of the r02-added affiliation stages recorded separately so
        # docs/hour trends stay comparable across rounds (VERDICT r02 #9).
        # r5 (r4 VERDICT #1): the chains run CONCURRENTLY in FAIR pools,
        # so the affiliation share comes from additive executor
        # TASK-TIME per job group, not wall-span subtraction — core
        # wall-equivalent = total wall x core task-time fraction, and
        # the decomposition sums to exactly the total by construction.
        chain_ms = _task_time_by_group(spark, job_marker)
        affil_ms = chain_ms.get("build-affiliations", 0)
        total_ms = sum(chain_ms.values())
        core_frac = 1.0 - (affil_ms / total_ms) if total_ms > 0 else 1.0
        core = seconds * core_frac
        # ledger wall-SPAN of the affiliation stages (overlapped with
        # sibling chains — informational only, NOT a subtractable cost)
        metrics = json.loads(
            (__import__("pathlib").Path(out) / "_metrics.json").read_text()
        )
        affil_span_seconds = sum(
            m["seconds"]
            for m in metrics
            if m["stage"]
            in ("cleaned_affiliations", "affiliation_type_distances")
        )

        # incremental increment: +10% new pages folded into the finished
        # graph via the at-scale path (frozen-idf topics, HLL sketch
        # edges).  The headline is incr_docs_per_hour vs docs_per_hour —
        # the monthly-crawl cost a user actually pays after the first
        # build (plans/pipeline.py::incremental_update).
        # crawl drops arrive as files: feed the increment a parquet-backed
        # DataFrame (written untimed) so the batch-id scan and the url
        # anti-join probe get real column pruning — the mapInPandas
        # synthetic source can't prune, and feeding it directly would
        # bill the increment for regenerating every page's html
        n_incr = max(n_docs // 10, 1)
        crawl_dir = os.path.join(out, "_crawl")  # cleaned with `out`
        web_pages(spark, n_docs + n_incr).write.mode("overwrite").parquet(
            crawl_dir
        )
        istart = time.time()
        itables = incremental_update(
            spark,
            out,
            spark.read.parquet(crawl_dir),
            topics_mode="frozen_idf",
            edge_counts="sketch",
        )
        n_triples_incr = itables["triples"].count()
        iseconds = time.time() - istart
        return {
            "pipeline_seconds": round(seconds, 3),
            "pipeline_seconds_core": round(core, 3),
            "affiliation_stage_span_seconds": round(affil_span_seconds, 3),
            "chain_task_time_ms": {k: int(v) for k, v in chain_ms.items()},
            "affiliation_task_time_frac_milli": (
                int(1000 * affil_ms / total_ms) if total_ms > 0 else 0
            ),
            "docs_per_hour": round(n_docs / seconds * 3600.0, 1),
            "docs_per_hour_core": round(n_docs / core * 3600.0, 1),
            "n_triples": n_triples,
            "incremental_seconds": round(iseconds, 3),
            "incremental_docs": n_incr,
            "incr_docs_per_hour": round(n_incr / iseconds * 3600.0, 1),
            "incr_n_triples": n_triples_incr,
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else 0.001)

    if "--scaling" in sys.argv:
        # delegate to the fresh-subprocess harness (tools/run_scaling.py)
        # so JVM state never leaks between the two parallelism levels
        import subprocess

        subprocess.run(
            [sys.executable, "tools/run_scaling.py", str(N_BENCH_DOCS), "1"],
            check=True,
        )
        return

    calib_before = _calibrate()
    spark = _build_spark(cpus)
    t0 = time.time()
    timings = run_queries(spark, sf_dir)
    pipe = run_pipeline(spark, N_BENCH_DOCS)
    total = round(time.time() - t0, 3)
    calib_after = _calibrate()
    full = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline": pipe,
        # host-window indicator: the same fixed single-thread burn
        # before/after (clean window ~0.4s; throttled 0.6-1.0s+).
        # Compare query timings across rounds ONLY at similar
        # calib values — see BENCH/ clean-window references.
        "calib_seconds": [calib_before, calib_after],
        "trials": max(N_TRIALS, 1),
    }
    # FIRST line: the full per-query JSON (r4 VERDICT #7) — and a durable
    # copy in BENCH/ for the cross-round record.
    print(json.dumps(full))
    try:
        import pathlib

        bench_dir = pathlib.Path(__file__).resolve().parent / "BENCH"
        bench_dir.mkdir(exist_ok=True)
        (bench_dir / "bench_last_full.json").write_text(json.dumps(full))
    except OSError:
        pass
    # LAST line: a compact summary guaranteed to fit the driver's 2000-char
    # tail buffer (the 185-query map is ~7 KB, which front-truncated the
    # r4 tail mid-JSON): top-20 slowest queries + pipeline headline.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:20]
    )
    compact = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries_total_seconds": round(sum(timings.values()), 3),
        "queries": slowest,
        "pipeline": {
            k: pipe[k]
            for k in (
                "pipeline_seconds",
                "pipeline_seconds_core",
                "docs_per_hour",
                "docs_per_hour_core",
                "n_triples",
                "incr_docs_per_hour",
            )
            if k in pipe
        },
        "calib_seconds": [calib_before, calib_after],
        "trials": max(N_TRIALS, 1),
        "queries_full": "line 1 of stdout; BENCH/bench_last_full.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # belt-and-braces: shrink below the tail buffer
        compact["queries"] = dict(list(slowest.items())[:8])
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
