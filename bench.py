"""Benchmark harness — headline queries + KG pipeline throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

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
        start = time.time()
        tables = build_graph(spark, pages, out, with_topics=True)
        n_triples = tables["triples"].count()
        seconds = time.time() - start
        # cost of the r02-added affiliation stages recorded separately so
        # docs/hour trends stay comparable across rounds (VERDICT r02 #9)
        metrics = json.loads(
            (__import__("pathlib").Path(out) / "_metrics.json").read_text()
        )
        affil_seconds = sum(
            m["seconds"]
            for m in metrics
            if m["stage"]
            in ("cleaned_affiliations", "affiliation_type_distances")
        )
        core = seconds - affil_seconds

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
            "affiliation_stage_seconds": round(affil_seconds, 3),
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
    print(
        json.dumps(
            {
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
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
