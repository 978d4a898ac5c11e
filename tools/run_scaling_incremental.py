"""Scaling evidence for the incremental-update path (round 4).

Same protocol as tools/run_scaling.py (north_rule: efficiency >= 0.8
from N to 4N cores, evidenced at two parallelism levels on identical
input): a FRESH subprocess per (cores, trial), sequential, fresh JVM.
Each child builds the base graph once (untimed), then times
``incremental_update`` folding a +10% batch of new pages through the
at-scale path (frozen-idf topics, HLL sketch edges).  The timed region
is exactly the work a monthly crawl increment pays.

Appends a round-4 section to BENCH/BASELINE.md (the r3 document is
curated history — never overwritten) and writes the raw trials to
BENCH/scaling_incremental.json.

Usage: python tools/run_scaling_incremental.py [n_docs] [trials]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, json, tempfile, time
sys.path.insert(0, {repo!r})
from convei_abstract_relational_knowledge_explorer_spark.session import get_spark
from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
    build_graph, incremental_update,
)
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import web_pages

cpus = {cpus}
n_docs = {n_docs}
n_incr = max(n_docs // 10, 1)
local_dir = tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus * 3,
                  app_name=f"scaling-incr-{{cpus}}",
                  extra_conf={{"spark.local.dir": local_dir}})
# warmup: Python workers + JIT before any clock starts (both configs
# get the same warmup; cluster startup is not steady-state throughput)
warm = tempfile.mkdtemp(prefix="warm_", dir="/dev/shm")
build_graph(spark, web_pages(spark, 2000), warm, triples_granularity="none")

out = tempfile.mkdtemp(prefix="scaling_incr_", dir="/dev/shm")
t_base0 = time.time()
build_graph(spark, web_pages(spark, n_docs), out,
            triples_granularity="none")
base_seconds = time.time() - t_base0

t0 = time.time()
tables = incremental_update(
    spark, out, web_pages(spark, n_docs + n_incr),
    topics_mode="frozen_idf", edge_counts="sketch",
)
n_triples = tables["triples"].count()
seconds = time.time() - t0

print("RESULT " + json.dumps({{
    "cpus": cpus, "n_docs": n_docs, "n_incr": n_incr,
    "base_seconds": round(base_seconds, 2),
    "incr_seconds": round(seconds, 2),
    "incr_docs_per_hour": round(n_incr / seconds * 3600, 1),
    "n_triples": n_triples,
}}))
spark.stop()
import shutil
for d in (local_dir, warm, out):
    shutil.rmtree(d, ignore_errors=True)
"""


def run_one(cpus: int, n_docs: int) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, n_docs=n_docs)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child failed (cpus={cpus}):\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


CORE_PAIR = (4, 16)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    results: dict[int, list[dict]] = {n: [] for n in CORE_PAIR}
    for _trial in range(trials):
        for cpus in CORE_PAIR:
            res = run_one(cpus, n_docs)
            results[cpus].append(res)
            print(json.dumps(res))

    best = {
        c: max(r["incr_docs_per_hour"] for r in rs)
        for c, rs in results.items()
    }
    n_small, n_big = CORE_PAIR
    eff = (best[n_big] / best[n_small]) / (n_big / n_small)
    consistent = len({r["n_triples"] for rs in results.values() for r in rs})

    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    (out_dir / "scaling_incremental.json").write_text(
        json.dumps(
            {
                "n_docs": n_docs,
                "trials": trials,
                "results": results,
                "efficiency": round(eff, 3),
            },
            indent=1,
        )
    )

    lines = [
        "",
        f"## Round 4: incremental-update scaling (local[{n_small}] vs"
        f" local[{n_big}])",
        "",
        f"`incremental_update` folding n/10 = {n_docs // 10:,} new docs"
        f" into an existing {n_docs:,}-doc graph (frozen-idf topics, HLL"
        " sketch edges — the at-scale path), fresh JVM per run,"
        " sequential, base build untimed.",
        "",
        "| cores | trial | incr wall s | incr docs/hour | n_triples |",
        "|---|---|---|---|---|",
    ]
    for cpus in CORE_PAIR:
        for i, r in enumerate(results[cpus]):
            lines.append(
                f"| local[{cpus}] | {i + 1} | {r['incr_seconds']} |"
                f" {r['incr_docs_per_hour']:,} | {r['n_triples']:,} |"
            )
    lines += [
        "",
        f"**Incremental scaling efficiency (N={n_small} → 4N={n_big},"
        f" best-of-{trials}):**",
        f"({best[n_big]:,.0f} / {best[n_small]:,.0f}) / 4 = **{eff:.3f}**",
        "",
        f"n_triples {'byte-identical' if consistent == 1 else 'DIFFER'}"
        " across every (cores, trial) leg.",
        "",
    ]
    with (out_dir / "BASELINE.md").open("a") as f:
        f.write("\n".join(lines))
    print(
        f"\nincremental efficiency={eff:.3f}"
        f"  -> appended to {out_dir / 'BASELINE.md'}"
    )


if __name__ == "__main__":
    main()
