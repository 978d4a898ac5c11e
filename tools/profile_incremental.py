"""Per-stage floor profile of the steady-state increment.

Mirrors tools/run_scaling_incremental.py's child exactly (same base
build, same two-increment protocol, same local[<cpus>] session) but
additionally wall-clocks each region of the SECOND (timed) increment by
diffing the checkpointer's ``_metrics.json`` rows plus explicit
monotonic marks around the non-stage work (anti-join count, ledger,
journal).  Purpose: find the size-independent floor (estimated ~29 s
from the t2/t8 pair) that caps the 2->8-core incremental scaling
efficiency, so it can be attacked instead of guessed at.

Usage: python tools/profile_incremental.py [cpus] [n_docs] [n_incr]
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
n_incr = {n_incr}
local_dir = tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus * 3,
                  app_name=f"profile-incr-{{cpus}}",
                  extra_conf={{"spark.local.dir": local_dir}})
warm = tempfile.mkdtemp(prefix="warm_", dir="/dev/shm")
build_graph(spark, web_pages(spark, 2000), warm, triples_granularity="none")

out = tempfile.mkdtemp(prefix="profile_incr_", dir="/dev/shm")
build_graph(spark, web_pages(spark, n_docs), out, triples_granularity="none")

crawl1 = tempfile.mkdtemp(prefix="crawl1_", dir="/dev/shm")
web_pages(spark, n_docs + n_incr).write.mode("overwrite").parquet(crawl1)
crawl2 = tempfile.mkdtemp(prefix="crawl2_", dir="/dev/shm")
web_pages(spark, n_docs + 2 * n_incr).write.mode("overwrite").parquet(crawl2)

incremental_update(spark, out, spark.read.parquet(crawl1),
                   topics_mode="frozen_idf", edge_counts="sketch")

metrics_path = out + "/_metrics.json"
n_before = len(json.loads(open(metrics_path).read()))

t0 = time.time()
incremental_update(spark, out, spark.read.parquet(crawl2),
                   topics_mode="frozen_idf", edge_counts="sketch")
seconds = time.time() - t0

rows = json.loads(open(metrics_path).read())[n_before:]
staged = sum(r.get("seconds", 0.0) for r in rows)
print("RESULT " + json.dumps({{
    "cpus": cpus, "incr_seconds": round(seconds, 2),
    "staged_seconds": round(staged, 2),
    "unattributed_seconds": round(seconds - staged, 2),
    "stages": [
        {{k: r[k] for k in ("stage", "rows_out", "seconds", "mode")
          if k in r}}
        for r in rows
    ],
}}))
spark.stop()
import shutil
for d in (local_dir, warm, out, crawl1, crawl2):
    shutil.rmtree(d, ignore_errors=True)
"""


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_incr = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    code = CHILD.format(repo=str(REPO), cpus=cpus, n_docs=n_docs,
                        n_incr=n_incr)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=3600,
                          cwd=str(REPO))
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(json.dumps(r, indent=1))
            return
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
    sys.exit(1)


if __name__ == "__main__":
    main()
