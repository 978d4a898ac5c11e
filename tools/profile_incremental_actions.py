"""Action-level profile of the steady-state increment's driver time.

tools/profile_incremental.py showed ~8.5 s of the timed increment
(local[8], 100k delta into 300k corpus) is spent OUTSIDE the
checkpointer's recorded stages.  This sibling attributes every
driver-blocking call — DataFrame.count / .first / .localCheckpoint and
DataFrameWriter.parquet/save — to its repo-side caller (file:line) by
monkeypatching those entry points around the timed increment only.
Product code is untouched.

Usage: python tools/profile_incremental_actions.py [cpus] [n_docs] [n_incr]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, json, tempfile, time, traceback
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
                  app_name=f"profile-incr-actions-{{cpus}}",
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

# ---- monkeypatch driver-blocking entry points --------------------------
# PySpark 4: pyspark.sql.DataFrame is the abstract facade; the concrete
# class (whose methods actually run) is pyspark.sql.classic.dataframe.
from pyspark.sql.classic.dataframe import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

calls = []

def _caller():
    # innermost repo frame that is not this script
    for f in reversed(traceback.extract_stack()[:-2]):
        if {repo!r} in f.filename and "profile" not in f.filename:
            return f"{{f.filename.split('/')[-1]}}:{{f.lineno}}"
    return "?"

def _wrap(cls, name):
    orig = getattr(cls, name)
    def timed(self, *a, **kw):
        t0 = time.time()
        r = orig(self, *a, **kw)
        calls.append((name, round(time.time() - t0, 3), _caller()))
        return r
    setattr(cls, name, timed)
    return orig

origs = [(DataFrame, n, _wrap(DataFrame, n))
         for n in ("count", "first", "localCheckpoint", "collect")]
origs += [(DataFrameWriter, n, _wrap(DataFrameWriter, n))
          for n in ("parquet", "save", "csv", "json")]

t0 = time.time()
incremental_update(spark, out, spark.read.parquet(crawl2),
                   topics_mode="frozen_idf", edge_counts="sketch")
seconds = time.time() - t0
for cls, n, orig in origs:
    setattr(cls, n, orig)

total_blocked = sum(c[1] for c in calls)
print("RESULT " + json.dumps({{
    "cpus": cpus, "incr_seconds": round(seconds, 2),
    "blocked_seconds": round(total_blocked, 2),
    "gap_seconds": round(seconds - total_blocked, 2),
    "calls": [c for c in calls if c[1] >= 0.05],
    "n_calls": len(calls),
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
            print(json.dumps(json.loads(line[len("RESULT "):]), indent=1))
            return
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
    sys.exit(1)


if __name__ == "__main__":
    main()
