"""One-off diagnostic: why is the topics stage scale-flat? (round-2)

Times each sub-plan of the topics stage at two core counts on the same
materialized documents table.  Usage: python tools/profile_topics.py [n_docs]
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
from convei_abstract_relational_knowledge_explorer_spark.operators.extract import extract_documents
from convei_abstract_relational_knowledge_explorer_spark.operators import topics as T
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import web_pages
import pyspark.sql.functions as F

cpus = {cpus}
n_docs = {n_docs}
local_dir = tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8),
                  app_name=f"prof-{{cpus}}",
                  extra_conf={{"spark.local.dir": local_dir}})

out = tempfile.mkdtemp(prefix="prof_docs_", dir="/dev/shm")
extract_documents(web_pages(spark, n_docs)).write.mode("overwrite").partitionBy("year").parquet(out)
docs = spark.read.parquet(out)
docs.count()  # warm

timings = {{}}
def clock(name, df):
    t0 = time.time()
    n = df.count()
    timings[name] = (round(time.time() - t0, 2), n)

scan_parts = docs.rdd.getNumPartitions()

clock("candidates", T.candidate_phrases(docs, prefiltered=True))
filtered = T.candidate_phrases(docs, prefiltered=True).filter(F.length("phrase") >= 3)
tf = filtered.groupBy("doc_id", "phrase").agg(F.count("*").alias("tf"))
clock("tf", tf)
dfc = tf.groupBy("phrase").agg(F.count("*").alias("df"))
clock("df_counts", dfc)
clock("mine_topics_full", T.mine_topics(docs, n_docs=n_docs))

print("RESULT " + json.dumps({{"cpus": cpus, "scan_parts": scan_parts,
                               "timings": timings}}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    for cpus in (4, 16):
        code = CHILD.format(repo=str(REPO), cpus=cpus, n_docs=n_docs)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line)
                break
        else:
            print(proc.stdout[-1500:], proc.stderr[-1500:])


if __name__ == "__main__":
    main()
