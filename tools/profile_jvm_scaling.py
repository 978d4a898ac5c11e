"""Diagnostic: which JVM workload class fails to scale 4->16 on this host?

Isolates: pure-CPU hashing (no alloc), parquet scan + regex tokenize,
n-gram explode (alloc-heavy).  Usage: python tools/profile_jvm_scaling.py
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
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import web_pages
import pyspark.sql.functions as F

cpus = {cpus}
local_dir = tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8),
                  app_name=f"jvmprof-{{cpus}}",
                  extra_conf={{"spark.local.dir": local_dir}})

out = tempfile.mkdtemp(prefix="prof_docs_", dir="/dev/shm")
extract_documents(web_pages(spark, 200_000)).write.mode("overwrite").partitionBy("year").parquet(out)
docs = spark.read.parquet(out)
docs.count()

timings = {{}}
def clock(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 2)

# 1. pure CPU, no alloc: iterated xxhash64 over a range
n = 40_000_000
clock("hash_cpu", lambda: spark.range(n, numPartitions=cpus * 4).select(
    F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64("id")))))
    .alias("h")).agg(F.expr("bit_xor(h)")).collect())

# 2. parquet scan + regex tokenize only
tok = "regexp_extract_all(lower(text), '[a-z0-9]+(?:-[a-z0-9]+)*', 0)"
clock("scan_regex", lambda: docs.select(
    F.expr("size(" + tok + ")").alias("n")).agg(F.sum("n")).collect())

# 3. n-gram explode + count (alloc heavy, no shuffle of note)
from convei_abstract_relational_knowledge_explorer_spark.operators import topics as T
clock("ngram_explode", lambda: T.candidate_phrases(docs, prefiltered=True).count())

# 4. same but WITHOUT the mask prefilters (isolate array_contains cost)
clock("ngram_nofilter", lambda: T.candidate_phrases(docs, prefiltered=False).count())

# 5. prefiltered variant with IN-list (InSet hash) masks instead of
#    array_contains(literal array)
from convei_abstract_relational_knowledge_explorer_spark.functions import _dictdata as D
def inset(vals):
    return "(" + ", ".join("'" + v + "'" for v in sorted(vals)) + ")"
def candidates_inset():
    base = docs.select("doc_id", T.tokens_col("abstract").alias("toks"))
    base = base.select(
        "doc_id", "toks",
        F.expr("transform(toks, t -> t in " + inset(D.STOPWORDS) + ")").alias("m_stop"),
        F.expr("transform(toks, t -> t in " + inset(D.BAD_START) + ")").alias("m_bs"),
        F.expr("transform(toks, t -> t in " + inset(D.BAD_VERB) + ")").alias("m_bv"),
        F.expr("transform(toks, t -> t in " + inset(D.TRUNC_HEADS) + ")").alias("m_tr"),
    )
    grams = []
    for n in (1, 2, 3):
        keep = ("not exists(slice(m_stop, i, {{n}}), x -> x)"
                " and not m_bs[i - 1]"
                " and not m_bv[i + {{n0}}]"
                " and not m_tr[i + {{n0}}]").format(n=n, n0=n-2)
        expr = ("transform(filter(sequence(1, greatest(size(toks) - {{n0}}, 0)), i -> {{keep}}),"
                " i -> concat_ws(' ', slice(toks, i, {{n}})))").format(n=n, n0=n-1, keep=keep)
        grams.append(F.expr(expr).alias("g{{}}".format(n)))
    return base.select("doc_id", F.explode(F.flatten(F.array(*grams))).alias("phrase")).filter(F.col("phrase") != "")
clock("ngram_inset", lambda: candidates_inset().count())

print("RESULT " + json.dumps({{"cpus": cpus, "timings": timings}}))
spark.stop()
"""


def main() -> None:
    for cpus in (4, 16):
        code = CHILD.format(repo=str(REPO), cpus=cpus)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        hit = False
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line)
                hit = True
        if not hit:
            print(proc.stdout[-1500:], proc.stderr[-1500:])


if __name__ == "__main__":
    main()
