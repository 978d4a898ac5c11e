"""Round-6 optimization measurement harness (bench.py stays frozen).

Times individual declared queries in isolation with the same methodology
as bench.py (df.count()), plus:
  - optional noop-sink timing (guide §1.4) to include full-row compute
  - per-query Spark job/stage counts + executor task-time from the
    status store (how much of the wall is scheduling overhead)
  - .explain("formatted") capture to plans/r06/<query>_<tag>.txt

Usage:
  python bench_extra.py q184 q189            # time matching queries
  python bench_extra.py --plans --tag before q184   # also dump plans
  python bench_extra.py --all                # whole suite once, sorted
  python bench_extra.py --repeat 3 q186      # best-of-3
"""

from __future__ import annotations

import json
import os
import sys
import time


def _build_spark():
    from convei_abstract_relational_knowledge_explorer_spark.session import (
        get_spark,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name="convei-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def _job_stats(spark, min_job_exclusive: int) -> dict:
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    n_jobs = 0
    stage_ids = set()
    task_ms = 0
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() <= min_job_exclusive:
            continue
        n_jobs += 1
        sids = j.stageIds()
        for k in range(sids.size()):
            stage_ids.add(sids.apply(k))
    for sid in stage_ids:
        try:
            task_ms += store.lastStageAttempt(sid).executorRunTime()
        except Exception:
            pass
    return {"jobs": n_jobs, "stages": len(stage_ids), "task_ms": int(task_ms)}


def _max_job_id(spark) -> int:
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    mx = -1
    for i in range(jobs.size()):
        mx = max(mx, jobs.apply(i).jobId())
    return mx


def main() -> None:
    args = [a for a in sys.argv[1:]]
    do_plans = "--plans" in args
    do_noop = "--noop" in args
    do_all = "--all" in args
    tag = "before"
    if "--tag" in args:
        tag = args[args.index("--tag") + 1]
    repeat = 1
    if "--repeat" in args:
        repeat = int(args[args.index("--repeat") + 1])
    pats = [
        a
        for a in args
        if not a.startswith("--") and a != tag and not a.isdigit()
    ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if do_all:
        names = list(qs)
    else:
        names = [n for n in qs if any(p in n for p in pats)]
    if not names:
        print("no queries match", pats)
        return

    spark = _build_spark()
    # one untimed warm-up action so JVM/codegen warm-up is not billed to
    # the first measured query (VERDICT r5 "what's wrong" #3)
    spark.range(1000).selectExpr("sum(id)").collect()
    _t(spark, sf_dir)

    results = {}
    for name in names:
        fn = qs[name]
        best = None
        stats = None
        for _ in range(repeat):
            marker = _max_job_id(spark)
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            if do_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            el = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            s = _job_stats(spark, marker)
            if best is None or el < best:
                best = el
                stats = s
        results[name] = {
            "sec": round(best, 3),
            **stats,
        }
        if do_plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{tag}.txt", "w") as fh:
                fh.write(plan)
        print(json.dumps({name: results[name]}), flush=True)

    total = round(sum(r["sec"] for r in results.values()), 3)
    print(json.dumps({"total_sec": total, "n": len(results)}))
    spark.stop()


def _t(spark, sf_dir):
    # warm the parquet footers/metadata of every table once (untimed)
    import glob

    for p in glob.glob(f"{sf_dir}/*.parquet"):
        spark.read.parquet(p).limit(1).count()


if __name__ == "__main__":
    main()
