"""Partition sizing for expensive-per-row Python stages.

AQE's partition coalescing is BYTE-based (64 MB advisory target).  A
distinct-text exchange feeding a heavy Arrow kernel (the affiliation
linking cascade is ~100-500 µs/row; the texts are ~60 bytes/row) gets
coalesced to one or two partitions long before the byte target is
reached — and the Python stage then runs nearly serially no matter how
many cores the job has.  The trap is scale-independent: at 10^9 distinct
texts a 64 MB partition still holds ~10^6 rows ≈ minutes of Python per
task, so byte-sized partitions are the wrong unit whenever per-ROW cost
dominates per-byte cost.

Empirical note (Spark 4.1, measured in tests/test_plans.py): a HASH
``repartition(n, col)`` placed under ``mapInPandas`` is still coalesced
by AQE (the rdd lineage and the executed stage both collapse to 1-2
partitions), while a round-robin ``repartition(n)`` and a
``repartitionByRange(n, col)`` keep their explicit count.  We therefore
pin ROUND-ROBIN: it needs no sampling job, is perfectly balanced even
on skewed key multiplicities, and key-locality is worthless to a per-row
kernel (the join back to the fact rows reshuffles regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_python(df: DataFrame, per_core: int = 3) -> DataFrame:
    """Round-robin-repartition ``df`` to ``per_core x defaultParallelism``
    partitions so a following Arrow kernel saturates the executors even
    when the rows are tiny in bytes.

    Call it on the (small) DISTINCT side, after the dedupe: the distinct
    keeps its map-side partial aggregation and only the deduped rows pay
    the extra exchange.  ``per_core = 3`` gives enough waves to smooth
    per-partition cost skew without drowning small jobs in task overhead.
    """
    spark = df.sparkSession
    n = max(2, spark.sparkContext.defaultParallelism * per_core)
    return df.repartition(n)


def ensure_parallel_scan(df: DataFrame, per_core: int = 3) -> DataFrame:
    """Round-robin-repartition ``df`` ONLY when its physical scan yields
    fewer splits than the session has cores.

    The other trap feeding a heavy Arrow kernel: parquet splits are
    sized by ``spark.sql.files.maxPartitionBytes`` (128 MB), so a small
    delta table — an increment's staged 100k-document batch is one
    ~64 MB file — scans as ONE split and the per-document kernel runs
    serially, while the same kernel over a multi-GB corpus stage gets
    plenty of splits and must NOT pay an extra full-table shuffle of
    KB-sized rows.  ``df.rdd.getNumPartitions()`` compiles the physical
    plan without running a job; when the input is already wider than the
    core count the frame is returned untouched.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(max(2, cores * per_core))
