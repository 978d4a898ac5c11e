"""Idempotent sinks — the Spark analogs of the reference's upsert family.

Reference semantics → sandbox (parquet) implementation; on a real cluster
these become Iceberg ``MERGE INTO`` statements (noted per function):

  A5  INSERT OR IGNORE            → insert_if_absent (anti-join + append)
      (/root/reference/file_scanner.py:151-156)
  A6  upsert-if-missing dims      → same, keyed on the natural key
      (/root/reference/insert_simple_data.py:15-21)
  A7  ON CONFLICT DO UPDATE       → upsert (full-outer coalesce overwrite)
      (/root/reference/populate_author_affiliation_type_distances.py:186-199)
  A8  UPDATE WHERE col IS NULL    → fill_missing (guarded backfill)
      (/root/reference/embed_entries.py:93-101)
  A10/A11 CSV/JSONL report sinks  → write_report
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _exists(path: str) -> bool:
    return (Path(path) / "_SUCCESS").exists()


def _in_parts(col, parts):
    """Null-safe partition membership: ``col IN parts`` where ``parts`` may
    contain ``None`` and ``col`` may be NULL.

    Plain ``isin`` evaluates to NULL (never True, never False) on a NULL
    column value, so both ``isin(...)`` and ``~isin(...)`` silently drop
    the NULL partition — a key that moved INTO or OUT OF the NULL
    partition would keep a stale row.  Here NULL membership is explicit
    and the result is coalesced to a real boolean, so negation works.
    ``p IN (...) OR p IS NULL`` stays partition-prunable.
    """
    non_null = [p for p in parts if p is not None]
    cond = col.isin(non_null) if non_null else F.lit(False)
    if any(p is None for p in parts):
        cond = cond | col.isNull()
    return F.coalesce(cond, F.lit(False))


def insert_if_absent(
    spark: SparkSession, new_rows: DataFrame, path: str, keys: list[str]
) -> int:
    """A5/A6: append only rows whose key is not already present.

    Iceberg form: MERGE INTO t USING s ON keys WHEN NOT MATCHED THEN INSERT.
    Sandbox form: left-anti against the existing table, then append.
    Returns the number of rows inserted.  Re-running with the same input is
    a no-op (the reference's OR IGNORE semantics).
    """
    fresh = new_rows.dropDuplicates(keys)
    if _exists(path):
        existing = spark.read.parquet(path)
        fresh = fresh.join(existing.select(*keys), keys, "left_anti")
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(path)
        return n
    n = fresh.count()
    fresh.write.mode("overwrite").parquet(path)
    return n


def upsert(
    spark: SparkSession, new_rows: DataFrame, path: str, keys: list[str]
) -> None:
    """A7: new rows win on key collision; unmatched old rows survive.

    Iceberg form: MERGE ... WHEN MATCHED THEN UPDATE SET ... WHEN NOT
    MATCHED THEN INSERT.  Sandbox form: old anti-join new, union, rewrite.
    """
    fresh = new_rows.dropDuplicates(keys)
    if _exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(fresh.select(*keys), keys, "left_anti")
        merged = keep.unionByName(fresh)
    else:
        merged = fresh
    # rewrite through a temp dir (can't overwrite a path being read)
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)


def upsert_partitioned(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    sweep_moved_keys: bool = False,
) -> None:
    """A7 at scale: merge + rewrite ONLY the partitions new rows touch.

    The plain :func:`upsert` rewrites the whole table — fine for dims,
    wrong for a 100 TB fact table.  Here the anti-join reads just the
    touched partitions (partition-pruned scan) and Spark's dynamic
    partition overwrite replaces just those directories — the physical
    effect of an Iceberg ``MERGE INTO`` on a partitioned table: untouched
    partitions are never read or rewritten.

    INVARIANT (default ``sweep_moved_keys=False``): a key's
    ``partition_col`` value never changes — the standard fact-table
    contract; a key that DID move partitions would leave its stale row in
    the old partition.  Callers whose keys can move (e.g. a corrected
    document year) pass ``sweep_moved_keys=True``: one extra column-pruned
    scan of (keys, partition_col) finds stale rows in untouched
    partitions and adds those partitions to the rewrite set, so the merge
    deletes them — matching full Iceberg MERGE semantics at the cost of a
    key-column table scan.
    """
    fresh = new_rows.dropDuplicates(keys)
    if not _exists(path):
        fresh.write.partitionBy(partition_col).mode("overwrite").parquet(path)
        return
    touched = [
        r[0] for r in fresh.select(partition_col).distinct().collect()
    ]
    if sweep_moved_keys:
        stale_parts = (
            spark.read.parquet(path)
            .select(*keys, partition_col)
            .filter(~_in_parts(F.col(partition_col), touched))
            .join(fresh.select(*keys), keys, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        )
        # None-safe deterministic order (None sorts first); plain sorted()
        # raises TypeError the moment a NULL partition value appears
        touched = sorted(
            set(touched) | {r[0] for r in stale_parts},
            key=lambda v: (v is not None, str(v)),
        )
    existing = spark.read.parquet(path).filter(
        _in_parts(F.col(partition_col), touched)
    )
    keep = existing.join(fresh.select(*keys), keys, "left_anti")
    # materialize before overwriting the directories being read
    merged = keep.unionByName(fresh.select(*existing.columns)).localCheckpoint(
        eager=True
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    if sweep_moved_keys:
        # dynamic overwrite only rewrites partitions PRESENT in the output;
        # a swept partition whose every row moved away ends up empty and
        # must be dropped explicitly (Iceberg MERGE deletes handle this
        # natively on a real cluster)
        import shutil
        from urllib.parse import unquote

        present = {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        # Spark escapes special chars in partition dir names (%XX, and
        # NULL -> the Hive default sentinel) — resolve emptied values by
        # LISTING the actual directories and unescaping, never by
        # re-deriving the path from the raw value
        emptied = {
            "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
            for v in set(touched) - present
        }
        prefix = f"{partition_col}="
        for d in Path(path).iterdir():
            if (
                d.is_dir()
                and d.name.startswith(prefix)
                and unquote(d.name[len(prefix):]) in emptied
            ):
                shutil.rmtree(d, ignore_errors=True)


def fill_missing(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    value_col: str,
) -> None:
    """A8: set value_col from updates ONLY where the stored value is NULL.

    Iceberg form: MERGE ... WHEN MATCHED AND t.col IS NULL THEN UPDATE.
    """
    existing = spark.read.parquet(path)
    upd = updates.select(
        *keys, F.col(value_col).alias("__new_value")
    ).dropDuplicates(keys)
    merged = existing.join(upd, keys, "left").select(
        *[c for c in existing.columns if c != value_col],
        F.coalesce(F.col(value_col), F.col("__new_value")).alias(value_col),
    )
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)


def write_report(df: DataFrame, path: str, fmt: str = "csv") -> None:
    """A10/A11: single-file report sinks (csv header / jsonl)."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unknown report format: {fmt}")
