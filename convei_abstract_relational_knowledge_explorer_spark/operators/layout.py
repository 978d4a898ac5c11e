"""Multi-dimensional data layout: Z-order clustering + data-skipping
stats.

At the 10^12-row design point, the dominant cost of ad-hoc queries is
the scan, and the dominant scan optimization after partition pruning is
FILE skipping on column min/max ranges (parquet row-group / Iceberg
manifest statistics).  A table sorted by one column skips perfectly on
that column and not at all on any other; interleaving the bits of
several columns' quantized values (Z-order / Morton code — the layout
behind Delta ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order Z-curves)
makes every interleaved dimension partially skippable at once.

Everything here is exact 64-bit integer arithmetic — quantization is
``(v - min) * 2^bits DIV (max - min + 1)`` and the Morton code is a sum
of shifted bits — so the layout decision AND the skipping statistics
are bit-reproducible across engines (the q91 oracle replays both
verbatim).

100 TB shape
------------
* column min/max: ONE map-side-combinable aggregate, collected as two
  scalars per column (metadata, the q23/q26 idiom) and inlined as
  literals — no second scan.
* the Morton key itself: a narrow whole-stage-codegen projection
  (shift/mask arithmetic, no UDF, no shuffle).
* file-group assignment is VALUE-bucketed (``zkey * n_files DIV
  keyspace``), not rank-bucketed: no global sort, no single-partition
  window — the q37 lesson.  File sizes then track the key-space
  density; the physical write path (:func:`zorder_layout`) uses
  ``repartitionByRange`` + ``sortWithinPartitions``, whose sampled
  range boundaries rebalance skew at write time.
* skipping stats: one ``groupBy(file_id)`` over the narrow projection.

Reference anchor: the reference engine always scans its whole SQLite
table (`/root/reference/build_reports.py` full-table SELECTs); layout-
driven skipping is a capability a web-scale engine adds, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _quantize_expr(name: str, lo: int, hi: int, bits: int) -> Column:
    """Exact integer quantization of column ``name`` from [lo, hi] onto
    [0, 2^bits): ``(v - lo) * 2^bits DIV (hi - lo + 1)``."""
    span = int(hi) - int(lo) + 1
    return F.expr(
        f"CAST((CAST({name} AS BIGINT) - {int(lo)}) * {1 << bits}"
        f" AS BIGINT) DIV {span}"
    )


def morton_key(
    quantized: list[Column | str],
    bits: int,
) -> Column:
    """Bit-interleave ``ncols`` already-quantized [0, 2^bits) integer
    columns into one Morton (Z-order) key: bit j of column c lands at
    position ``j * ncols + c``.  Pure shift/mask arithmetic — one
    codegen projection."""
    ncols = len(quantized)
    cols = [F.col(q) if isinstance(q, str) else q for q in quantized]
    key = F.lit(0).cast("long")
    for c, q in enumerate(cols):
        for j in range(bits):
            key = key + (
                F.shiftright(q.cast("long"), j).bitwiseAND(F.lit(1))
                * F.lit(1 << (j * ncols + c)).cast("long")
            )
    return key


def _column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]  # scalar metadata collect
    return {c: (int(row[f"__lo_{c}"]), int(row[f"__hi_{c}"])) for c in cols}


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_name: str = "zkey",
) -> DataFrame:
    """Add the Z-order key over ``cols`` (integer columns).  ``bounds``
    (lo, hi per column) skips the bounds scan when the caller already
    knows the domain — table statistics at scale."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bounds is None:
        bounds = _column_bounds(df, cols)
    qs = [
        _quantize_expr(c, bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    return df.withColumn(key_name, morton_key(qs, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """The physical write path: cluster the table on the Z-order key so
    every parquet file covers a compact box in ``cols``-space.
    ``repartitionByRange`` samples balanced boundaries (skew-safe) and
    ``sortWithinPartitions`` gives row-group-level locality inside each
    file.  Write the result with ``.write.parquet`` — the min/max
    statistics parquet records per file/row-group then skip on every
    interleaved dimension."""
    keyed = with_zorder_key(df, cols, bits=bits, bounds=bounds)
    if n_files is not None:
        keyed = keyed.repartitionByRange(n_files, "zkey")
    else:
        keyed = keyed.repartitionByRange("zkey")
    return keyed.sortWithinPartitions("zkey").drop("zkey")


def file_skipping_stats(
    df: DataFrame,
    cols: list[str],
    predicate: dict[str, tuple[int, int]],
    bits: int = 8,
    n_files: int = 64,
    layout: str = "zorder",
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Quantify min/max file skipping for a conjunctive range
    ``predicate`` ({col: (lo, hi)}) under a layout, without writing any
    files: rows are assigned to ``n_files`` value-bucketed file groups
    by layout key, each group records per-column min/max (exactly what
    parquet footers / Iceberg manifests store), and a file is SCANNED
    iff every predicate interval intersects its [min, max] box.

    ``layout='zorder'`` uses the Morton key; ``layout='linear'`` uses
    the concatenated-bits key (equivalent to sorting by ``cols[0]``,
    then ``cols[1]``, …) — the comparison baseline.

    Returns ONE summary row: (layout, n_files_nonempty, files_scanned,
    rows_scanned, rows_matching) — exact integers.
    """
    if layout not in ("zorder", "linear"):
        raise ValueError("layout must be 'zorder' or 'linear'")
    if bounds is None:
        bounds = _column_bounds(df, cols)
    ncols = len(cols)
    qs = [
        _quantize_expr(c, bounds[c][0], bounds[c][1], bits).alias(
            f"__q_{c}"
        )
        for c in cols
    ]
    keyed = df.select(*[F.col(c) for c in cols], *qs)
    if layout == "zorder":
        key = morton_key([f"__q_{c}" for c in cols], bits)
    else:
        key = F.lit(0).cast("long")
        for c in cols:  # cols[0] in the highest bits: sort-by-cols order
            key = F.shiftleft(key, bits) + F.col(f"__q_{c}").cast("long")
    keyspace = 1 << (bits * ncols)
    keyed = keyed.withColumn("__key", key).withColumn(
        "__file_id",
        F.expr(f"(__key * {n_files}) DIV {keyspace}"),
    )
    match_pred = None
    for c, (lo, hi) in predicate.items():
        p = (F.col(c) >= F.lit(int(lo))) & (F.col(c) <= F.lit(int(hi)))
        match_pred = p if match_pred is None else (match_pred & p)
    per_file = keyed.groupBy("__file_id").agg(
        F.count("*").cast("long").alias("__n_rows"),
        F.sum(match_pred.cast("long")).cast("long").alias("__n_match"),
        *[
            a
            for c in predicate
            for a in (
                F.min(c).alias(f"__lo_{c}"),
                F.max(c).alias(f"__hi_{c}"),
            )
        ],
    )
    scan_pred = None
    for c, (lo, hi) in predicate.items():
        p = (F.col(f"__hi_{c}") >= F.lit(int(lo))) & (
            F.col(f"__lo_{c}") <= F.lit(int(hi))
        )
        scan_pred = p if scan_pred is None else (scan_pred & p)
    return per_file.agg(
        F.lit(layout).alias("layout"),
        F.count("*").cast("long").alias("n_files_nonempty"),
        F.sum(scan_pred.cast("long")).cast("long").alias("files_scanned"),
        F.sum(F.when(scan_pred, F.col("__n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("__n_match").cast("long").alias("rows_matching"),
    ).select(
        "layout",
        "n_files_nonempty",
        "files_scanned",
        "rows_scanned",
        "rows_matching",
    )
