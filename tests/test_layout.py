"""Z-order layout + file-skipping stats (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators.layout import (
    file_skipping_stats,
    morton_key,
    with_zorder_key,
    zorder_layout,
)


def _morton_py(a: int, b: int, bits: int = 8) -> int:
    out = 0
    for j in range(bits):
        out |= ((a >> j) & 1) << (2 * j)
        out |= ((b >> j) & 1) << (2 * j + 1)
    return out


def test_morton_key_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (7, 200)]
    df = spark.createDataFrame(rows, "qa int, qb int")
    got = {
        (r["qa"], r["qb"]): r["z"]
        for r in df.withColumn(
            "z", morton_key(["qa", "qb"], bits=8)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_py(a, b)


def test_with_zorder_key_quantization_exact(spark):
    # domain [10, 19] → span 10; v=19 → (9*4)//10 = 3 (bits=2 → [0,4))
    df = spark.createDataFrame(
        [(10, 10), (19, 19), (14, 15)], "x int, y int"
    )
    out = {
        (r["x"], r["y"]): r["zkey"]
        for r in with_zorder_key(df, ["x", "y"], bits=2).collect()
    }
    def q(v):
        return ((v - 10) * 4) // 10
    def m(a, b):
        out = 0
        for j in range(2):
            out |= ((a >> j) & 1) << (2 * j)
            out |= ((b >> j) & 1) << (2 * j + 1)
        return out
    for x, y in [(10, 10), (19, 19), (14, 15)]:
        assert out[(x, y)] == m(q(x), q(y))


def test_zorder_layout_preserves_rows_and_range_partitions(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 50).cast("int").alias("x"),
        (F.col("id") * 7 % 40).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    out = zorder_layout(df, ["x", "y"], bits=6, n_files=8)
    assert out.columns == ["x", "y", "payload"]  # zkey dropped
    assert out.count() == 1000
    assert sorted(r["payload"] for r in out.collect()) == list(range(1000))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_skipping_stats_invariants(spark):
    df = spark.range(0, 4000).select(
        (F.col("id") % 200).cast("int").alias("x"),
        (F.expr("id DIV 200") % 20).cast("int").alias("y"),
    )
    pred = {"x": (50, 99), "y": (5, 9)}
    z = file_skipping_stats(df, ["x", "y"], pred, bits=6, n_files=16,
                            layout="zorder").collect()[0]
    lin = file_skipping_stats(df, ["x", "y"], pred, bits=6, n_files=16,
                              layout="linear").collect()[0]
    # layout never changes the answer, only the scan
    # each (x, y) pair occurs exactly once on this 200×20 grid
    assert z["rows_matching"] == lin["rows_matching"] == 50 * 5
    # scanned rows always cover the matching rows
    for r in (z, lin):
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["files_scanned"] <= r["n_files_nonempty"]
    # on this uniform grid the interleaved layout must skip files the
    # x-then-y sort cannot (y is unconstrained within each x-file)
    assert z["rows_scanned"] < lin["rows_scanned"]
