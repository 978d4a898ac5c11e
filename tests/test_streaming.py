"""Structured Streaming path: same extraction plan over a file stream."""

from __future__ import annotations

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
    web_pages,
)
from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
    pending_batches,
    run_stream_to_memory,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def test_pending_batches_anti_join(spark):
    source = web_pages(spark, 30, partitions=2)
    progress = source.limit(10).select("url")
    pending = pending_batches(source, progress)
    assert pending.count() == 20


def test_stream_extract_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "feed")
    web_pages(spark, 60, partitions=3).write.parquet(src)

    table = run_stream_to_memory(
        spark, src, PAGES_SCHEMA, table_name="t_stream_counts"
    )
    rows = table.collect()
    assert len(rows) > 0
    total = sum(r["n_docs"] for r in rows)
    assert total == 60
    assert all(r["lang"] is not None for r in rows)
    # window starts are hour-aligned
    assert all(
        r["window_start"].minute == 0 and r["window_start"].second == 0
        for r in rows
    )
