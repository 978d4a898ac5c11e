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


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: the session CLOSED by a
    later event inside the batch is emitted; the trailing open session
    and single-event keys stay in state (append mode, exactly-once)."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_sessionize,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(minutes=120)),   # > 30m gap closes session 1
        (1, t0 + dt.timedelta(minutes=125)),   # open session, held in state
        (2, t0),                               # single event, held in state
    ]
    src = str(tmp_path / "events_feed")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    out = stateful_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.table("t_sessions").collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 2
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + dt.timedelta(minutes=5)


def test_stateful_sessionize_across_arrow_chunks(spark, tmp_path):
    """Events spanning multiple Arrow chunks within one micro-batch must
    still be processed in global timestamp order (regression: chunk-local
    sorting mis-assigned events to sessions)."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_sessionize,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # interleaved across two sessions; any chunk-local walk closes wrong
    offs = [0, 60, 5, 62, 7, 64]  # minutes; gap 30 -> S1={0,5,7} closed
    rows = [(1, t0 + dt.timedelta(minutes=m)) for m in offs]
    src = str(tmp_path / "chunked_feed")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        )
        q = (
            stateful_sessionize(stream, gap_minutes=30)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sessions_chunked")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.table("t_sessions_chunked").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 3
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + dt.timedelta(minutes=7)
