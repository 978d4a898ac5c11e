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
    whose timeout the watermark has NOT passed stays in state; an idle
    key whose timeout the watermark HAS passed emits its final session
    (r03 VERDICT #3 — EventTimeTimeout, no session held forever)."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_sessionize,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(minutes=120)),   # > 30m gap closes session 1
        (1, t0 + dt.timedelta(minutes=125)),   # open; timeout t0+155 > wm
        (2, t0),                               # idle key; timeout t0+30 < wm
    ]
    src = str(tmp_path / "events_feed")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    # watermark = max event ts - 10m = t0+115: past user 2's timeout
    out = stateful_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["user_id"]: r for r in spark.table("t_sessions").collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_events"] == 2
    assert got[1]["session_start"] == t0
    assert got[1]["session_end"] == t0 + dt.timedelta(minutes=5)
    # the idle key's FINAL session, emitted by the event-time timeout
    assert got[2]["n_events"] == 1
    assert got[2]["session_start"] == t0 and got[2]["session_end"] == t0

    # watermark=None keeps the r02 NoTimeout shape: open sessions held
    stream2 = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    q2 = (
        stateful_sessionize(stream2, gap_minutes=30, watermark=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions_noto")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    got2 = spark.table("t_sessions_noto").collect()
    assert len(got2) == 1 and got2[0]["user_id"] == 1


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


def test_stateful_sessionize_batch_parity(spark, tmp_path):
    """r03 VERDICT #3 'done' criterion: on one events fixture, the
    streamed session multiset (event-closed + timeout-emitted finals)
    must EQUAL the batch gap-sessionization's (q18's rule: a session
    breaks on a >30m gap; count, start, end, n_events all match).  A
    far-future sentinel key pushes the watermark past every real
    session's timeout so all finals flush."""
    import datetime as dt
    import random

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_sessionize,
    )

    rng = random.Random(7)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for user in range(1, 13):
        t = t0 + dt.timedelta(minutes=rng.randint(0, 120))
        for _ in range(rng.randint(1, 25)):
            # mix of intra-session steps and >gap jumps
            t += dt.timedelta(minutes=rng.choice([1, 3, 9, 28, 31, 45, 200]))
            rows.append((user, t))

    # batch twin (q18's rule), computed per user in plain python
    GAP = dt.timedelta(minutes=30)
    expected = set()
    by_user: dict[int, list] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > GAP:
                expected.add((u, start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        expected.add((u, start, last, n))

    # stream: real events in file 1, sentinel in file 2 (one batch each)
    # so the watermark advances past every real timeout before the end
    feed = tmp_path / "parity_feed"
    feed.mkdir()
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.parquet(str(feed / "f1"))
    sentinel_ts = max(t for _, t in rows) + dt.timedelta(days=30)
    spark.createDataFrame(
        [(999, sentinel_ts)], "user_id long, ts timestamp"
    ).coalesce(1).write.parquet(str(feed / "f2"))
    for sub in ("f1", "f2"):
        for p in (feed / sub).glob("*.parquet"):
            p.rename(feed / f"{sub}.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        stateful_sessionize(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t_sessions_parity").collect()
        if r["user_id"] != 999
    }
    assert got == expected


def test_stateful_dedup_stream_first_arrival(spark, tmp_path):
    """Exact streaming dedup (ttl=None): one emission per distinct key,
    carrying the min (ts, id) of the FIRST micro-batch that contained
    the key — later batches' duplicates (even with smaller ids) drop."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_dedup_stream,
    )

    t0 = dt.datetime(2026, 2, 1, 0, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    batch1 = [
        ("fp_a", 10, m(5)),
        ("fp_a", 3, m(5)),   # same ts: min id wins within the batch
        ("fp_b", 20, m(1)),
        ("fp_a", 7, m(2)),   # earlier ts: wins fp_a despite larger id
    ]
    batch2 = [
        ("fp_a", 1, m(0)),   # earlier than everything — too late: dup
        ("fp_c", 30, m(9)),
        ("fp_b", 21, m(8)),
    ]
    feed = tmp_path / "dedup_feed"
    feed.mkdir()
    schema = "fingerprint string, doc_id long, ts timestamp"
    for name, rows in (("f1", batch1), ("f2", batch2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(feed / name)
        )
        for p in (feed / name).glob("*.parquet"):
            p.rename(feed / f"{name}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        stateful_dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["fingerprint"], r["doc_id"], r["first_ts"])
        for r in spark.table("t_dedup_stream").collect()
    }
    assert got == {
        ("fp_a", 7, m(2)),
        ("fp_b", 20, m(1)),
        ("fp_c", 30, m(9)),
    }


def test_stateful_dedup_stream_ttl_expiry(spark, tmp_path):
    """With ttl, a key recurring AFTER the watermark passes
    last_seen + ttl re-emits (state was dropped); a key recurring
    within the ttl stays deduped."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_dedup_stream,
    )

    t0 = dt.datetime(2026, 2, 1, 0, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    feed = tmp_path / "dedup_ttl_feed"
    feed.mkdir()
    schema = "fingerprint string, doc_id long, ts timestamp"
    batches = [
        ("f1", [("fp_x", 1, m(0)), ("fp_y", 2, m(0))]),
        # fp_y recurs within ttl (30m): deduped; watermark advances
        ("f2", [("fp_y", 3, m(20)), ("fp_z", 4, m(20))]),
        # far-future row pushes the watermark past every ttl
        ("f3", [("fp_w", 5, m(10_000))]),
        # fp_x expired: re-emits
        ("f4", [("fp_x", 6, m(10_001))]),
    ]
    for name, rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(feed / name)
        )
        for p in (feed / name).glob("*.parquet"):
            p.rename(feed / f"{name}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        stateful_dedup_stream(stream, ttl_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_ttl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["fingerprint"], r["doc_id"])
        for r in spark.table("t_dedup_ttl").collect()
    )
    assert got == [
        ("fp_w", 5),
        ("fp_x", 1),
        ("fp_x", 6),  # re-emitted after expiry
        ("fp_y", 2),  # within-ttl recurrence stayed deduped
        ("fp_z", 4),
    ]


def test_stream_interval_join_batch_and_stream_parity(spark, tmp_path):
    """Watermarked stream-stream interval join (click attribution):
    every impression pairs with same-key clicks inside
    [imp_ts, imp_ts + 1h].  The streamed inner-join multiset must EQUAL
    the batch twin's (same function, batch frames) — micro-batching
    must not change the result set."""
    import datetime as dt
    import random

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stream_interval_join,
    )

    rng = random.Random(11)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    imps = [
        (rng.randint(1, 6), t0 + dt.timedelta(minutes=rng.randint(0, 300)))
        for _ in range(40)
    ]
    clicks = [
        (rng.randint(1, 6), t0 + dt.timedelta(minutes=rng.randint(0, 360)))
        for _ in range(40)
    ]
    H = dt.timedelta(hours=1)
    expected = {
        (k, it, ck, ct)
        for (k, it) in imps
        for (ck, ct) in clicks
        if k == ck and it <= ct <= it + H
    }
    assert expected, "fixture must produce matches"

    schema_l = "ad_id long, imp_ts timestamp"
    schema_r = "ad_id long, click_ts timestamp"
    ldf = spark.createDataFrame(imps, schema_l)
    rdf = spark.createDataFrame(clicks, schema_r)

    # batch twin: same call, batch frames
    batch = {
        (r["ad_id"], r["imp_ts"], r["ad_id_r"], r["click_ts"])
        for r in stream_interval_join(
            ldf, rdf, "ad_id", "imp_ts", "click_ts"
        ).collect()
    }
    assert batch == expected

    lsrc, rsrc = str(tmp_path / "imps"), str(tmp_path / "clicks")
    ldf.coalesce(1).write.parquet(lsrc)
    rdf.coalesce(1).write.parquet(rsrc)
    out = stream_interval_join(
        spark.readStream.schema(schema_l).parquet(lsrc),
        spark.readStream.schema(schema_r).parquet(rsrc),
        "ad_id",
        "imp_ts",
        "click_ts",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj_inner")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["ad_id"], r["imp_ts"], r["ad_id_r"], r["click_ts"])
        for r in spark.table("t_ssj_inner").collect()
    }
    assert streamed == expected


def test_stream_interval_join_left_outer_flush(spark, tmp_path):
    """leftOuter: an impression with NO click inside its horizon emits
    once with NULL right columns, but only after the watermark proves no
    match can arrive — a far-future sentinel in a second micro-batch
    pushes the watermark past every real impression's horizon."""
    import datetime as dt

    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stream_interval_join,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    imps = [(1, t0), (2, t0)]                          # key 2: no click
    clicks = [(1, t0 + dt.timedelta(minutes=10))]
    far = t0 + dt.timedelta(days=30)

    lfeed, rfeed = tmp_path / "l", tmp_path / "r"
    lfeed.mkdir(), rfeed.mkdir()
    schema_l = "ad_id long, imp_ts timestamp"
    schema_r = "ad_id long, click_ts timestamp"
    spark.createDataFrame(imps, schema_l).coalesce(1).write.parquet(
        str(lfeed / "f1")
    )
    spark.createDataFrame([(99, far)], schema_l).coalesce(1).write.parquet(
        str(lfeed / "f2")
    )
    spark.createDataFrame(
        clicks + [(99, far)], schema_r
    ).coalesce(1).write.parquet(str(rfeed / "f1"))
    for feed, subs in ((lfeed, ("f1", "f2")), (rfeed, ("f1",))):
        for sub in subs:
            for p in (feed / sub).glob("*.parquet"):
                p.rename(feed / f"{sub}.parquet")

    out = stream_interval_join(
        spark.readStream.schema(schema_l)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(lfeed)),
        spark.readStream.schema(schema_r).parquet(str(rfeed)),
        "ad_id",
        "imp_ts",
        "click_ts",
        how="leftOuter",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj_outer")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        r
        for r in spark.table("t_ssj_outer").collect()
        if r["ad_id"] != 99
    ]
    matched = {r["ad_id"] for r in rows if r["click_ts"] is not None}
    unmatched = {r["ad_id"] for r in rows if r["click_ts"] is None}
    assert matched == {1}
    assert unmatched == {2}
    assert len(rows) == 2


def test_stateful_cusum_batch_parity(spark, tmp_path):
    """The streamed CUSUM walk over an ordered fixture equals the batch
    prefix-identity operator row for row (same fixed reference k), and
    state carries across micro-batches (two parquet files = two
    batches per key in availableNow mode processed in file order is
    not guaranteed — so the fixture keys each fit one file)."""
    import datetime as dt

    import pyspark.sql.functions as F
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        cusum_changepoints,
    )
    from convei_abstract_relational_knowledge_explorer_spark.streaming.incremental import (
        stateful_cusum,
    )

    t0 = dt.datetime(2026, 1, 1)
    xs = [5000, 5000, 9000, 9000, 1000, 5000, 12000, 12000]
    rows = [
        ("a", t0 + dt.timedelta(hours=i), x) for i, x in enumerate(xs)
    ] + [
        ("b", t0 + dt.timedelta(hours=i), 5000) for i in range(4)
    ]
    src = str(tmp_path / "cusum_feed")
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, value_milli long"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value_milli long"
    ).parquet(src)
    out = stateful_cusum(stream, k_milli=5000, h_milli=7000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_cusum")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        (r["event_type"], r["ts"]): (r["s_pos"], r["s_neg"], r["alarm"])
        for r in spark.table("t_cusum").collect()
    }
    batch_in = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value_milli long"
    ).select(
        "event_type", "ts", (F.col("value_milli") / 1000).cast("long").alias("x")
    )
    batch = {
        (r["event_type"], r["ts"]): (r["s_pos"], r["s_neg"], r["alarm"])
        for r in cusum_changepoints(
            batch_in, ["event_type"], "ts", "x", k_milli=5000, h_milli=7000
        ).collect()
    }
    assert streamed == batch
    # flat series never alarms; the spiky one does
    assert not any(a for (k, _), (_, _, a) in streamed.items() if k == "b")
    assert any(a for (k, _), (_, _, a) in streamed.items() if k == "a")
