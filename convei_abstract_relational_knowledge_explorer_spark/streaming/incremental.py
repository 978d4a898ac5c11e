"""Incremental / streaming ingestion paths.

The reference has NO streaming operators (SURVEY.md §2.K) — its
incremental idiom is batch "process-where-NULL" + idempotent upserts
(/root/reference/embed_entries.py:87-101).  Two Spark mappings:

1. ``pending_batches`` — incremental batch: anti-join the source against
   the progress ledger (the direct translation of the reference idiom;
   this is what the checkpointed pipeline uses).
2. ``stream_extract`` / ``windowed_event_counts`` — Structured Streaming
   for a live web_pages feed: readStream → the same extraction kernel →
   watermarked tumbling-window aggregation.  The transformation code is
   IDENTICAL to the batch path (extract_documents works on streaming
   DataFrames too) — the unified-API property that makes the batch
   pipeline streaming-ready at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_documents


def pending_batches(
    source: DataFrame, progress: DataFrame, key: str = "url"
) -> DataFrame:
    """Rows not yet processed: source ANTI JOIN progress on the key.

    The Spark translation of the reference's ``WHERE col IS NULL``
    resumability predicate (B3/C2 in SURVEY.md §2).
    """
    return source.join(progress.select(key).distinct(), key, "left_anti")


def stream_web_pages(
    spark: SparkSession, source_dir: str, schema: str
) -> DataFrame:
    """File-source stream of web_pages parquet drops (one dir = one feed)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Streaming documents: the SAME extract_documents plan over a stream."""
    return extract_documents(pages_stream)


def windowed_document_counts(
    docs_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window doc counts per language with late-data watermark."""
    return (
        docs_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_docs")
    )


def run_stream_to_memory(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    table_name: str = "stream_counts",
    timeout_s: int = 60,
):
    """Drive the stream into an in-memory sink until idle (test harness)."""
    stream = stream_web_pages(spark, source_dir, schema)
    docs = stream_extract(stream)
    counts = windowed_document_counts(docs)
    query = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"stream did not drain within {timeout_s}s — the memory table "
            "would be partial"
        )
    return spark.table(table_name)


def stateful_sessionize(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str | None = "auto",
) -> DataFrame:
    """Custom stateful operator: streaming sessionization via
    ``applyInPandasWithState`` (Arrow-batched per-key state).

    State per key = (session_start, last_ts, n_events) as epoch-micros
    longs.  Within each micro-batch the key's events are processed in
    timestamp order: an event more than ``gap_minutes`` after ``last_ts``
    CLOSES the open session (emitted exactly once, append mode) and
    starts a new one; the trailing open session survives in state.

    FINAL sessions of idle keys (r03 VERDICT #3): with a watermark, the
    open session carries an ``EventTimeTimeout`` at ``last_ts + gap`` —
    once the event-time watermark passes the point where no on-time
    event could extend the session, the timed-out callback emits it
    exactly once and clears the key's state.  That makes this the
    faithful streaming twin of q18's batch window-lag sessionization
    (the parity test drives both on one fixture), and state size stays
    bounded by the ACTIVE key set instead of growing with every key
    ever seen.

    ``watermark`` semantics: events arriving later than the watermark
    delay behind the stream's max event time are DROPPED before they
    reach the operator — that is the price of bounded state, and the
    one place the streaming twin can diverge from the batch form (which
    sees every event, however late).  The ``"auto"`` default therefore
    sets the delay to the session gap itself: an event late enough to
    be dropped is by construction late enough that its session was
    already closed and emitted — batch parity holds for every event no
    later than one full gap.  Pass an explicit duration to trade state
    for more lateness tolerance, or ``watermark=None`` for NoTimeout
    (no late drops, but open sessions held forever — the r02 shape,
    kept for pure-replay uses).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    cols = [key_col, "session_start", "session_end", "n_events"]

    if watermark == "auto":
        watermark = f"{gap_minutes} minutes"
    if watermark is not None:
        events_stream = events_stream.withWatermark(ts_col, watermark)

    def _emit(rows):
        out = pd.DataFrame(rows, columns=cols)
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        return out

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last_ts + gap: no on-time event can extend
            # the open session — emit it exactly once and drop the key
            s_start, s_last, n = state.get
            state.remove()
            yield _emit([(key[0], s_start, s_last, n)])
            return
        if state.exists:
            s_start, s_last, n = state.get
        else:
            s_start = s_last = None
            n = 0
        closed: list[tuple] = []
        # the key's micro-batch arrives as MULTIPLE Arrow chunks (batch
        # size spark.sql.execution.arrow.maxRecordsPerBatch) — collect
        # them all before sorting, or boundaries straddle chunks
        all_ts = sorted(
            int(v.value) // 1000
            for pdf in pdf_iter
            for v in pd.to_datetime(pdf[ts_col])
        )
        for t in all_ts:
            if s_start is None:
                s_start = s_last = t
                n = 1
            elif t - s_last > gap_us:
                closed.append((key[0], s_start, s_last, n))
                s_start = s_last = t
                n = 1
            else:
                s_last = max(s_last, t)
                n += 1
        state.update((s_start, s_last, n))
        if watermark is not None:
            # fire when the watermark passes the session's close point;
            # must stay strictly ahead of the current watermark or Spark
            # rejects the timestamp (late-data edge)
            timeout_ms = max(
                s_last // 1000 + gap_minutes * 60 * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _emit(closed)

    return events_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} long, session_start timestamp,"
            " session_end timestamp, n_events long"
        ),
        stateStructType="session_start long, last_ts long, n_events long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stateful_dedup_stream(
    docs_stream: DataFrame,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    ttl_minutes: int | None = None,
    watermark: str | None = "auto",
) -> DataFrame:
    """Streaming exact dedup across micro-batches — the ingest-path twin
    of ``operators/dedup.exact_duplicates``: the FIRST document per key
    is emitted exactly once (within a micro-batch, ties resolve to the
    min ``(ts, id)`` — deterministic under any partitioning); every
    later arrival of the key is dropped.  State per key = two epoch-
    micros longs, nothing data-sized.

    ``ttl_minutes=None`` (default): keys are remembered forever — exact
    global first-arrival dedup, state growing with the DISTINCT key
    count (the regime where you run the batch dedup as periodic
    backfill instead).

    ``ttl_minutes=k``: each key's state carries an ``EventTimeTimeout``
    at ``last_seen + ttl``; once the event-time watermark passes it the
    key is forgotten, so state is bounded by the keys ACTIVE within one
    ttl window — the 10^12-doc crawl shape, where near-in-time
    duplicates (re-crawls, mirror bursts) dominate.  A duplicate
    arriving after its key expired re-emits: the documented recall
    bound of bounded state, exactly the trade
    ``stateful_sessionize`` documents for late events.

    ``watermark="auto"`` sets the lateness delay to the ttl itself
    (no-op when ``ttl_minutes=None``); pass an explicit duration to
    decouple lateness tolerance from state lifetime.
    Returns an append-mode stream of (key_col, id_col, first_ts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    use_ttl = ttl_minutes is not None
    if watermark == "auto":
        watermark = f"{ttl_minutes} minutes" if use_ttl else None
    if watermark is not None:
        docs_stream = docs_stream.withWatermark(ts_col, watermark)

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last_seen + ttl: forget the key
            state.remove()
            return
        # a key with BOTH an expired timer and new data in the same
        # micro-batch gets the data callback, not the timeout — detect
        # logical expiry inline or the re-emission is silently deduped
        expired = (
            use_ttl
            and state.exists
            and state.getCurrentWatermarkMs()
            > state.get[1] // 1000 + ttl_minutes * 60 * 1000
        )
        best: tuple | None = None
        last_seen = state.get[1] if state.exists and not expired else 0
        for pdf in pdf_iter:
            for ts, i in zip(
                pd.to_datetime(pdf[ts_col]), pdf[id_col]
            ):
                t_us = int(ts.value) // 1000
                last_seen = max(last_seen, t_us)
                cand = (t_us, int(i))
                if best is None or cand < best:
                    best = cand
        fresh = expired or not state.exists
        state.update((best[0] if fresh else state.get[0], last_seen))
        if use_ttl:
            state.setTimeoutTimestamp(
                max(
                    last_seen // 1000 + ttl_minutes * 60 * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if fresh:
            out = pd.DataFrame(
                [(key[0], best[1], best[0])],
                columns=[key_col, id_col, "first_ts"],
            )
            out["first_ts"] = pd.to_datetime(out["first_ts"], unit="us")
            yield out

    return docs_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} string, {id_col} long, first_ts timestamp"
        ),
        stateStructType="first_ts long, last_seen long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_graph_updates(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    graph_dir: str,
    checkpoint_dir: str,
    topics_mode: str = "frozen_idf",
    edge_counts: str = "sketch",
    timeout_s: int = 600,
    **update_kwargs,
):
    """Continuously fold crawl drops into a built graph (foreachBatch).

    The lambda-architecture unification: Structured Streaming watches
    ``source_dir`` for newly landed web_pages parquet and hands each
    micro-batch to :func:`..plans.pipeline.incremental_update` — EXACTLY
    the batch maintenance path (same parity contracts, same ledger), so
    the streaming graph can never drift from what a batch increment
    would produce.  Exactly-once by composition: the streaming
    checkpoint pins which source files each batch id covers, and
    ``incremental_update`` is exactly-once per batch via the
    Checkpointer's batch journal (staged deltas + idempotent publish +
    ``_BATCH``-token merges) — a batch replayed after a crash AT ANY
    POINT, including mid-increment between two stage appends, resumes
    from the journal instead of double-ingesting or silently dropping
    the not-yet-appended stages.

    Runs with ``availableNow`` (drain everything currently landed, then
    stop): the monthly-crawl cadence — schedule the call per drop; a
    ``processingTime`` trigger turns the same code into a daemon.

    Raises ``TimeoutError`` if the drop does not drain within
    ``timeout_s`` (after requesting a stop): returning silently would
    hand the caller a query still folding a batch, and a ``spark.stop()``
    on their side would kill it mid-increment.  The journal makes that
    crash-safe, but it must be a visible condition, not a quiet one —
    rerun the call to resume the interrupted batch.
    """
    from ..plans.pipeline import incremental_update

    stream = stream_web_pages(spark, source_dir, schema)

    def _fold(batch_df, _batch_id):
        incremental_update(
            spark,
            graph_dir,
            batch_df,
            topics_mode=topics_mode,
            edge_counts=edge_counts,
            **update_kwargs,
        )

    query = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        query.awaitTermination(30)
        raise TimeoutError(
            f"graph-update stream did not drain within {timeout_s}s; "
            "the interrupted batch is journal-protected — rerun to resume"
        )
    return query


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "3 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join (click attribution shape).

    Native Structured Streaming join: every LEFT event pairs with the
    RIGHT events for the same key whose timestamp falls inside
    ``[left_ts, left_ts + horizon]``.  Both sides carry watermarks and
    the join condition carries the time range, so Spark derives a state
    eviction bound on BOTH buffers — state is O(key-rate x horizon +
    watermark slack), never unbounded (the property that makes this run
    forever on a 100 TB/day event feed; without the range predicate a
    stream-stream join must buffer each side indefinitely).

    ``how="leftOuter"`` emits unmatched left rows (NULL right columns)
    once the watermark proves no match can still arrive — the
    "impression with no click" feed.  Batch twin: the SAME call on
    batch frames gives the equality the tests assert (streaming
    micro-batching must not change the result set).

    The right side's key column comes back suffixed ``_r`` so the
    result schema is unambiguous.
    """
    r_key = f"{key}_r"
    rr = right.withColumnRenamed(key, r_key)
    if left.isStreaming or rr.isStreaming:
        lw = left.withWatermark(left_ts, left_watermark)
        rw = rr.withWatermark(right_ts, right_watermark)
    else:
        lw, rw = left, rr
    cond = (
        (F.col(key) == F.col(r_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}")
        )
    )
    return lw.join(rw, cond, how)


def stateful_cusum(
    events_stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value_milli",
    k_milli: int = 5000,
    h_milli: int = 4000,
) -> DataFrame:
    """Streaming twin of :func:`..operators.temporal.cusum_changepoints`
    via ``applyInPandasWithState`` → append-mode rows
    (key, ts, x_milli, s_pos, s_neg, alarm) — one per input event.

    State per key is THREE longs (cum, min_cum, max_cum): the batch
    operator's prefix identity S⁺ = cum − min(0, min-prefix) /
    S⁻ = max(0, max-prefix) − cum needs exactly the running extrema,
    so the streaming form carries O(1) state however long the series
    runs — no window buffer, no replay.  ``k_milli`` is the FIXED
    in-control reference (streaming can't use the batch default of the
    series' own mean — the future isn't available; supply the level
    from history or design).  Arrow chunks are collected and sorted by
    (ts, value) within each micro-batch before the walk, the
    sessionize discipline; cross-batch order is arrival order — the
    standard processing-time caveat of every streaming accumulator,
    documented rather than hidden (the batch twin is the replayable
    form; the parity test drives both on one ordered fixture).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = [key_col, ts_col, "x_milli", "s_pos", "s_neg", "alarm"]

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            cum, mn, mx = state.get
        else:
            cum, mn, mx = 0, 0, 0
        rows = []
        ordered = sorted(
            (int(pd.Timestamp(t).value) // 1000, int(v))
            for pdf in pdf_iter
            for t, v in zip(pdf[ts_col], pdf[value_col])
        )
        for t_us, x in ordered:
            cum += x - k_milli
            mn = min(mn, cum)
            mx = max(mx, cum)
            s_pos = cum - min(0, mn)
            s_neg = max(0, mx) - cum
            rows.append(
                (
                    key[0],
                    t_us,
                    x,
                    s_pos,
                    s_neg,
                    bool(s_pos >= h_milli or s_neg >= h_milli),
                )
            )
        state.update((cum, mn, mx))
        out = pd.DataFrame(rows, columns=cols)
        out[ts_col] = pd.to_datetime(out[ts_col], unit="us")
        yield out

    schema = (
        f"{key_col} string, {ts_col} timestamp, x_milli long, "
        f"s_pos long, s_neg long, alarm boolean"
    )
    return events_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="cum long, mn long, mx long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
