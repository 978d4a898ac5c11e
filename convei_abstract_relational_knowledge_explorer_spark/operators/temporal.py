"""Temporal joins Spark lacks natively — as-of join via the union-window
trick (no UDF, no range explosion).

The reference's event-shaped data is append-only progress logs scanned
with per-row Python loops (/root/reference/build_reports.py report
re-scan idiom); at stream scale the canonical temporal primitive is the
AS-OF join: for every left row, the single most recent right row with
``right.ts <= left.ts`` for the same key.  Spark has no built-in as-of
join (SPARK-22947 open for years); the scalable formulation is:

  1. union both sides with a side tag, right rows carrying their payload
     and left rows NULL
  2. one window per key ordered by (ts, side): ``last(payload,
     ignoreNulls=true)`` over rows-unbounded-preceding gives every left
     row the latest right payload at-or-before its timestamp
  3. filter back to left rows

One shuffle on the key, sort within partition, no join amplification —
the plan survives billions of rows per key-day because the window is
hash-partitioned by key (skewed keys: pre-salt by day like skew.py).
Right rows are pre-aggregated per (key, ts) so ties are deterministic
in every engine (DuckDB's ASOF JOIN, which the q45 oracle uses, picks
an arbitrary row among equal timestamps otherwise).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
    payload_alias: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``payload_alias`` = the
    ``payload`` of the latest ``right`` row with ``right.ts <= left.ts``
    and the same ``key`` (NULL when no prior right row exists).

    ``right`` is deduplicated to one row per (key, ts) by max(payload)
    first, so the result is deterministic under timestamp ties.
    """
    r = (
        right.groupBy(F.col(key).alias(key), F.col(ts).alias(ts))
        .agg(F.max(payload).alias("_p"))
        .select(key, ts, "_p", F.lit(0).alias("_side"))
    )
    l_cols = left.columns
    l = left.select(
        *l_cols, F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(payload_alias, F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*l_cols, payload_alias)
    )


def edge_intervals(
    observations: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Collapse an observation log into validity intervals (temporal-KG
    edge versioning / SCD type 2) → key cols + (value, valid_from,
    valid_to, n_obs, revision).

    An incrementally-built KG observes functional predicates repeatedly
    — (subj, pred) → obj at time t — and the queryable artifact is the
    edge HISTORY: maximal runs of consecutive same-value observations
    per key, each with its first/last timestamp and a 1-based revision
    number (a value that flips A→B→A is three intervals, so this is
    gaps-and-islands, NOT a groupBy on value).  Island ids are a
    running sum of change flags — ``lag(value)`` differs → +1 — under
    ONE window partitioned by the key, so the whole operator is a
    single shuffle (the textbook two-rank island id needs a SECOND
    window partitioned by (key, value) — a second exchange; the q68
    oracle uses that independent formulation, so the hash match also
    cross-checks the two forms).  Ties on ``ts`` are broken by
    ``value_col`` so the result is engine-exact on duplicate
    timestamps.
    """
    from pyspark.sql.window import Window

    # asc_nulls_last pins Spark to DuckDB's ASC default (Spark sorts
    # NULLS FIRST ascending) — a NULL state tied on ts must island
    # identically in both engines
    w_all = Window.partitionBy(*key_cols).orderBy(
        F.asc_nulls_last(ts_col), F.asc_nulls_last(value_col)
    )
    chg = F.when(
        F.lag(value_col).over(w_all).eqNullSafe(F.col(value_col)), 0
    ).otherwise(1)
    runs = observations.select(
        *key_cols,
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("_ts"),
        F.sum(chg).over(
            w_all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_island"),
    )
    iv = runs.groupBy(*key_cols, "value", "_island").agg(
        F.min("_ts").alias("valid_from"),
        F.max("_ts").alias("valid_to"),
        F.count("*").cast("long").alias("n_obs"),
    )
    w_rev = Window.partitionBy(*key_cols).orderBy(
        F.asc_nulls_last("valid_from"), F.asc_nulls_last("value")
    )
    return iv.select(
        *key_cols,
        "value",
        "valid_from",
        "valid_to",
        "n_obs",
        F.row_number().over(w_rev).alias("revision"),
    )


def ohlc_downsample(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Time-series downsampling to OHLC bars with a gap-filled spine —
    the resample/last-observation-carried-forward pair every metrics
    store needs and Spark has no primitive for.

    Per (group, time-bucket): ``open``/``close`` are the values of the
    bucket's first/last event under the TOTAL order (ts, id) — selected
    by row_number, never arg-min on floats, so ts ties are
    deterministic; ``high``/``low`` are max/min(value) (pure selection,
    no float arithmetic — bit-identical cross-engine); ``n_events``
    counts.  The spine is every bucket from the GLOBAL min to max
    bucket cross-joined with the distinct groups (metadata-sized:
    |groups| × |buckets|, broadcast side), left-joined to the bars;
    empty buckets get n_events = 0 and ``filled_close`` carries the
    last non-null close forward per group (window per group ordered by
    bucket — bounded by the spine length, not the data, so the
    partition-local sort is scale-safe).  Leading buckets before a
    group's first event keep filled_close NULL.

    Returns (group, bucket_ts, open, high, low, close, n_events,
    filled_close).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    w_fwd = Window.partitionBy(group_col, "bucket_ts").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    w_rev = Window.partitionBy(group_col, "bucket_ts").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    bars = (
        events.select(
            F.col(group_col),
            b.alias("bucket_ts"),
            F.col(ts_col),
            F.col(id_col),
            F.col(value_col).alias("__v"),
        )
        .withColumn("__rn_f", F.row_number().over(w_fwd))
        .withColumn("__rn_r", F.row_number().over(w_rev))
        .groupBy(group_col, "bucket_ts")
        .agg(
            F.max(F.when(F.col("__rn_f") == 1, F.col("__v"))).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(F.when(F.col("__rn_r") == 1, F.col("__v"))).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    lo, hi = events.agg(
        F.min(b).alias("lo"), F.max(b).alias("hi")
    ).collect()[0]  # two scalars — metadata
    spark = events.sparkSession
    spine_ts = spark.sql(
        "SELECT explode(sequence(TIMESTAMP '{}', TIMESTAMP '{}',"
        " INTERVAL 1 {})) AS bucket_ts".format(lo, hi, bucket)
    )
    spine = (
        events.select(group_col).distinct().crossJoin(F.broadcast(spine_ts))
    )
    w_locf = (
        Window.partitionBy(group_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(bars, [group_col, "bucket_ts"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn(
            "filled_close", F.last("close", ignorenulls=True).over(w_locf)
        )
        .select(
            group_col,
            "bucket_ts",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "filled_close",
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str = "t",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 32,
) -> DataFrame:
    """Point-in-interval join (``lo <= t <= hi``, closed) — the range
    join Spark would otherwise plan as BroadcastNestedLoop or a full
    cartesian.  Bucketed equi-join instead: every point owns exactly ONE
    bucket (``t DIV w``), every interval explodes onto the buckets it
    spans (fan-out = ``len DIV w + 1``, bounded by the caller choosing
    ``bucket_width`` near the typical interval length), the join is a
    plain shuffle-hash/sort-merge equi-join on the bucket, and the
    residual ``BETWEEN`` filter lands pushed against the join output.
    Each qualifying (point, interval) pair meets in exactly one bucket
    — the point's — so there is NO post-join dedup (the usual cost of
    chop-and-join schemes).

    Coordinates must be integral (cast dates to day numbers / epochs
    upstream).  Skew: a single interval spanning the whole domain
    explodes onto every bucket — cap with a coarser ``bucket_width`` or
    split the outlier tier; points never fan out at all, so point-side
    skew needs nothing.

    Returns points ⋈ intervals with all columns from both sides.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    pts = points.withColumn(
        "__bucket", F.expr(f"CAST({t_col} AS BIGINT) DIV {w}")
    )
    ivs = intervals.withColumn(
        "__bucket",
        F.explode(
            F.expr(
                f"sequence(CAST({lo_col} AS BIGINT) DIV {w},"
                f" CAST({hi_col} AS BIGINT) DIV {w})"
            )
        ),
    )
    return (
        pts.join(ivs, "__bucket")
        .filter(
            (F.col(t_col) >= F.col(lo_col))
            & (F.col(t_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Materialize a snapshot from a CDC changelog: last-writer-wins per
    key, tombstones removed.

    The reference applies row changes one statement at a time through
    SQLite upserts (/root/reference/build_database.py ON CONFLICT DO
    UPDATE idiom, SURVEY §2 A7); the batch-at-scale equivalent is
    compacting an ordered changelog — (key, seq, op, payload) rows where
    op ∈ {upsert, delete} — down to the latest surviving row per key
    (the Iceberg/Delta CDC-apply / upsert-compaction shape).

    Shape chosen for 100 TB: ``max_by(struct(payload…), seq)`` in ONE
    hash aggregation — partial (map-side) combinable, so each input
    partition reduces its own duplicates before the single shuffle on
    the key.  The window-function formulation (row_number over
    key/seq desc) would shuffle every changelog row; this reduces first.
    ``(key, seq)`` must be unique — enforce upstream or pre-aggregate —
    otherwise the winner among seq ties is nondeterministic.
    """
    payload = [
        c for c in changes.columns
        if c not in set(key_cols) | {seq_col}
    ]
    compacted = changes.groupBy(*key_cols).agg(
        F.max(seq_col).alias(seq_col),
        *[
            F.expr(f"max_by({c}, {seq_col})").alias(c)
            for c in payload
        ],
    )
    return compacted.filter(F.col(op_col) != delete_op).drop(op_col)


def transition_topk(
    events: DataFrame,
    top_k: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition mining → (src_event, next_event,
    n_pairs, prob_milli, rk): per-key event streams ordered by
    (ts, tiebreak) yield consecutive (src → next) pairs; emit each
    source state's ``top_k`` successors by count with the exact
    integer transition probability.

    The clickstream/session model behind next-page prediction and
    funnel diagnosis: P(next | src) estimated from adjacent pairs.
    ``prob_milli = (1000·n_pairs) DIV n_src`` is exact integer
    arithmetic over the SAME pair universe both numerator and
    denominator (n_src counts outgoing pairs, not raw events, so a
    key's terminal event contributes no mass) — bit-identical across
    engines.  Ordering ties on ``ts`` break by ``tiebreak_col`` so the
    pair sequence is a pure function of the data, never of arrival or
    partition order (the q18 sessionization discipline).

    Plan: one `lead` window per key partition (parallel across keys, no
    global sort), one pair hash-agg (map-side combinable), one
    per-source agg for totals, one per-source window rank for the
    top-k cut (WindowGroupLimit pushes the rank filter) — all JVM,
    linear in |events|.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("src_event"),
            F.lead(type_col).over(w).alias("next_event"),
        )
        .filter(F.col("next_event").isNotNull())
        .groupBy("src_event", "next_event")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    totals = pairs.groupBy("src_event").agg(
        F.sum("n_pairs").alias("n_src")
    )
    wr = Window.partitionBy("src_event").orderBy(
        F.desc("n_pairs"), F.asc("next_event")
    )
    return (
        pairs.join(totals, "src_event")
        .select(
            "src_event",
            "next_event",
            "n_pairs",
            F.expr("(1000 * n_pairs) DIV n_src").alias("prob_milli"),
            F.row_number().over(wr).alias("rk"),
        )
        .filter(F.col("rk") <= top_k)
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    value_col: str = "val",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build from a CDC
    changelog → one validity interval per surviving version:
    (``key_col``, ``value_col``, valid_from, valid_to, is_current).

    The warehouse twin of :func:`apply_changelog`: instead of
    compacting to the latest snapshot, materialize the FULL version
    history — each upsert opens an interval at its ``seq_col``, the
    next change (upsert or delete) on the same key closes it
    (``valid_to`` = closing seq, exclusive; NULL = still open).
    No-op upserts (same op and value as the immediately preceding
    surviving row) are collapsed first, so back-to-back identical
    writes produce ONE interval, and consecutive tombstones collapse
    to one.  Delete rows close the prior interval but emit none.

    Plan: two windows over (key × seq) — a lag to null-safe-collapse
    no-ops, a lead for the closing seq — both partition-parallel
    across keys with no global sort; one filter.  Exactly the shape a
    Delta/Iceberg SCD2 MERGE generator needs, expressed as a pure
    declarative plan the optimizer fuses into a single sort per key
    partition.
    """
    w = Window.partitionBy(key_col).orderBy(seq_col)
    marked = changes.select(
        key_col,
        seq_col,
        value_col,
        op_col,
        (
            ~(
                F.col(value_col).eqNullSafe(F.lag(value_col).over(w))
                & F.col(op_col).eqNullSafe(F.lag(op_col).over(w))
            )
        ).alias("_chg"),
    ).filter("_chg")
    w2 = Window.partitionBy(key_col).orderBy(seq_col)
    return (
        marked.select(
            key_col,
            value_col,
            op_col,
            F.col(seq_col).alias("valid_from"),
            F.lead(seq_col).over(w2).alias("valid_to"),
        )
        .filter(F.col(op_col) != delete_op)
        .select(
            key_col,
            value_col,
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ts_col: str = "tus",
    seed_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Earliest-arrival time-respecting reachability (the temporal-graph
    / epidemic-tracing primitive) → (seed, node, arrival): over directed
    timestamped edges, node is reachable from seed iff a path exists
    whose edge timestamps STRICTLY increase, and ``arrival`` is the
    minimum achievable final timestamp within ``max_hops`` hops.

    Earlier arrival dominates — any continuation open to a later
    arrival is open to an earlier one — so per-round min-arrival
    relaxation is sound AND round-capped relaxation equals hop-capped
    path enumeration (what the recursive-CTE oracle replays).  Each
    round: frontier ⋈ edges on (node = src, edge ts > arrival) → min
    candidate per (seed, dst) → keep strict improvements only; the
    frontier is just the improved rows, the convergence probe is one
    scalar count, and per-round localCheckpoints truncate lineage (the
    bfs_distances / connected-components discipline).  Seeds start at
    arrival 0, so ``ts_col`` must be positive (epoch micros are).
    """
    e = (
        edges.select(
            F.col(src).alias("_es"),
            F.col(dst).alias("_ed"),
            F.col(ts_col).cast("long").alias("_et"),
        )
        .filter(F.col("_es") != F.col("_ed"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    arrival = (
        seeds.select(F.col(seed_col).alias("seed"))
        .distinct()
        .select(
            "seed",
            F.col("seed").alias("node"),
            F.lit(0).cast("long").alias("arrival"),
        )
        .localCheckpoint(eager=False)
    )
    frontier = arrival
    for _ in range(max_hops):
        cand = (
            frontier.join(e, frontier["node"] == e["_es"])
            .filter(F.col("_et") > F.col("arrival"))
            .groupBy("seed", F.col("_ed").alias("node"))
            .agg(F.min("_et").alias("cand"))
        )
        merged = (
            cand.join(arrival, ["seed", "node"], "left")
            .filter(
                F.col("arrival").isNull()
                | (F.col("cand") < F.col("arrival"))
            )
            .select("seed", "node", F.col("cand").alias("arrival"))
            .localCheckpoint(eager=False)
        )
        if merged.count() == 0:  # one action per hop (r6)
            break
        arrival = (
            arrival.join(merged, ["seed", "node"], "left_anti")
            .unionByName(merged)
            .localCheckpoint(eager=False)
        )
        frontier = merged
    return arrival.filter(F.col("node") != F.col("seed"))


def cusum_changepoints(
    series: DataFrame,
    series_cols: list[str],
    t_col: str,
    x_col: str,
    k_milli: int | None = None,
    h_milli: int = 4000,
) -> DataFrame:
    """Two-sided CUSUM drift detection over regular integer series →
    one row per (series, t): (x, s_pos, s_neg, alarm).

    The pipeline-monitoring primitive (Page 1954): a crawl source
    whose hourly document count drifts up (spam flood) or down (feed
    breakage) should alarm on SUSTAINED deviation, not single spikes —
    exactly what the CUSUM recurrences S⁺_t = max(0, S⁺_{t-1} + x_t−k)
    and S⁻_t = max(0, S⁻_{t-1} + k−x_t) accumulate.

    Spark-first: the recurrence is NOT computed iteratively — the
    classic prefix identity ``S⁺_t = cum_t − min(0, min_{j≤t} cum_j)``
    (and symmetrically S⁻ with the running max) turns both sides into
    one cumulative sum plus one running min/max per series: three
    partitioned window passes, no UDF, no loop, engine-exact in milli
    units (x is scaled ×1000 against the reference value ``k_milli`` —
    default: the series' own integer mean ⌊1000·Σx/T⌋, the in-control
    level).  ``alarm`` fires when either side reaches ``h_milli``.

    Scale: every window partitions by the series key — no global sort;
    state per series is O(1) columns.  Supply a GAP-FILLED series (the
    q92 spine discipline) — CUSUM over missing steps understates.
    """
    w = Window.partitionBy(*series_cols).orderBy(t_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    x_m = F.col(x_col).cast("long") * 1000
    if k_milli is None:
        ref = F.floor(
            (F.sum(x_m).over(Window.partitionBy(*series_cols)))
            / F.count("*").over(Window.partitionBy(*series_cols))
        ).cast("long")
    else:
        ref = F.lit(int(k_milli)).cast("long")
    cum = F.sum(x_m - ref).over(run)
    d = series.select(
        *series_cols,
        F.col(t_col),
        F.col(x_col).cast("long").alias("x"),
        cum.alias("_cum"),
    )
    s_pos = F.col("_cum") - F.least(
        F.lit(0).cast("long"), F.min("_cum").over(run)
    )
    s_neg = (
        F.greatest(F.lit(0).cast("long"), F.max("_cum").over(run))
        - F.col("_cum")
    )
    return d.select(
        *series_cols,
        t_col,
        "x",
        s_pos.alias("s_pos"),
        s_neg.alias("s_neg"),
        ((s_pos >= h_milli) | (s_neg >= h_milli)).alias("alarm"),
    )


def sprt_decisions(
    trials: DataFrame,
    series_cols: list[str],
    order_col: str,
    success_col: str,
    llr_pos_q20: int,
    llr_neg_q20: int,
    a_q20: int,
    b_q20: int,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per series → ONE row
    per series: (*series_cols, n_trials, decision
    'h1'|'h0'|'undecided', n_at_decision, llr_q20_at_decision).

    The sequential complement to the batch tests: deciding whether a
    crawl source's error rate / a model variant's click rate shifted
    should stop AS SOON as the evidence suffices (Wald 1945: SPRT
    minimizes expected sample size at both hypotheses) — not wait for
    a fixed-horizon batch.  Each Bernoulli trial adds a fixed
    log-likelihood-ratio increment: ``llr_pos_q20`` on success,
    ``llr_neg_q20`` on failure — the caller computes
    ⌊2²⁰·log2(p1/p0)⌋ and ⌊2²⁰·log2((1−p1)/(1−p0))⌋ ONCE (plus the
    Wald boundaries log2((1−β)/α), log2(β/(1−α))) and both engines use
    the identical integer literals, so the entire sequential walk is
    exact BIGINT — no runtime logs anywhere.

    Spark-first: the walk is a partitioned cumulative sum, the
    decision is the FIRST boundary crossing — one `min(order)` over
    crossing rows, then the row at that order; series that never cross
    report 'undecided' at their full horizon.  No loop, no state, no
    UDF; windows partition by the series key only.  ``order_col`` must
    be UNIQUE within a series (an event id, not a timestamp with ties)
    — it is both the walk order and the decision-row identity; ties
    would make "first crossing" ill-defined in any engine.
    """
    w = Window.partitionBy(*series_cols).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    inc = F.when(
        F.col(success_col).cast("boolean"), F.lit(int(llr_pos_q20))
    ).otherwise(F.lit(int(llr_neg_q20))).cast("long")
    walked = trials.select(
        *series_cols,
        F.col(order_col).alias("_t"),
        F.sum(inc).over(run).alias("_llr"),
        F.row_number().over(w).alias("_n"),
    )
    crossed = F.when(F.col("_llr") >= a_q20, F.lit("h1")).when(
        F.col("_llr") <= b_q20, F.lit("h0")
    )
    fam = Window.partitionBy(*series_cols)
    flagged = walked.select(
        *series_cols,
        "_t",
        "_llr",
        "_n",
        crossed.alias("_dec"),
        F.min(F.when(crossed.isNotNull(), F.col("_t"))).over(fam).alias(
            "_first"
        ),
        F.max("_n").over(fam).alias("_total"),
    )
    decided = flagged.filter(F.col("_t") == F.col("_first")).select(
        *series_cols,
        F.col("_total").alias("n_trials"),
        F.col("_dec").alias("decision"),
        F.col("_n").alias("n_at_decision"),
        F.col("_llr").alias("llr_q20_at_decision"),
    )
    open_ = (
        flagged.filter(F.col("_first").isNull())
        .filter(F.col("_n") == F.col("_total"))
        .select(
            *series_cols,
            F.col("_total").alias("n_trials"),
            F.lit("undecided").alias("decision"),
            F.col("_n").alias("n_at_decision"),
            F.col("_llr").alias("llr_q20_at_decision"),
        )
    )
    return decided.unionByName(open_)
