"""Bounded-state sketches: KMV distinct-count and count-min frequency.

The 100 TB motivation is the same for both: exact ``countDistinct`` /
``groupBy(key)`` over a web corpus shuffles the full key population —
with Zipfian keys that means head-entity reducers holding 10^8+ rows.
These operators bound the state by construction:

- :func:`kmv_distinct` keeps only the k smallest distinct key hashes
  (per group), a ``TakeOrderedAndProject``-shaped reduction whose state
  is k longs regardless of cardinality; the estimate is the classic
  K-minimum-values ``(k-1) * M / h_(k)`` (Bar-Yossef et al., RANDOM'02).
- :func:`count_min_build` folds the corpus into a ``depth x width``
  integer grid (Cormode & Muthukrishnan, J.Alg'05) — a groupBy whose
  key space is FIXED at depth*width cells, so map-side combine collapses
  every partition to at most that many rows and no reducer ever sees a
  head key's full mass; :func:`count_min_query` broadcast-joins query
  keys against the grid and takes the per-lane min.

Both use the portable md5 hash family (``dedup.porthash64`` /
``porthash_lanes``), so estimates are bit-identical in ANSI SQL — the
approximation itself is oracle-checkable, the repo's q26 standard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .dedup import porthash64, porthash_lanes

#: size of the 60-bit portable hash space (2^60)
HASH_SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """K-minimum-values distinct-count estimate →
    (``by``..., n_kept, kth_hash, n_distinct_est).

    Exact when a group has fewer than ``k`` distinct keys (the sketch
    degenerates to the distinct set itself); otherwise the estimate is
    ``floor((k-1) * 2^60 / h_(k))``.  ``(k-1) * 2^60`` is exactly
    representable as a double for any practical k, the division is one
    IEEE-correctly-rounded op, and floor (unlike round, whose half-way
    rule differs between engines) is unambiguous — the estimate is
    bit-identical cross-engine.

    Plan shape: distinct (group, hash) → per-group ordered window
    capped at k rows (hash-partitioned by group; Catalyst inserts
    WindowGroupLimit, so each map task keeps only its local top-k per
    group BEFORE the exchange — plan-tested).  The global (no ``by``)
    case instead uses ``orderBy(h).limit(k)`` → TakeOrderedAndProject:
    a bounded per-partition heap then a k-row merge, never a
    single-partition window (WindowGroupLimit does not fire on a
    constant partition spec — measured, not assumed).
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    gcols = list(by or [])
    h = porthash64(F.col(key_col).cast("string"), "kmv")
    # NULL keys are ignored (countDistinct semantics) — and must be:
    # a NULL hash would sort first in Spark but last in ANSI SQL,
    # silently skewing the kth order statistic cross-engine.
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(*gcols, h.alias("_h"))
        .distinct()
    )
    if gcols:
        w = Window.partitionBy(*gcols).orderBy("_h")
        topk = hashes.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k
        )
    else:
        topk = hashes.orderBy("_h").limit(k)
    est_saturated = F.floor(
        F.lit(float((k - 1) * HASH_SPACE)) / F.max("_h")
    ).cast("long")
    return topk.groupBy(*gcols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("_h").alias("kth_hash"),
        F.when(F.count("*") < k, F.count("*"))
        .otherwise(est_saturated)
        .cast("long")
        .alias("n_distinct_est"),
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold rows into a count-min grid → (lane, cell, c).

    At most ``depth * width`` output rows no matter the input size; the
    groupBy key space is the grid itself, so partial aggregation bounds
    every exchange at depth*width rows per map task — Zipf-head-proof by
    construction.  ``weight_col`` accumulates weighted counts.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # NULL keys are ignored: their NULL-cell grid rows could never be
    # probed (NULL never equi-joins) and would only pollute the grid.
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        h1.alias("_h1"), h2.alias("_h2"), w.alias("_w")
    ).select(
        F.posexplode(F.array(*[lane % width for lane in lanes])).alias(
            "lane", "cell"
        ),
        "_w",
    )
    return keyed.groupBy("lane", "cell").agg(
        F.sum("_w").cast("long").alias("c")
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    percents: list[int] | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Log2-histogram quantile sketch →
    (``by``..., percent, n, est) — one row per (group, percent).

    Bins a non-negative integer value by its binary length (bin b holds
    ``[2^(b-1), 2^b)``; bin 1 holds {0, 1}), so per-group state is at
    most 64 counter rows no matter how many rows flow in — the
    bounded-memory substitute for an exact percentile whose sort would
    shuffle the full column at 100 TB.  The estimate is the target
    bin's lower bound plus INTEGER-interpolated offset
    ``lower + (offset * width) div count`` at 0-indexed rank
    ``((n-1) * percent) div 100`` — every quantity is an integer, so
    the approximation itself replays bit-identically in ANSI SQL (the
    q44/q53 fixed-point idiom; contrast ``approx_percentile``, whose
    sketch is engine-private).

    Plan shape: one groupBy onto the bin key space (map-side combine
    caps every exchange at 64 rows/group/task), then windows and the
    percent cross join run over those 64-row groups — negligible.
    Negative values are rejected at runtime (binary-length binning is
    undefined for them).
    """
    pcts = list(percents or [50, 90, 99])
    if any(p < 0 or p > 100 for p in pcts):
        raise ValueError("percents must be within [0, 100]")
    gcols = list(by or [])
    v = F.col(value_col).cast("long")
    # NULL values are ignored (aggregate semantics); a NULL bin would
    # sort first in Spark but last in ANSI SQL and skew the cumulative.
    binned = df.filter(v.isNotNull()).select(
        *gcols,
        F.when(
            v < 0,
            F.raise_error(
                F.lit(f"histogram_quantiles: negative {value_col}")
            ),
        )
        .otherwise(F.length(F.conv(v, 10, 2)))
        .cast("int")
        .alias("_bin"),
    )
    hist = binned.groupBy(*gcols, "_bin").agg(
        F.count("*").cast("long").alias("_c")
    )
    part = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    )
    cum = hist.withColumn(
        "_cum", F.sum("_c").over(part.orderBy("_bin"))
    ).withColumn("_n", F.sum("_c").over(part))
    spark = df.sparkSession
    pdf = F.broadcast(
        spark.createDataFrame([(int(p),) for p in pcts], "percent int")
    )
    j = (
        cum.join(pdf)
        .withColumn("_rank", F.expr("(_n - 1) * percent div 100"))
        .filter(
            (F.col("_rank") >= F.col("_cum") - F.col("_c"))
            & (F.col("_rank") < F.col("_cum"))
        )
        .withColumn(
            "_lower",
            F.expr(
                "CASE WHEN _bin = 1 THEN 0L"
                " ELSE shiftleft(1L, _bin - 1) END"
            ),
        )
        .withColumn(
            "_width",
            F.expr(
                "CASE WHEN _bin = 1 THEN 2L"
                " ELSE shiftleft(1L, _bin - 1) END"
            ),
        )
        .withColumn("_off", F.col("_rank") - (F.col("_cum") - F.col("_c")))
    )
    return j.select(
        *gcols,
        "percent",
        F.col("_n").alias("n"),
        F.expr("_lower + (_off * _width) div _c").cast("long").alias("est"),
    )


def count_min_query(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 1024
) -> DataFrame:
    """Point-query the grid → (``key_col``, est).

    ``est`` is the per-lane minimum — an upper bound on the true count
    with the usual (e/width, 1-e^-depth) guarantee.  The sketch side is
    tiny (depth*width rows) and broadcast; the probe is |keys| * depth
    rows joined on (lane, cell).
    """
    depth = sketch.agg(F.max("lane")).first()[0] + 1
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    probes = keys.select(
        F.col(key_col), h1.alias("_h1"), h2.alias("_h2")
    ).select(
        key_col,
        F.posexplode(F.array(*[lane % width for lane in lanes])).alias(
            "lane", "cell"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["lane", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int = 16384, depth: int = 4
) -> DataFrame:
    """Portable Bloom filter build → (pos) — the distinct set bit
    positions, at most ``num_bits`` rows no matter the key count.

    Lane hashes come from the md5 rotate/xor family
    (:func:`~.dedup.porthash_lanes`), so an ANSI-SQL oracle can rebuild
    the identical filter and the no-false-negative guarantee is
    checkable, unlike Spark's engine-private runtime bloom
    (``spark.sql.optimizer.runtime.bloomFilter``), which this operator
    mirrors for cases where the filter must cross a job/engine boundary
    (e.g. ship tiny crawl-frontier filters to the next batch).
    """
    if num_bits < 2 or depth < 1:
        raise ValueError("need num_bits >= 2 and depth >= 1")
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    # NULL keys set no bits (a NULL lane would crash the driver-side
    # word packer in bloom_prune and can never be probed anyway).
    return (
        keys.filter(F.col(key_col).isNotNull())
        .select(h1.alias("_h1"), h2.alias("_h2"))
        .select(
            F.explode(
                F.array(*[(lane % num_bits).cast("int") for lane in lanes])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_prune(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    num_bits: int = 16384,
    depth: int = 4,
) -> DataFrame:
    """Keep rows whose key MAY be in the filter (all ``depth`` bits
    set) — no false negatives, tunable false positives.

    The positions collect is bounded by ``num_bits`` (a sketch
    artifact, the scalar-scale collect class this repo allows); the
    probe side is then a SHUFFLE-FREE narrow filter, exactly how a
    pre-join pruning filter should look before an expensive exact join
    at 100 TB.  NULL probe keys are pruned (their bit-test is NULL →
    filtered) — consistent with the exact join, where NULL never
    matches either.

    Two per-row cost traps are designed out, worth 10× on a 600k-row
    probe (13.9s → 1.2s measured):

    1. The mask is an ``np.int64`` array literal — a true constant
       ``long[]`` Literal.  A plain ``F.lit([...])`` python list
       becomes a per-row CreateArray; a long string literal is worse
       (``substring`` walks the string from char 0 — O(position) per
       probe).
    2. ``_h1``/``_h2`` carry a ``+ 0 * monotonically_increasing_id()``
       no-op taint.  Without it, predicate pushdown rewrites the bit
       tests through the projections and FilterExec — which, unlike
       ProjectExec, performs NO subexpression elimination — re-derives
       the md5 pipeline 2×depth× PER ROW.  The non-deterministic term
       pins the filter above the hash projection so the md5 runs once;
       the optimizer cannot fold ``x * 0`` away because x could, for
       all it proves, be null.
    """
    words = [0] * ((num_bits + 31) // 32)
    for (p,) in positions.select("pos").collect():
        words[p // 32] |= 1 << (p % 32)
    import numpy as np

    mask = F.lit(np.array(words, dtype=np.int64))
    h1, h2, lanes = porthash_lanes(F.col(key_col).cast("string"), depth)
    taint = F.monotonically_increasing_id() * 0
    base = df.select(
        *df.columns, (h1 + taint).alias("_h1"), (h2 + taint).alias("_h2")
    )
    probed = base.select(
        *df.columns,
        *[
            (lane % num_bits).cast("int").alias(f"_p{i}")
            for i, lane in enumerate(lanes)
        ],
    )
    cond = None
    for i in range(depth):
        c = (
            F.element_at(
                mask, F.expr(f"cast(_p{i} div 32 as int) + 1")
            ).bitwiseAND(F.expr(f"shiftleft(1L, _p{i} % 32)"))
            != 0
        )
        cond = c if cond is None else (cond & c)
    return probed.filter(cond).select(*df.columns)


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    set_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style set algebra over per-group KMV sketches →
    (set_a, set_b, n_merged, matches, union_est, inter_est,
    jaccard_milli) for every unordered group pair: estimate
    |A∪B|, |A∩B|, and Jaccard WITHOUT ever shuffling the full key
    populations — each group is reduced to its k smallest distinct key
    hashes first, and all pair arithmetic runs over ≤2k-row sketches.

    The theta rule (Dasgupta et al., the Theta-Sketch Framework): merge
    the two sketches, keep the k smallest hashes; theta = the kth value;
    ``matches`` = how many of those k appear in BOTH sketches;
    ``union_est = floor((k−1)·2⁶⁰ / theta)``;
    ``inter_est = (matches · union_est) DIV k``;
    ``jaccard_milli = (1000 · matches) DIV k``.  When the merged sketch
    is NOT saturated (< k distinct hashes, so neither input sketch was
    saturated) every estimate degenerates to the EXACT count — matching
    :func:`kmv_distinct`'s exactness contract.  Same portable md5 hash
    (seed ``kmv``), same floor division — bit-identical in ANSI SQL.

    Plan: distinct (set, hash) → per-set WindowGroupLimit top-k (k rows
    per set leave the map side) → pair fan-out via two equi-joins
    against the (tiny) pair frame → per-pair hash-dedup + window rank ≤
    k → one agg.  Everything after the first distinct is bounded by
    #sets·k rows; the full key universe is touched exactly once.
    """
    if k < 2:
        raise ValueError("kmv_set_ops needs k >= 2")
    h = porthash64(F.col(key_col).cast("string"), "kmv")
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(set_col).alias("s"), h.alias("_h"))
        .distinct()
    )
    w = Window.partitionBy("s").orderBy("_h")
    topk = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    ).select("s", "_h")
    sets = topk.select("s").distinct()
    pairs = (
        sets.select(F.col("s").alias("set_a"))
        .crossJoin(F.broadcast(sets.select(F.col("s").alias("set_b"))))
        .filter(F.col("set_a") < F.col("set_b"))
    )
    ma = pairs.join(
        topk.select(F.col("s").alias("set_a"), "_h"), "set_a"
    ).select("set_a", "set_b", "_h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    mb = pairs.join(
        topk.select(F.col("s").alias("set_b"), "_h"), "set_b"
    ).select("set_a", "set_b", "_h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ma.unionByName(mb)
        .groupBy("set_a", "set_b", "_h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("set_a", "set_b").orderBy("_h")
    ranked = merged.withColumn("_rn", F.row_number().over(wp)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy("set_a", "set_b").agg(
        F.count("*").cast("long").alias("n_merged"),
        F.sum((F.col("in_a") * F.col("in_b"))).cast("long").alias("matches"),
        F.max("_h").alias("theta"),
    )
    saturated = F.col("n_merged") >= k
    union_est = F.when(
        saturated,
        F.floor(F.lit(float((k - 1) * HASH_SPACE)) / F.col("theta")).cast(
            "long"
        ),
    ).otherwise(F.col("n_merged"))
    return (
        agg.withColumn("union_est", union_est.cast("long"))
        .select(
            "set_a",
            "set_b",
            "n_merged",
            "matches",
            "union_est",
            F.when(
                saturated,
                F.expr(f"(matches * union_est) DIV {k}"),
            )
            .otherwise(F.col("matches"))
            .cast("long")
            .alias("inter_est"),
            F.when(
                saturated, F.expr(f"(1000 * matches) DIV {k}")
            )
            .otherwise(F.expr("(1000 * matches) DIV n_merged"))
            .cast("long")
            .alias("jaccard_milli"),
        )
    )


def kmv_sliding_distinct(
    df: DataFrame,
    key_col: str,
    day_col: str,
    window_days: int = 7,
    k: int = 64,
) -> DataFrame:
    """Sliding-window distinct counting by MERGING daily KMV sketches →
    per window-end day: (win_end, n_days_merged, n_kept, kth_hash,
    n_distinct_est): the k smallest distinct key hashes are kept PER
    DAY (bounded state, exactly :func:`kmv_distinct`), then each day's
    sketch fans out to the ≤``window_days`` windows it belongs to and
    the per-window merge re-ranks to the k smallest — the mergeability
    property that makes sketches the only viable sliding-distinct at
    100 TB (the exact alternative re-shuffles every window's full key
    population ``window_days`` times).

    Merging is LOSSLESS for the estimator: a hash among the window's k
    smallest distinct values is necessarily among the k smallest of any
    day it appeared in (day's hash set ⊆ window's), so no daily top-k
    truncation can drop it.  Unsaturated windows degenerate to exact
    counts; same portable md5 hash, same floor arithmetic — replayed
    verbatim in ANSI SQL.  Window ends are emitted only for days
    present in the data.
    """
    if k < 2:
        raise ValueError("kmv_sliding_distinct needs k >= 2")
    h = porthash64(F.col(key_col).cast("string"), "kmv")
    daily = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(day_col).cast("long").alias("_d"), h.alias("_h"))
        .distinct()
    )
    wd = Window.partitionBy("_d").orderBy("_h")
    topk = (
        daily.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") <= k)
        .select("_d", "_h")
    )
    days = daily.select("_d").distinct().select(
        F.col("_d").alias("win_end")
    )
    fan = (
        topk.select(
            "_d",
            "_h",
            F.explode(
                F.expr(f"sequence(_d, _d + {window_days - 1})")
            ).alias("win_end"),
        )
        .join(F.broadcast(days), "win_end")
    )
    wp = Window.partitionBy("win_end").orderBy("_h")
    merged = (
        fan.groupBy("win_end", "_h")
        .agg(F.countDistinct("_d").alias("_nd"))
        .withColumn("_rn", F.row_number().over(wp))
    )
    ndays = fan.groupBy("win_end").agg(
        F.countDistinct("_d").cast("long").alias("n_days_merged")
    )
    est = (
        merged.filter(F.col("_rn") <= k)
        .groupBy("win_end")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("_h").alias("kth_hash"),
        )
        .select(
            "win_end",
            "n_kept",
            "kth_hash",
            F.when(
                F.col("n_kept") < k, F.col("n_kept")
            )
            .otherwise(
                F.floor(
                    F.lit(float((k - 1) * HASH_SPACE)) / F.col("kth_hash")
                )
            )
            .cast("long")
            .alias("n_distinct_est"),
        )
    )
    return est.join(ndays, "win_end").select(
        "win_end", "n_days_merged", "n_kept", "kth_hash", "n_distinct_est"
    )


def _hll_alpha(m: int) -> float:
    """Canonical HyperLogLog bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_constants(p: int) -> tuple[float, float]:
    """(c_milli, lc_threshold) for :func:`hll_distinct` — folded in
    Python ONCE so the Spark plan and any SQL oracle embed the exact
    same shortest-round-trip double literals (the cross-engine
    determinism contract: every remaining op is one correctly-rounded
    IEEE step)."""
    m = 1 << p
    c = _hll_alpha(m) * float(2 ** (61 + p))
    return 1000.0 * c, c / (2.5 * m)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    p: int = 6,
    by: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog distinct-count estimate → (``by``..., m, n_zero,
    harm_num, regime, est_milli): the register-based COMPLEMENT of
    :func:`kmv_distinct` — fixed O(m) state per group regardless of
    cardinality, and registers merge by element-wise MAX (the
    mergeability KMV lacks: two hosts' HLL states union losslessly,
    the property that makes this THE sketch shipped between crawl
    shards).

    All state is exact integers on the portable md5 hash: register
    ``j = h mod m`` (m = 2^p), ``rho`` = leading-zero rank of the
    remaining 60-p bits (via ``length(bin(w))`` — both engines print
    binary without leading zeros), ``harm_num`` = Σ_j 2^(K - rho_j)
    with K = 61-p and empty registers at rho=0 — i.e. the harmonic
    denominator Σ 2^-rho scaled by the exact power 2^K, ≤ 2^61, no
    overflow.  The estimate is Flajolet's alpha·m²/Σ2^-rho with the
    standard small-range linear-counting correction, emitted in MILLI
    units: the raw branch is ONE correctly-rounded IEEE division of a
    Python-folded double constant by ``harm_num`` then floor (the
    :func:`kmv_distinct` determinism argument), the linear-counting
    branch replaces ``ln`` (libm, last-ulp engine-dependent) with
    :func:`flog2_q20` — the exact integer log2-by-repeated-squaring
    fixed point (error < 2^-20 bits, so the LC estimate is within
    m·2^-20·ln2 < 0.02 of the true formula even at p=14; the coarser
    milli-log2 used by ordinal scores elsewhere errs up to 86
    milli-bits, which LC would amplify by m) — deterministic
    cross-engine by construction, never via transcendental parity.

    Plan shape: one narrow hash projection → groupBy (group, register)
    max(rho) — partial-aggregated map-side, at most m rows per group
    survive — then one m-row-per-group rollup.  A 10^12-key group
    costs the same 2^p rows after the first combine as a 10^3-key
    group.
    """
    if not 4 <= p <= 14:
        raise ValueError("hll_distinct needs 4 <= p <= 14")
    gcols = list(by or [])
    m = 1 << p
    big_k = 61 - p
    h = porthash64(F.col(key_col).cast("string"), "hll")
    # integer shift, NOT h/m: double division would round away low
    # bits of the 60-bit hash above 2^53 and corrupt rho near zero.
    w = F.shiftright(h, p)
    rho = (
        F.when(w == 0, F.lit(big_k))
        .otherwise(F.lit(big_k) - F.length(F.bin(w)))
        .cast("int")
    )
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(*gcols, (h % m).cast("int").alias("_reg"), rho.alias("_rho"))
        .groupBy(*gcols, "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    present = regs.groupBy(*gcols).agg(
        F.count("*").cast("long").alias("_n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {big_k} - _rho)")
        )
        .cast("long")
        .alias("_present_sum"),
    )
    n_zero = (F.lit(m) - F.col("_n_present")).cast("long")
    harm = (
        F.col("_present_sum")
        + n_zero * F.lit(1 << big_k).cast("long")
    ).cast("long")
    # Python-folded double constants: both engines parse the identical
    # shortest-round-trip literal, so every downstream op is one
    # correctly-rounded IEEE step — bit-identical cross-engine.
    c_milli, lc_threshold = hll_constants(p)

    linear = (F.col("_n_zero") > 0) & (
        F.col("harm_num").cast("double") >= F.lit(lc_threshold)
    )
    # LC estimate = m·ln(m/n_zero)·1000 = m·(p·2^20 − flog2_q20(nz))
    # ·693147 ∕ (2^20·10^6)·1000, all integer: m ≤ 2^14, Δ ≤ 14·2^20,
    # ×693147 peaks < 2^58 — no BIGINT overflow.
    lc_est = F.expr(
        f"CAST(m * ({p << 20} - ({flog2_q20_expr('_n_zero')}))"
        " * 693147 DIV 1048576 DIV 1000 AS BIGINT)"
    )
    return (
        present.select(
            *gcols,
            F.lit(m).cast("long").alias("m"),
            n_zero.alias("_n_zero"),
            harm.alias("harm_num"),
        )
        .select(
            *gcols,
            "m",
            F.col("_n_zero").alias("n_zero"),
            "harm_num",
            F.when(linear, F.lit("linear"))
            .otherwise(F.lit("raw"))
            .alias("regime"),
            F.when(linear, lc_est)
            .otherwise(
                F.floor(F.lit(c_milli) / F.col("harm_num")).cast("long")
            )
            .alias("est_milli"),
        )
    )


def flog2_q20_expr(col: str) -> str:
    """Spark-SQL expression string: exact-integer log2 of a positive
    BIGINT column in Q20 fixed point (20 binary fraction bits), by the
    classic repeated-squaring bit extraction — floor(log2 x)·2^20 plus
    20 fraction bits, absolute error < 2^-20 + 2^-29 bits.

    Why not the shared milli-log2: that one is a SINGLE linear
    interpolation across the whole octave (error ≤ 86 milli-bits) —
    fine for ordinal importance scores, fatal where the log feeds a
    multiplier of 2^p (HLL linear counting: the error lands ×m in the
    count estimate).  Here the mantissa is normalized to [2^30, 2^31)
    and squared 20 times (peak 2^62 — no overflow), emitting one
    fraction bit per squaring; per-step >>30 truncation contributes
    geometrically-discounted error (the bit emitted at step i weighs
    2^-i), bounded by 2^-29 total.

    One `aggregate` fold, NOT 20 chained projections: a projection
    chain would let CollapseProject inline each step's 3 uses of the
    squared value into the next — a 3^20 expression tree.  The fold is
    a constant-size lambda looped at runtime.  Domain: 1 ≤ x < 2^62
    (above 2^31 the mantissa is right-shifted into [2^30, 2^31), a
    ≤ 2^-30 relative truncation — under the method's own 2^-20 error).
    The identical unrolled integer recurrence runs in DuckDB (see
    __spark_entry__._flog2_sql_ctes).
    """
    e = f"(length(bin({col})) - 1)"
    y0 = (
        f"CASE WHEN {e} <= 30"
        f" THEN shiftleft(CAST({col} AS BIGINT), 30 - {e})"
        f" ELSE shiftright(CAST({col} AS BIGINT), {e} - 30) END"
    )
    return (
        f"CAST({e} AS BIGINT) * 1048576 + aggregate("
        f" sequence(1, 20),"
        f" named_struct("
        f"  'y', {y0},"
        f"  'fr', CAST(0 AS BIGINT)),"
        f" (acc, i) -> named_struct("
        f"  'y', CASE WHEN shiftright(acc.y * acc.y, 30) >= 2147483648"
        f"       THEN shiftright(acc.y * acc.y, 31)"
        f"       ELSE shiftright(acc.y * acc.y, 30) END,"
        f"  'fr', acc.fr * 2 +"
        f"   CASE WHEN shiftright(acc.y * acc.y, 30) >= 2147483648"
        f"        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),"
        f" acc -> acc.fr)"
    )


def ams_f2(
    items: DataFrame,
    item_col: str,
    by: list[str] | None = None,
    lanes: int = 16,
    seed: str = "ams",
) -> DataFrame:
    """AMS second-moment (F₂) sketch per group → (*by, f2_est,
    f2_exact, n_lanes): the tug-of-war estimate of Σ_x f_x² next to
    the exact value.

    F₂ = Σ f² is the self-join size / skew barometer: it predicts the
    output of an equi-join on this key, and spiking F₂ with flat
    counts is the fingerprint of an emerging hot key — the quantity
    the skew.py salting decisions care about, maintainable in O(lanes)
    space on a stream.  AMS (Alon-Matias-Szegedy, STOC'96): each lane
    keeps S_l = Σ_x f_x·s_l(x) with 4-wise-independent signs s_l ∈
    {±1}; E[S²] = F₂ exactly, variance shrinks by averaging lanes.

    Everything integer: signs from the parity bit of the portable md5
    hash (1 − 2·(h % 2)), lane sums are plain BIGINT aggregations
    (each a per-ROW ±1, so multiplicities weight themselves — no
    distinct anywhere), and the estimate is ⌊Σ_l S_l² / lanes⌋ by
    BIGINT floor division.  The per-group sketch state is ``lanes``
    longs — mergeable across shards by ADDITION (S is linear in the
    data), the property count-distinct sketches get from max-merge and
    F₂ needs from linearity.

    Shape: one explode (×lanes), two map-side-combinable groupBys, one
    tiny join with the exact side.  Overflow: |S| ≤ N per group, so
    S²·... needs 2·log2(N)+log2(lanes) < 63 — fine to N ≈ 10⁹ rows
    per group.
    """
    from .dedup import porthash64

    gcols = list(by or [])
    lane = F.explode(F.sequence(F.lit(1), F.lit(int(lanes)))).alias("_l")
    h = porthash64(
        F.concat_ws(
            ":", F.col(item_col).cast("string"), F.col("_l").cast("string")
        ),
        seed,
    )
    sgn = (F.lit(1) - F.lit(2) * (h % 2)).cast("long")
    lane_sums = (
        items.select(*gcols, F.col(item_col), lane)
        .select(*gcols, F.col("_l"), sgn.alias("_s"))
        .groupBy(*gcols, "_l")
        .agg(F.sum("_s").cast("long").alias("_S"))
    )
    est = (
        lane_sums.groupBy(*gcols)
        .agg(F.sum(F.col("_S") * F.col("_S")).cast("long").alias("_ss"))
        .select(
            *gcols,
            # DIV, not floor(double /): exact past 2^53
            F.expr(f"_ss div {int(lanes)}").cast("long").alias("f2_est"),
        )
    )
    exact = (
        items.groupBy(*gcols, item_col)
        .agg(F.count("*").cast("long").alias("_c"))
        .groupBy(*gcols)
        .agg(F.sum(F.col("_c") * F.col("_c")).cast("long").alias("f2_exact"))
    )
    joined = (
        est.join(exact, gcols) if gcols else est.crossJoin(exact)
    )
    return joined.select(
        *gcols, "f2_est", "f2_exact",
        F.lit(int(lanes)).alias("n_lanes"),
    )
