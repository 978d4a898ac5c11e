"""Stage 6 — graph/report analytics over the triple/edge tables.

Each operator is the Spark-first re-expression of a reference report
(SURVEY.md §2 C/D/E rows); all are single declarative plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def cooccurrence_pairs(
    edges: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "obj",
) -> DataFrame:
    """Upper-triangular co-occurrence pair counts (C1 + D1).

    Parity: self equi-join on doc with residual ``a <= b`` then
    count(distinct doc) per pair
    (/root/reference/analyze_satellites_used_together.py:56-70).
    Spark shape: hash/sort-merge join on the equi key; the ``<=`` stays a
    residual predicate; partial aggregation is free.
    """
    a = edges.select(F.col(doc_col).alias("doc"), F.col(entity_col).alias("ea"))
    b = edges.select(F.col(doc_col).alias("doc"), F.col(entity_col).alias("eb"))
    return (
        a.join(b, "doc")
        .filter(F.col("ea") <= F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.countDistinct("doc").alias("n_docs"))
    )


def year_entity_vectors(
    weighted_edges: DataFrame,
    doc_col: str = "doc_id",
    year_col: str = "year",
    entity_col: str = "entity",
    weight_col: str = "weight",
    power: float = 4.0,
) -> DataFrame:
    """Per-year power-normalized entity weight vectors (D5 + I1).

    Reference shape: ORDER BY doc then flush-per-doc with power_normalize,
    accumulated into a per-year vector
    (/root/reference/analyze_subject_vector_by_year.py:141-201,
    /root/reference/affiliation_vector_transform.py:6-29).

    Spark shape: the manual sort/flush IS hash aggregation — one window to
    normalize within doc, one groupBy to sum per (year, entity).  The
    all-zero edge case (sum of clipped weights == 0 → contribute 0)
    matches the reference's zero-vector return.
    """
    clipped = F.pow(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(power))
    w = Window.partitionBy(doc_col)
    normalized = weighted_edges.select(
        F.col(year_col).alias("year"),
        F.col(entity_col).alias("entity"),
        F.when(
            F.sum(clipped).over(w) > 0.0, clipped / F.sum(clipped).over(w)
        )
        .otherwise(F.lit(0.0))
        .alias("nw"),
    )
    return normalized.groupBy("year", "entity").agg(
        F.sum("nw").alias("weight")
    )


def column_normalize(
    year_vectors: DataFrame,
    year_col: str = "year",
    weight_col: str = "weight",
) -> DataFrame:
    """Each year's weights sum to 1 (D14,
    /root/reference/analyze_subject_vector_by_year.py:273-280)."""
    w = Window.partitionBy(year_col)
    total = F.sum(weight_col).over(w)
    return year_vectors.withColumn(
        "share",
        F.when(total > 0.0, F.col(weight_col) / total).otherwise(F.lit(0.0)),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """row_number window + rank filter (E1/E2/E3).

    Parity: /root/reference/report_top_affiliations_by_affiliation_type.py:
    102-122 (ORDER BY score DESC, text ASC).  Catalyst's
    InferWindowGroupLimit turns the rank-filter into per-partition top-k.
    """
    order = [
        F.asc(order_col) if ascending else F.desc(order_col),
    ]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def copublishing_matrix(
    author_vectors: DataFrame,
    doc_col: str = "doc_id",
    author_col: str = "author",
    entity_col: str = "entity",
    weight_col: str = "weight",
) -> DataFrame:
    """Pairwise author-type co-publishing weights without enumerating pairs
    (D6/D7).

    Preserves the reference's algebraic identity
    M += (Σv)(Σv)ᵀ − Σ vvᵀ over authors within a doc
    (/root/reference/analyze_affiliation_type_copublishing.py:109-120) —
    the O(a·k) rewrite Catalyst would never find on its own:

      sum-term  : S[doc, e]   = Σ_authors v[e]
      diag-term : Q[doc,e,e'] = Σ_authors v[e]·v[e']
      result    : M[e, e']    = Σ_docs ( S[e]·S[e'] − Q[e,e'] )

    Expressed as two joins on the (small) per-doc marginals — no a² blowup.
    """
    # per-(doc, author, entity) weights assumed pre-aggregated
    per_author = author_vectors.groupBy(doc_col, author_col, entity_col).agg(
        F.sum(weight_col).alias("w")
    )
    # S[doc, e]
    doc_sums = per_author.groupBy(doc_col, entity_col).agg(
        F.sum("w").alias("s")
    )
    # S·Sᵀ per doc
    ssq = (
        doc_sums.alias("x")
        .join(doc_sums.alias("y"), doc_col)
        .select(
            F.col(f"x.{entity_col}").alias("ea"),
            F.col(f"y.{entity_col}").alias("eb"),
            (F.col("x.s") * F.col("y.s")).alias("prod"),
        )
    )
    # Σ vvᵀ per doc (join within author)
    vvt = (
        per_author.alias("x")
        .join(per_author.alias("y"), [doc_col, author_col])
        .select(
            F.col(f"x.{entity_col}").alias("ea"),
            F.col(f"y.{entity_col}").alias("eb"),
            (F.col("x.w") * F.col("y.w")).alias("prod"),
        )
    )
    plus = ssq.groupBy("ea", "eb").agg(F.sum("prod").alias("p"))
    minus = vvt.groupBy("ea", "eb").agg(F.sum("prod").alias("q"))
    return (
        plus.join(minus, ["ea", "eb"], "left")
        .select(
            "ea",
            "eb",
            (F.col("p") - F.coalesce(F.col("q"), F.lit(0.0))).alias("weight"),
        )
    )


def cumulative_by_year(
    counts: DataFrame, year_col: str = "year", value_col: str = "n"
) -> DataFrame:
    """Running total over years (I7,
    /root/reference/plot_publication_geography_figures.py:243)."""
    w = Window.orderBy(year_col).rowsBetween(Window.unboundedPreceding, 0)
    return counts.withColumn("cumulative", F.sum(value_col).over(w))


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel → one row per stage: (stage, name,
    n_users, conv_milli).  A user reaches stage k when an event of
    stage k's type occurs STRICTLY AFTER their earliest qualifying
    event of stage k−1 (the classic funnel recurrence: each stage
    keeps the earliest qualifying timestamp, so the count is the
    maximal set of users with an ordered chain).  ``conv_milli`` is
    the integer permille of stage-1 reachers.

    Plan shape: per stage one equi-join on the user key + one min-ts
    aggregate — k−1 joins total, all keyed on ``user_col`` (AQE can
    co-locate them), no windows, no per-user event arrays; stage
    frames shrink monotonically so later joins are cheaper.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    frames = [cur]
    for s in stages[1:]:
        cur = (
            events.filter(F.col(type_col) == s)
            .join(cur.select(user_col, F.col("_t").alias("_prev")), user_col)
            .filter(F.col(ts_col) > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        frames.append(cur)
    base = frames[0].agg(F.count("*").cast("long").alias("_n1"))
    out = None
    for i, (name, fr) in enumerate(zip(stages, frames), start=1):
        row = (
            fr.agg(F.count("*").cast("long").alias("n_users"))
            .select(
                F.lit(i).cast("long").alias("stage"),
                F.lit(name).alias("name"),
                "n_users",
            )
        )
        out = row if out is None else out.unionByName(row)
    return (
        out.crossJoin(F.broadcast(base))
        .select(
            "stage",
            "name",
            "n_users",
            F.expr("(1000 * n_users) div nullif(_n1, 0)")
            .cast("long")
            .alias("conv_milli"),
        )
    )


def _grouped_median(counts: DataFrame, value_col: str) -> DataFrame:
    """Exact lower median per group from a (g, value, c) count table:
    cumulative count over the DISTINCT values (vocab-sized window, never
    a data-sized sort), median = min value whose 2*cum >= n+1."""
    w_cum = (
        Window.partitionBy("g")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("g")
    return (
        counts.withColumn("__cum", F.sum("c").over(w_cum))
        .withColumn("__n", F.sum("c").over(w_all))
        .filter(F.col("__cum") * 2 >= F.col("__n") + 1)
        .groupBy("g")
        .agg(F.min(value_col).alias("med"))
    )


def median_mad_anomalies(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = 3,
) -> DataFrame:
    """Robust anomaly detection per group: median / MAD (median absolute
    deviation) in exact integer MICRO units — an outlier is a value
    with ``|v - med| > k * mad``.  Mean/stddev breaks under the very
    outliers it hunts; median/MAD has a 50% breakdown point.

    Scale shape: the input is reduced to per-(group, distinct-value)
    COUNTS first, so both median passes run their cumulative-sum window
    over the distinct-value table (bounded by the value domain, not the
    row count) — no data-sized per-group sort anywhere; the two
    medians join back broadcast (|groups| rows).  Micro conversion is
    ``floor(v * 1e6 + 0.5)`` (the q36 convention — bit-reproducible
    cross-engine, unlike CAST which truncates in Spark and rounds in
    DuckDB).  Even-n median takes the LOWER middle (min value with
    2*cum >= n+1) — a documented total-order convention, no float
    averaging.  MAD = 0 (over half the group identical) flags every
    other value — the textbook degeneracy, left to the caller's k.

    Returns one row per group: (group, n_rows, med_micro, mad_micro,
    n_anomalies, max_dev_micro).
    """
    vals = df.select(
        F.col(group_col).alias("g"),
        F.expr(
            f"CAST(floor({value_col} * 1000000 + 0.5) AS BIGINT)"
        ).alias("v"),
    )
    counts = vals.groupBy("g", "v").agg(F.count("*").alias("c"))
    med = _grouped_median(counts.select("g", "v", "c"), "v")
    devs = counts.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("d"), "c"
    )
    mad = _grouped_median(
        devs.groupBy("g", "d").agg(F.sum("c").alias("c")), "d"
    ).withColumnRenamed("med", "mad")
    return (
        devs.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("d") > F.lit(k) * F.col("mad"), F.col("c"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_anomalies"),
            F.max("d").cast("long").alias("max_dev_micro"),
        )
        .join(F.broadcast(med), "g")
        .join(F.broadcast(mad), "g")
        .select(
            F.col("g").alias(group_col),
            "n_rows",
            F.col("med").cast("long").alias("med_micro"),
            F.col("mad").cast("long").alias("mad_micro"),
            "n_anomalies",
            "max_dev_micro",
        )
    )


# merge rules for mergeable aggregate states: how a partial column
# combines with another partial of the same column.  count/sum both
# merge by SUM; avg is NOT mergeable directly — derive it from
# (sum, count) after the merge.
_STATE_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def agg_state(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build a mergeable aggregate state: one partial row per key.

    ``spec`` maps output column → (kind, input expression), kind ∈
    {count, sum, min, max}.  The resulting frame is a STATE, not a
    report: it can be unioned with later states and collapsed by
    :func:`merge_agg_states` without touching the original rows —
    the incremental-view-maintenance shape (reference analog: the
    re-scan-everything report loop, /root/reference/build_reports.py;
    SURVEY §2 A13/D9).  At 100 TB the point is that a daily delta
    merges into yesterday's state in time proportional to the DELTA,
    not the corpus.
    """
    aggs = []
    for out, (kind, expr) in spec.items():
        if kind == "count":
            aggs.append(F.count(F.expr(expr)).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.expr(expr)).cast("long").alias(out))
        elif kind == "min":
            aggs.append(F.min(F.expr(expr)).alias(out))
        elif kind == "max":
            aggs.append(F.max(F.expr(expr)).alias(out))
        else:
            raise ValueError(f"unmergeable aggregate kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame],
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """Collapse aggregate states into one state per key.

    Associativity/commutativity of {sum, min, max} (count merges as
    sum) makes ``merge(agg_state(A), agg_state(B)) ==
    agg_state(A ∪ B)`` exactly — the identity the q98 oracle checks
    end-to-end.  One union + one map-side-combinable hash aggregation;
    no re-read of the underlying data.
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [
        _STATE_MERGE[kind](F.col(out)).cast("long").alias(out)
        for out, (kind, _) in spec.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def frequent_itemsets(
    baskets: DataFrame,
    min_support: int,
    id_col: str = "basket_id",
    item_col: str = "item",
    max_size: int = 3,
    n_baskets: int | None = None,
) -> DataFrame:
    """Apriori frequent-itemset mining (Agrawal & Srikant, VLDB'94) up
    to ``max_size`` ∈ {1, 2, 3} → one row per frequent itemset:
    (item_a, item_b, item_c, size, support, lift_num, lift_den) with
    items sorted ascending inside the set and trailing slots NULL.

    The market-basket view of a corpus — which tags / entities /
    domains / quality-labels co-occur in the same document more than
    independence predicts — is the co-occurrence analytics q03/q15
    compute for PAIRS, completed to the classic level-wise lattice
    walk: L1 = frequent items, L2 = frequent pairs over L1-filtered
    baskets, C3 = L2 ⋈ L2 candidates with the FULL Apriori prune
    (every 2-subset frequent) BEFORE any counting touches data, L3 =
    candidates verified against baskets.  Support is an exact row
    count; lift ships as the EXACT integer pair
    ``lift_num = support · n_baskets^(size-1)`` over
    ``lift_den = Π support(single item)`` — no division, no floats, so
    the output replays bit-identically in any engine (consumers at
    astronomical n_baskets should compare in log space; the pair
    itself stays exact while it fits in BIGINT, n ≲ 2·10⁸ for
    triples).

    100 TB shape: baskets are L1-filtered FIRST (the Apriori trick —
    the quadratic pair explosion runs over frequent items only), every
    level is a map-side-combinable groupBy on the itemset key, the C3
    candidate table is itemset-schema-sized (joined, never broadcast
    as a collection), and no basket ever materializes as an array.
    """
    if not 1 <= max_size <= 3:
        raise ValueError("frequent_itemsets supports max_size in {1,2,3}")
    b = baskets.select(
        F.col(id_col).alias("bid"),
        F.col(item_col).cast("string").alias("item"),
    ).distinct()
    if n_baskets is None:
        n_baskets = b.select("bid").distinct().count()
    n = F.lit(int(n_baskets)).cast("long")
    l1 = (
        b.groupBy("item")
        .agg(F.count("*").cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    out = l1.select(
        F.col("item").alias("item_a"),
        F.lit(None).cast("string").alias("item_b"),
        F.lit(None).cast("string").alias("item_c"),
        F.lit(1).alias("size"),
        F.col("s").alias("support"),
        F.col("s").alias("lift_num"),
        F.col("s").alias("lift_den"),
    )
    if max_size == 1:
        return out
    b1 = b.join(l1.select("item"), "item").select("bid", "item")
    l2 = (
        b1.alias("x")
        .join(b1.alias("y"), "bid")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("a"), F.col("y.item").alias("b")
        )
        .agg(F.count("*").cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    sa = l1.select(F.col("item").alias("a"), F.col("s").alias("s_a"))
    sb = l1.select(F.col("item").alias("b"), F.col("s").alias("s_b"))
    out = out.unionByName(
        l2.join(sa, "a")
        .join(sb, "b")
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.lit(None).cast("string").alias("item_c"),
            F.lit(2).alias("size"),
            F.col("s").alias("support"),
            (F.col("s") * n).cast("long").alias("lift_num"),
            (F.col("s_a") * F.col("s_b")).cast("long").alias("lift_den"),
        )
    )
    if max_size == 2:
        return out
    # C3: join L2 on shared first item, prune on the third 2-subset
    c3 = (
        l2.select("a", "b")
        .alias("p")
        .join(
            l2.select(F.col("a").alias("a2"), F.col("b").alias("c")).alias(
                "q"
            ),
            F.col("p.a") == F.col("a2"),
        )
        .filter(F.col("p.b") < F.col("c"))
        .select("a", "b", "c")
        .join(
            l2.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    occ2 = (
        b1.alias("x")
        .join(b1.alias("y"), "bid")
        .filter(F.col("x.item") < F.col("y.item"))
        .join(
            l2.select(F.col("a"), F.col("b")),
            (F.col("x.item") == F.col("a")) & (F.col("y.item") == F.col("b")),
            "left_semi",
        )
        .select(
            "bid",
            F.col("x.item").alias("a"),
            F.col("y.item").alias("b"),
        )
    )
    l3 = (
        occ2.join(b1.alias("z"), "bid")
        .filter(F.col("z.item") > F.col("b"))
        .select("bid", "a", "b", F.col("z.item").alias("c"))
        .join(c3, ["a", "b", "c"], "left_semi")
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    sc = l1.select(F.col("item").alias("c"), F.col("s").alias("s_c"))
    return out.unionByName(
        l3.join(sa, "a")
        .join(sb, "b")
        .join(sc, "c")
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
            F.lit(3).alias("size"),
            F.col("s").alias("support"),
            (F.col("s") * n * n).cast("long").alias("lift_num"),
            (F.col("s_a") * F.col("s_b") * F.col("s_c"))
            .cast("long")
            .alias("lift_den"),
        )
    )


def covisitation_similarity(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    min_count: int = 5,
    tau_millis: int = 500,
) -> DataFrame:
    """Item-item collaborative similarity from co-visitation →
    (item_a, item_b, c, n_a, n_b): unordered item pairs whose binary
    user-vector cosine clears ``tau_millis``, with ``c`` co-visiting
    users and ``n_*`` per-item user counts.

    The "related pages / related entities" primitive: two items are
    similar when the SAME users touch both, normalized so megahit
    items don't dominate — cosine on binary incidence vectors,
    c/√(n_a·n_b) (Ochiai).  The co-occurrence counting is q03/q15's
    pair aggregation; the new piece is the normalization kept
    integer-exact: the threshold test runs CROSS-MULTIPLIED,
    ``c²·10⁶ ≥ τ²·n_a·n_b`` — one BIGINT inequality, no division, no
    sqrt, bit-identical in any engine (exact while c ≤ ~3·10⁶;
    beyond that compare in log space).

    Shape: distinct-first (multiple visits collapse before any join),
    the pair join is per-user — a user touching m items emits m²/2
    pairs, the classic co-visitation cost bounded by per-user activity
    caps upstream, never by catalog size; both aggregates are
    map-side combinable.  ``min_count`` prunes the sparse tail before
    the similarity test.
    """
    ui = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item")
    ).distinct()
    ni = ui.groupBy("item").agg(F.count("*").cast("long").alias("n"))
    pairs = (
        ui.alias("x")
        .join(ui.alias("y"), "u")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("item_a"),
            F.col("y.item").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    tau2 = int(tau_millis) * int(tau_millis)
    return (
        pairs.join(
            ni.select(F.col("item").alias("item_a"), F.col("n").alias("n_a")),
            "item_a",
        )
        .join(
            ni.select(F.col("item").alias("item_b"), F.col("n").alias("n_b")),
            "item_b",
        )
        .filter(
            F.col("c") * F.col("c") * F.lit(1000000)
            >= F.lit(tau2) * F.col("n_a") * F.col("n_b")
        )
        .select("item_a", "item_b", "c", "n_a", "n_b")
    )


def bh_fdr_select(
    pvals: DataFrame,
    family_cols: list[str],
    id_col: str,
    p_col: str = "p_milli",
    alpha_milli: int = 200,
) -> DataFrame:
    """Benjamini-Hochberg FDR selection → one row per hypothesis:
    (*family_cols, id, p_milli, k, selected).

    The multiple-testing gate for pipeline anomaly flags: testing 10⁵
    sources hourly, a per-test threshold either drowns in false alarms
    (fixed α) or misses everything (Bonferroni); BH (JRSS-B 1995)
    controls the EXPECTED FALSE-DISCOVERY RATE at α and adapts to how
    much signal exists.  BH is a procedure ON p-values — they arrive
    from whatever upstream test produced them (a calibrated anomaly
    score, a permutation rank, an A/B z-test), in milli units.  The
    step-up walk is exact integer end to end:

        p_(k) ≤ α·k/m   ⟺   p_milli_(k) · m ≤ alpha_milli · k

    (k = ascending-p position, m = family size), k* = the LARGEST
    qualifying position, and selection is tie-correct by value:
    selected ⟺ p_i ≤ p_(k*) — never by row position, so equal
    p-values always decide together.

    Per-family windows only (one rank, one max-over-qualifying) — no
    global sort; m is a windowed count, never a driver scalar.
    """
    fam = Window.partitionBy(*family_cols)
    w = fam.orderBy(F.asc(p_col), F.asc(id_col))
    ranked = pvals.select(
        *family_cols,
        F.col(id_col),
        F.col(p_col).cast("long").alias(p_col),
        F.row_number().over(w).alias("k"),
        F.count("*").over(fam).cast("long").alias("_m"),
    )
    qualifies = (
        F.col(p_col) * F.col("_m")
        <= F.lit(int(alpha_milli)) * F.col("k")
    )
    pstar = F.max(F.when(qualifies, F.col(p_col))).over(fam)
    return ranked.select(
        *family_cols,
        id_col,
        p_col,
        "k",
        F.when(pstar.isNull(), F.lit(False))
        .otherwise(F.col(p_col) <= pstar)
        .alias("selected"),
    )



def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """One-pass column profiling → one row per column: (column, n_rows,
    n_null, n_distinct, min_value, max_value, top_value, top_count) —
    values rendered as strings so heterogeneous columns share a schema.

    The Deequ/Great-Expectations-style profile every ingest pipeline
    runs before trusting a new drop: null saturation, cardinality,
    range, and the modal value (a top_count near n_rows on a
    supposedly-unique column is the classic broken-join smell).

    Shape: the table is UNPIVOTED to (column, value) with one stack
    expression — a single scan however many columns — then one
    groupBy(column, value) feeds both the distinct count and the
    deterministic mode (max count, ties by value ascending), and a
    second tiny aggregate folds per-column stats.  Counts are exact;
    min/max/mode compare on the string rendering (documented: this is
    a PROFILE, not a typed aggregate — casting every column to string
    is what makes one schema possible).  NULLs keep their slot in the
    unpivot (stack preserves them) and are counted, never compared.
    """
    cols = columns or df.columns
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (column, value)")
    )
    vc = long.groupBy("column", "value").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("c"), F.asc_nulls_last("value")
    )
    ranked = vc.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy("column")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.count(F.when(F.col("value").isNotNull(), 1))
            .cast("long")
            .alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max(
                F.when(
                    F.col("_rk") == 1,
                    F.when(F.col("value").isNull(), F.lit("<NULL>"))
                    .otherwise(F.col("value")),
                )
            ).alias("top_value"),
            F.max(F.when(F.col("_rk") == 1, F.col("c")))
            .cast("long")
            .alias("top_count"),
        )
    )


def dq_checks(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    fk: list[tuple] | None = None,
    ranges: list[tuple] | None = None,
) -> DataFrame:
    """Declarative data-quality constraint suite → one row per check:
    (check, kind, n_violations, passed).

    The Deequ-style validation gate between ingest and publish:
    uniqueness of claimed keys, NOT-NULL saturation, referential
    containment (``fk`` = (name, child_df_keys_col, parent_df, parent_col)
    tuples checked by left-anti join — the orphan detector), and
    closed integer ranges (``ranges`` = (col, lo, hi)).  Every check
    reduces to an exact violation COUNT, so the suite result is one
    tiny deterministic table a scheduler can gate on — no sampling,
    no heuristics; the q160 oracle replays every count.

    Each check is its own aggregation over the shared scan —
    map-side-combinable counts and anti-joins only; the union result
    is |checks| rows.
    """
    spark = df.sparkSession
    results = []
    for c in unique_cols or []:
        v = (
            df.groupBy(c)
            .agg(F.count("*").alias("_c"))
            .filter(F.col("_c") > 1)
            .agg(
                F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                .cast("long")
                .alias("n")
            )
            .select(
                F.lit(f"unique:{c}").alias("check"),
                F.lit("unique").alias("kind"),
                F.col("n").alias("n_violations"),
            )
        )
        results.append(v)
    for c in not_null_cols or []:
        v = df.agg(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n")
        ).select(
            F.lit(f"not_null:{c}").alias("check"),
            F.lit("not_null").alias("kind"),
            F.col("n").alias("n_violations"),
        )
        results.append(v)
    for name, child_col, parent_df, parent_col in fk or []:
        v = (
            df.select(F.col(child_col).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .join(
                parent_df.select(F.col(parent_col).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n"))
            .select(
                F.lit(f"fk:{name}").alias("check"),
                F.lit("fk").alias("kind"),
                F.col("n").alias("n_violations"),
            )
        )
        results.append(v)
    for c, lo, hi in ranges or []:
        v = df.agg(
            F.sum(
                F.when(
                    F.col(c).isNotNull()
                    & ((F.col(c) < lo) | (F.col(c) > hi)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n")
        ).select(
            F.lit(f"range:{c}").alias("check"),
            F.lit("range").alias("kind"),
            F.col("n").alias("n_violations"),
        )
        results.append(v)
    if not results:
        return spark.createDataFrame(
            [], "check string, kind string, n_violations long, passed boolean"
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
