"""Exact, integer-deterministic evaluation metrics over DataFrames.

The reference evaluates its extraction stages offline (hand-checked
CSVs; /root/reference/build_reports.py emits the counts a human then
eyeballs).  At corpus scale the same judgments need distributed,
engine-reproducible metrics: a classifier/quality-score sweep is an
exact ROC-AUC (Mann-Whitney rank-sum with tie handling), and two
labeling rules are compared with Cohen's κ.  Both are computed in
integer fixed point only — doubled rank sums and cross-tab products —
so the results are bit-identical across engines, partitionings and
join orders (the q44/q154 determinism-by-quantization idiom).

Scale shape: both metrics are one map-side-combinable groupBy on the
(group, value) pair followed by a per-group window or scalar-sized
aggregate — no per-row Python, no global sort; the per-score window in
:func:`exact_auc` partitions by the group key, so the sort is
per-group local, never single-partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` as a ranker of boolean
    ``label_col`` → (by…, n_pos, n_neg, auc_u2, auc_denom2,
    auc_micro) per group.

    Mann-Whitney formulation with exact tie handling, all integers:
    over score groups ascending, a positive beats every negative with
    a strictly smaller score (weight 1) and half-ties every negative
    with an equal score (weight ½).  Doubling clears the halves:

        auc_u2     = Σ_s  n_pos(s) · ( 2·cum_neg(<s) + n_neg(s) )
        auc_denom2 = 2 · n_pos · n_neg
        AUC        = auc_u2 / auc_denom2
        auc_micro  = (10^6 · auc_u2) DIV auc_denom2   (floor)

    Groups where one class is absent report NULL ``auc_micro`` (the
    metric is undefined), with the class counts still emitted.

    One exploded-free plan: groupBy (by, score) with two conditional
    counts, a per-group cumulative window ordered by score, one final
    per-group sum.  With ``by`` the window is per-group local; with
    ``by=None`` the cumulative window necessarily runs on a SINGLE
    partition — but only AFTER the per-score pre-aggregation, so the
    single-partition row count is bounded by the number of distinct
    scores, not by |df| (fixed-point scores keep this small at any
    corpus size; the heavy reduction already happened map-side).
    """
    by = by or []
    per_score = df.groupBy(
        *by, F.col(score_col).alias("_score")
    ).agg(
        F.sum(F.col(label_col).cast("long")).alias("_np"),
        F.sum((~F.col(label_col)).cast("long")).alias("_nn"),
    )
    # ungrouped path: explicit constant partition key — same physical
    # single-partition sort, but deliberate (and warning-free) rather
    # than an accidental global Window.orderBy
    w = (
        Window.partitionBy(*by).orderBy("_score")
        if by
        else Window.partitionBy(F.lit(0)).orderBy("_score")
    )
    cum = per_score.withColumn(
        "_cum_neg_before",
        F.coalesce(
            F.sum("_nn").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    )
    out = cum.groupBy(*by).agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.sum(
            F.col("_np") * (2 * F.col("_cum_neg_before") + F.col("_nn"))
        )
        .cast("long")
        .alias("auc_u2"),
    )
    return out.select(
        *by,
        "n_pos",
        "n_neg",
        "auc_u2",
        (2 * F.col("n_pos") * F.col("n_neg")).alias("auc_denom2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("(1000000 * auc_u2) DIV (2 * n_pos * n_neg)"),
        ).alias("auc_micro"),
    )


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Cohen's κ agreement between two categorical labelers →
    (by…, n, n_agree, chance2, kappa_milli) per group.

    κ = (p_o − p_e) / (1 − p_e) with p_o = agree/n and
    p_e = Σ_k a_k·b_k / n² — cleared to one exact integer ratio:

        kappa_milli = 1000 · (n·agree − Σ a_k b_k)
                      DIV (n² − Σ a_k b_k)

    where DIV is integer division TRUNCATING TOWARD ZERO (Spark's
    ``DIV``, identical to DuckDB's integer ``//``) — for negative κ
    the fixed-point value rounds toward zero, not down; this is the
    deliberate cross-engine convention, not floor.

    where ``chance2 = Σ_k a_k·b_k`` (the marginal cross product) is
    also emitted so the oracle and downstream CIs can rebuild p_e.
    Degenerate groups (p_e = 1: both raters constant and identical
    marginals) report NULL kappa_milli.

    Plan: one (by, a, b) cross-tab groupBy (map-side combinable), the
    marginals derived from it by two more tiny groupBys joined back on
    ``by`` — no window, no sort.
    """
    by = by or []
    tab = df.groupBy(
        *by, F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count("*").cast("long").alias("_c"))
    totals = tab.groupBy(*by).agg(
        F.sum("_c").cast("long").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c")))
        .cast("long")
        .alias("n_agree"),
    )
    ma = tab.groupBy(*by, "_a").agg(F.sum("_c").alias("_ca"))
    mb = tab.groupBy(*by, "_b").agg(F.sum("_c").alias("_cb"))
    chance = (
        ma.join(mb, [*by] if by else None, "inner")
        if by
        else ma.crossJoin(mb)
    )
    chance = (
        chance.filter(F.col("_a") == F.col("_b"))
        .groupBy(*by)
        .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long").alias("chance2"))
    )
    # LEFT join: a group whose marginal cross product is empty (the two
    # raters share no category) has p_e = 0, not "no row"
    out = (
        totals.join(chance, by, "left")
        if by
        else totals.join(chance, F.lit(True), "left")
    )
    out = out.withColumn(
        "n_agree", F.coalesce("n_agree", F.lit(0).cast("long"))
    ).withColumn(
        "chance2", F.coalesce("chance2", F.lit(0).cast("long"))
    )
    return out.select(
        *by,
        "n",
        "n_agree",
        "chance2",
        F.when(
            F.col("n") * F.col("n") != F.col("chance2"),
            F.expr("(1000 * (n * n_agree - chance2)) DIV (n * n - chance2)"),
        ).alias("kappa_milli"),
    )


def krippendorff_alpha(
    df: DataFrame,
    a_col: str,
    b_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Krippendorff's α (nominal, two raters, missing ratings allowed)
    → (by…, n_units, n_pairable, do2, de, alpha_milli) per group.

    The agreement coefficient that, unlike Cohen's κ, POOLS the two
    raters' marginals (coincidence-matrix formulation) and simply drops
    units with fewer than two ratings — the right statistic when
    annotators abstain.  With two raters every pairable unit (both
    ratings present) contributes the ordered pairs (x,y) and (y,x) to
    the coincidence matrix, so in exact integers:

        n    = 2 · n_pairable              (total coincidences)
        do2  = Σ_{c≠k} o(c,k) = 2 · #(disagreeing pairable units)
        de   = n² − Σ_c n_c²               (expected-disagreement mass,
                                            n_c pooled value counts)
        α    = 1 − (n−1)·do2 / de
        alpha_milli = 1000 · (de − (n−1)·do2) DIV de

    (DIV truncates toward zero — same cross-engine convention as
    :func:`cohens_kappa`'s kappa_milli; negative α rounds toward
    zero, matching DuckDB's integer ``//``.)

    Groups where de = 0 (a single pooled category — observed
    disagreement impossible) report NULL alpha_milli.

    Plan: one filtered per-group count (agree/disagree), one pooled
    value-frequency groupBy (explode of the two rating columns), one
    Σn_c² rollup, a per-group join — map-side combinable throughout, no
    window, no sort.
    """
    by = by or []
    base = df.select(
        *by, F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    )
    pairable = base.filter(
        F.col("_a").isNotNull() & F.col("_b").isNotNull()
    )
    unit_counts = pairable.groupBy(*by).agg(
        F.count("*").cast("long").alias("n_pairable"),
        F.sum((F.col("_a") != F.col("_b")).cast("long")).alias("_dis"),
    )
    totals = base.groupBy(*by).agg(
        F.count("*").cast("long").alias("n_units")
    )
    pooled = (
        pairable.select(
            *by, F.explode(F.array("_a", "_b")).alias("_v")
        )
        .groupBy(*by, "_v")
        .agg(F.count("*").cast("long").alias("_nc"))
        .groupBy(*by)
        .agg(F.sum(F.col("_nc") * F.col("_nc")).cast("long").alias("_sum_nc2"))
    )

    def j(left, right):
        return (
            left.join(right, by, "left")
            if by
            else left.join(right, F.lit(True), "left")
        )

    out = j(j(totals, unit_counts), pooled)
    out = (
        out.withColumn(
            "n_pairable",
            F.coalesce("n_pairable", F.lit(0).cast("long")),
        )
        .withColumn("_dis", F.coalesce("_dis", F.lit(0).cast("long")))
        .withColumn(
            "_sum_nc2", F.coalesce("_sum_nc2", F.lit(0).cast("long"))
        )
        .withColumn("do2", (2 * F.col("_dis")).cast("long"))
        .withColumn(
            "de",
            (
                4 * F.col("n_pairable") * F.col("n_pairable")
                - F.col("_sum_nc2")
            ).cast("long"),
        )
    )
    return out.select(
        *by,
        "n_units",
        "n_pairable",
        "do2",
        "de",
        F.when(
            F.col("de") > 0,
            F.expr(
                "(1000 * (de - (2 * n_pairable - 1) * do2)) DIV de"
            ),
        ).alias("alpha_milli"),
    )


def calibration_bins(
    df: DataFrame,
    conf_col: str,
    label_col: str,
    n_bins: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Reliability diagram + expected calibration error, all integers →
    per (by…, bin): (bin, n, n_pos, sum_conf_micro) and per group the
    same ``ece_micro`` repeated on every bin row.

    ``conf_col`` is a confidence in MICRO units (0..10^6, the repo's
    fixed-point convention).  Equal-width bins b = conf·n_bins DIV 10^6
    (the top edge folds into the last bin).  The ECE's per-bin weight
    cancels exactly:

        Σ_b n_b·|acc_b − conf̄_b|  =  Σ_b |10^6·pos_b − Σconf_b| / 10^6
        ece_micro = Σ_b |10^6·pos_b − Σconf_b|  DIV  n

    so the whole statistic is one abs over BIGINT sums — engine- and
    partition-independent, no floats anywhere.

    Plan: one groupBy (by, bin) with three sums, one per-group rollup
    joined back (broadcast-sized: groups × bins rows) — map-side
    combinable, no window.
    """
    by = by or []
    mega = 1_000_000
    binned = df.select(
        *by,
        F.least(
            F.expr(f"({conf_col} * {n_bins}) DIV {mega}"),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("bin"),
        F.col(conf_col).cast("long").alias("_conf"),
        F.col(label_col).cast("long").alias("_y"),
    )
    per_bin = binned.groupBy(*by, "bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_conf").cast("long").alias("sum_conf_micro"),
    )
    per_group = per_bin.groupBy(*by).agg(
        F.sum("n").alias("_n_total"),
        F.sum(
            F.abs(F.lit(mega) * F.col("n_pos") - F.col("sum_conf_micro"))
        ).alias("_err"),
    )
    joined = (
        per_bin.join(per_group, by)
        if by
        else per_bin.crossJoin(per_group)
    )
    return joined.select(
        *by,
        "bin",
        "n",
        "n_pos",
        "sum_conf_micro",
        F.expr("_err DIV _n_total").alias("ece_micro"),
    )


def ndcg_discounts_q20(k: int) -> list[tuple[int, int]]:
    """[(rank, round(2^20 / log2(rank+1)))] for rank 1..k — the NDCG
    discount table as EXACT shared integer constants.  Ranks are tiny
    (k ≤ 100s), so the discounts are computed once driver-side and
    inlined as literals into BOTH the Spark plan and the DuckDB oracle
    (__spark_entry__ imports this function) — no runtime log machinery,
    no cross-engine float drift by construction."""
    import math

    return [(i, int(round((1 << 20) / math.log2(i + 1)))) for i in
            range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    score_col: str,
    rel_col: str,
    id_col: str,
    by: list[str] | None = None,
    k: int = 10,
) -> DataFrame:
    """NDCG@k (Järvelin & Kekäläinen, TOIS'02) in exact integers →
    (by…, n_ranked, dcg_q20, idcg_q20, ndcg_milli) per group.

    Linear gain (Burges et al. '05 variant — exponential 2^rel−1 is a
    caller-side substitution on ``rel_col`` if wanted):

        dcg_q20  = Σ_{rank i ≤ k} rel_i · D(i),  D(i) = ⌊2^20/log2(i+1)⌉
        idcg_q20 = the same over the IDEAL ranking (rel desc)
        ndcg_milli = (1000 · dcg_q20) DIV idcg_q20   (NULL when idcg=0)

    Ranking is (score desc, id asc) — the deterministic tiebreak every
    fixed-point query in this repo uses; the ideal ranking tie-breaks
    the same way, which cannot change idcg (equal-rel swaps preserve
    the sum).  Plan: two per-group row_number windows over the same
    partitioning (one sort each, both group-local), one hash aggregate;
    the discount table joins as a broadcast literal frame.
    """
    by = by or []
    spark = df.sparkSession
    disc = spark.createDataFrame(
        ndcg_discounts_q20(k), "rank int, d_q20 long"
    )
    # r6 (ADVICE r5 #2): rows beyond rank k contribute 0 to both sums,
    # so rank and PRE-PRUNE each ranking to its top-k BEFORE the gains
    # join — the rank<=k filter right above a row_number window compiles
    # to WindowGroupLimit, which keeps only k rows per partition ahead
    # of the final sort, so the ``by=[]`` single-partition window (q190)
    # sorts a k-bounded set instead of the full input.  n_ranked comes
    # from a plain hash aggregate (no sort at all).  Results identical.
    w_rank = Window.partitionBy(*by).orderBy(
        F.desc("_score"), F.asc("_id")
    )
    w_ideal = Window.partitionBy(*by).orderBy(
        F.desc("_rel"), F.asc("_id")
    )
    base = df.select(
        *by,
        F.col(score_col).alias("_score"),
        F.col(id_col).alias("_id"),
        F.col(rel_col).cast("long").alias("_rel"),
    )
    cnt = base.groupBy(*by).agg(F.count("*").cast("long").alias("n_ranked"))
    top = (
        base.withColumn("_rank", F.row_number().over(w_rank))
        .filter(F.col("_rank") <= k)
        .join(F.broadcast(disc), F.col("_rank") == F.col("rank"))
        .groupBy(*by)
        .agg(
            F.sum(F.col("_rel") * F.col("d_q20"))
            .cast("long")
            .alias("dcg_q20")
        )
    )
    ideal = (
        base.withColumn("_irank", F.row_number().over(w_ideal))
        .filter(F.col("_irank") <= k)
        .join(F.broadcast(disc), F.col("_irank") == F.col("rank"))
        .groupBy(*by)
        .agg(
            F.sum(F.col("_rel") * F.col("d_q20"))
            .cast("long")
            .alias("idcg_q20")
        )
    )
    # left joins so the by=[] empty-input case keeps the old one-row
    # (n_ranked=0, NULL sums) shape of the former single aggregate
    if by:
        agg = cnt.join(top, by, "left").join(ideal, by, "left")
    else:
        agg = (
            cnt.withColumn("_k", F.lit(1))
            .join(top.withColumn("_k", F.lit(1)), "_k", "left")
            .join(ideal.withColumn("_k", F.lit(1)), "_k", "left")
            .drop("_k")
        )
    return agg.select(
        *by,
        "n_ranked",
        "dcg_q20",
        "idcg_q20",
        F.when(
            F.col("idcg_q20") > 0,
            F.expr("(1000 * dcg_q20) DIV idcg_q20"),
        ).alias("ndcg_milli"),
    )
