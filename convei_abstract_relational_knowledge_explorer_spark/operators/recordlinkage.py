"""Fellegi-Sunter record-linkage scoring (Fellegi & Sunter, JASA 1969).

The canonical probabilistic entity-resolution model behind Splink /
RecordLinkage-toolkit style pipelines, re-expressed Spark-first: blocked
candidate generation is a plain equi self-join (never all-pairs), and
the match score is a SUM OF INTEGER FIELD WEIGHTS — the log-likelihood
ratio ``sum_i log2(m_i/u_i or (1-m_i)/(1-u_i))`` in fixed-point
millibits, the q44/q59 idiom: integer sums are associative, so scores
are bit-identical across engines, partitionings, and plans, and the
whole model replays verbatim in an ANSI-SQL oracle (runtime ``log`` in
two engines would differ in the last ulp on exactly the rows that
matter, the threshold boundary).

The m/u parameters (P(field agrees | match) / P(field agrees |
non-match)) are supplied by the caller as pre-derived integer weights —
estimating them by EM is the documented delta vs a full Splink; with
weights fixed, scoring is a pure narrow projection + groupBy.

Scale shape: candidates come from blocking (each block a hash-join
bucket), the score is computed per pair in one projection (codegen, no
shuffle), and any aggregate over scores partial-aggregates map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: (agreement column, weight if it agrees, weight if it disagrees) —
#: integer millibits: round(1000*log2(m/u)) / round(1000*log2((1-m)/(1-u)))
FieldWeight = tuple[str, int, int]


def block_candidates(
    records: DataFrame, id_col: str, block_cols: list[str]
) -> DataFrame:
    """Upper-triangular candidate pairs within each block →
    (``<id>_l``, ``<id>_r``, left/right payload columns suffixed _l/_r).

    A plain equi self-join on the blocking key: the quadratic blow-up
    is confined to single blocks (choose keys so blocks stay small —
    the same contract as the MinHash/SimHash band joins), and the
    ``id_l < id_r`` guard keeps one row per unordered pair.
    """
    if not block_cols:
        raise ValueError("block_candidates needs at least one block column")
    payload = [c for c in records.columns if c not in block_cols]
    left = records.select(
        *block_cols, *[F.col(c).alias(f"{c}_l") for c in payload]
    )
    right = records.select(
        *block_cols, *[F.col(c).alias(f"{c}_r") for c in payload]
    )
    return left.join(right, block_cols).filter(
        F.col(f"{id_col}_l") < F.col(f"{id_col}_r")
    )


def fs_score(
    pairs: DataFrame, fields: list[FieldWeight], threshold: int = 0
) -> DataFrame:
    """Append ``score`` (millibits) and ``is_match`` to candidate pairs.

    ``fields`` maps boolean agreement columns to their pre-derived
    integer (agree, disagree) weights; NULL agreement (a field missing
    on either side) contributes 0 — the standard FS treatment of
    missingness.  One narrow projection, no shuffle.
    """
    if not fields:
        raise ValueError("fs_score needs at least one field weight")
    score = None
    for col, w_a, w_d in fields:
        term = (
            F.when(F.col(col).isNull(), 0)
            .when(F.col(col), F.lit(int(w_a)))
            .otherwise(F.lit(int(w_d)))
            .cast("long")
        )
        score = term if score is None else (score + term)
    return pairs.withColumn("score", score).withColumn(
        "is_match", F.col("score") >= threshold
    )


def sorted_neighborhood(
    records: DataFrame,
    id_col: str,
    sort_cols: list[str],
    block_cols: list[str],
    window: int = 2,
) -> DataFrame:
    """Blocked sorted-neighborhood candidate generation (Hernández &
    Stolfo, SIGMOD'95) → (block…, ``<id>_l``, ``<id>_r``, dist): within
    each block, records sorted by ``sort_cols`` (ties broken by the id
    so the order is a pure function of the data) pair with their next
    ``window`` successors.

    The linear-output complement to ``block_candidates``: a block of n
    records emits ≈ n·w pairs instead of n²/2 — the regime for blocks
    too big to pair exhaustively but whose near-duplicates sort
    adjacently (names, addresses, canonical URLs).  Multi-pass SNM is
    just this called once per sort key with the unions deduped.

    Plan: one row_number window PER BLOCK partition (parallel across
    blocks, no global sort — the q37/q107 discipline), one explode of
    the 1..window offset sequence, one equi self-join on
    (block, rank+offset) — rank arithmetic turns the "adjacent in
    sort order" predicate into an equi-join key, so there is no range
    join and no skew beyond the block sizes themselves.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not block_cols:
        raise ValueError(
            "sorted_neighborhood needs block columns; a truly global "
            "sort order would single-thread the window at scale — "
            "block first (multi-pass SNM) instead"
        )
    w = Window.partitionBy(*block_cols).orderBy(
        *[F.col(c) for c in sort_cols], F.col(id_col)
    )
    ranked = records.select(
        *block_cols,
        F.col(id_col).alias("_id"),
        F.row_number().over(w).cast("long").alias("_rk"),
    )
    probes = ranked.select(
        *block_cols,
        F.col("_id").alias(f"{id_col}_l"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(window)))
        ).alias("dist"),
        F.col("_rk"),
    ).withColumn("_rk", (F.col("_rk") + F.col("dist")).cast("long"))
    return probes.join(
        ranked.select(
            *block_cols, F.col("_id").alias(f"{id_col}_r"), "_rk"
        ),
        [*block_cols, "_rk"],
    ).select(
        *block_cols,
        f"{id_col}_l",
        f"{id_col}_r",
        F.col("dist").cast("long").alias("dist"),
    )


def meta_blocking(
    blocks: DataFrame,
    block_col: str = "block_key",
    id_col: str = "rec_id",
    max_block: int = 64,
    prune: bool = True,
) -> DataFrame:
    """Meta-blocking with ARCS weighting and weighted-edge pruning
    (Papadakis et al., TKDE'14) → the pruned entity-resolution
    candidate set: (rec_a, rec_b, weight_micro, n_blocks).

    Multi-pass blocking emits each record into many blocks; the
    candidate-pair graph that survives is weighted by how DISCRIMINATING
    the shared blocks are — ARCS: weight(a,b) = Σ over common blocks of
    1/|block|, here exact integer micro units ``1000000 DIV block_size``.
    WEP pruning keeps pairs strictly above the mean weight (the mean is
    the exact integer ``sum(weight) DIV n_pairs`` — same DIV both
    engines).  Oversized blocks (> ``max_block``) are purged first
    (block purging, the standard stopword-block guard): a block of 10⁸
    records contributes ~0 discriminative weight at quadratic cost, so
    dropping it changes recall negligibly and bounds every reducer by
    ``max_block²``.

    Plan: block-size agg → purge filter → within-block self-join on the
    block key (each reducer ≤ max_block rows per key) → pair hash-agg →
    one broadcast scalar mean → filter.  No arrays, no windows; the
    quadratic step is bounded by construction.
    """
    sizes = blocks.groupBy(block_col).agg(
        F.countDistinct(id_col).alias("_bs")
    )
    kept = (
        blocks.select(block_col, id_col)
        .distinct()
        .join(
            sizes.filter(
                (F.col("_bs") >= 2) & (F.col("_bs") <= max_block)
            ),
            block_col,
        )
    )
    a = kept.select(
        F.col(block_col).alias("_k"),
        F.col(id_col).alias("rec_a"),
        F.col("_bs").alias("_bs"),
    )
    b = kept.select(
        F.col(block_col).alias("_k"), F.col(id_col).alias("rec_b")
    )
    pairs = (
        a.join(b, "_k")
        .filter(F.col("rec_a") < F.col("rec_b"))
        .groupBy("rec_a", "rec_b")
        .agg(
            F.sum(F.expr("1000000 DIV _bs")).cast("long").alias(
                "weight_micro"
            ),
            F.count("*").cast("long").alias("n_blocks"),
        )
    )
    if not prune:
        return pairs
    mean = pairs.agg(
        F.expr("sum(weight_micro) DIV count(*)").alias("_mean")
    )
    return pairs.crossJoin(F.broadcast(mean)).filter(
        F.col("weight_micro") > F.col("_mean")
    ).select("rec_a", "rec_b", "weight_micro", "n_blocks")


def clustering_pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Pairwise clustering evaluation → ONE row: (n_items, tp_pairs,
    pred_pairs, gold_pairs, p_micro, r_micro, f1_micro) — the standard
    entity-resolution / dedup quality metric, exact integers end to
    end.

    Pairwise P/R counts CO-CLUSTERED PAIRS: tp = pairs together in
    BOTH clusterings, precision = tp / pred-pairs, recall =
    tp / gold-pairs, F1 = 2·tp / (pred-pairs + gold-pairs).  None of
    it needs pair enumeration: the contingency table n_ij =
    |pred cluster i ∩ gold cluster j| gives tp = Σ C(n_ij, 2) and the
    marginals give the pair totals — three map-side-combinable
    groupBys over ONE join, however many pairs the clusters imply
    (a 10⁸-member cluster contributes ~10¹⁶ pairs as ONE row's
    arithmetic).  Items are restricted to ids present in BOTH
    assignments (documented: evaluate where both systems speak).
    Ratios ship in exact micro units by BIGINT floor division; all
    NULL-safe zero when a side has no pairs.
    """
    j = (
        pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p"))
        .join(
            gold.select(
                F.col(id_col).alias("_id"), F.col(gold_col).alias("_g")
            ),
            "_id",
        )
    )

    def pairs(df, cols):
        return (
            df.groupBy(*cols)
            .agg(F.count("*").cast("long").alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.col("n") * (F.col("n") - 1)), F.lit(0)
                ).cast("long").alias("p2")  # 2x the pair count — exact
            )
        )

    tp = pairs(j, ["_p", "_g"]).select(F.col("p2").alias("tp2"))
    pp = pairs(j, ["_p"]).select(F.col("p2").alias("pp2"))
    gp = pairs(j, ["_g"]).select(F.col("p2").alias("gp2"))
    n = j.agg(F.count("*").cast("long").alias("n_items"))
    return (
        n.crossJoin(tp).crossJoin(pp).crossJoin(gp)
        .select(
            "n_items",
            F.expr("tp2 div 2").cast("long").alias("tp_pairs"),
            F.expr("pp2 div 2").cast("long").alias("pred_pairs"),
            F.expr("gp2 div 2").cast("long").alias("gold_pairs"),
            F.when(
                F.col("pp2") > 0,
                F.expr("(1000000 * tp2) div pp2"),
            ).otherwise(0).cast("long").alias("p_micro"),
            F.when(
                F.col("gp2") > 0,
                F.expr("(1000000 * tp2) div gp2"),
            ).otherwise(0).cast("long").alias("r_micro"),
            F.when(
                F.col("pp2") + F.col("gp2") > 0,
                F.expr("(2000000 * tp2) div (pp2 + gp2)"),
            ).otherwise(0).cast("long").alias("f1_micro"),
        )
    )


def blocking_quality(
    records: DataFrame,
    block_col: str,
    gold_pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocking-scheme evaluation → ONE row
    (n_records, n_total_pairs, n_candidate_pairs, n_gold, n_covered,
    reduction_ratio_micro, pairs_completeness_micro).

    The two numbers every record-linkage blocking paper reports
    (Christen, TKDE 2012): reduction ratio RR = 1 − candidates/total
    (how much of the quadratic comparison space the blocks prune) and
    pairs completeness PC = covered gold / gold (how many TRUE matches
    survive the pruning).  ``block_col`` must assign each record to
    EXACTLY ONE block (a partitioning scheme — sorted-neighborhood keys,
    LSH needs the multi-block variant), so candidates = Σ_b C(n_b, 2)
    needs no cross-block dedup; ``gold_pairs`` is (a, b) truth.

    Everything is counting arithmetic on BIGINTs — total pairs C(n,2)
    from one count, candidates from the block-size histogram, coverage
    from joining each gold pair's two block keys — no pair
    materialization anywhere, so a mega-block is one row's arithmetic.
    Ratios in micro units by floor DIV.

    NULL block keys mean "record assigned to NO block": such records
    stay in ``n_records`` (they are part of the quadratic comparison
    space RR prunes) but contribute ZERO candidate pairs and can never
    cover a gold pair — consistent on both sides, because the coverage
    predicate ``_blk_a == _blk_b`` is NULL (false) for them and the
    candidate count below excludes the NULL size-group explicitly.
    """
    keyed = records.select(
        F.col(id_col).alias("_id"), F.col(block_col).alias("_blk")
    )
    sizes = keyed.groupBy("_blk").agg(F.count("*").cast("long").alias("n"))
    counts = sizes.agg(
        F.sum("n").cast("long").alias("n_records"),
        F.sum(
            F.when(F.col("_blk").isNotNull(), F.expr("n * (n - 1) DIV 2"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_candidate_pairs"),
    )
    ka = keyed.select(
        F.col("_id").alias("a"), F.col("_blk").alias("_blk_a")
    )
    kb = keyed.select(
        F.col("_id").alias("b"), F.col("_blk").alias("_blk_b")
    )
    gold = gold_pairs.select("a", "b").distinct()
    cov = (
        gold.join(ka, "a")
        .join(kb, "b")
        .agg(
            F.count("*").cast("long").alias("n_gold"),
            F.sum((F.col("_blk_a") == F.col("_blk_b")).cast("long"))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return counts.crossJoin(cov).select(
        "n_records",
        F.expr("n_records * (n_records - 1) DIV 2").alias("n_total_pairs"),
        "n_candidate_pairs",
        "n_gold",
        F.coalesce("n_covered", F.lit(0).cast("long")).alias("n_covered"),
        F.expr(
            "CASE WHEN n_records >= 2 THEN (1000000 * "
            "((n_records * (n_records - 1) DIV 2) - n_candidate_pairs))"
            " DIV (n_records * (n_records - 1) DIV 2) END"
        ).alias("reduction_ratio_micro"),
        F.expr(
            "CASE WHEN n_gold > 0 THEN"
            " (1000000 * coalesce(n_covered, 0)) DIV n_gold END"
        ).alias("pairs_completeness_micro"),
    )


def blocking_quality_pairs(
    candidate_pairs: DataFrame,
    gold_pairs: DataFrame,
    n_records: int,
) -> DataFrame:
    """RR/PC for a NON-partitioning blocking scheme (LSH bands,
    multi-pass sorted neighborhood — anything emitting an explicit
    distinct candidate-pair list) → the same one-row schema as
    :func:`blocking_quality`.

    ``candidate_pairs`` is the scheme's (doc_a, doc_b) output with
    a < b (e.g. :func:`..dedup.lsh_candidate_pairs`); candidates are
    counted distinct, coverage is a left-semi membership probe of the
    gold pairs — one equi-join on the pair key, no enumeration of the
    comparison space.  ``n_records`` supplies the C(n,2) denominator
    (a count the caller already has).
    """
    cand = candidate_pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).distinct()
    gold = gold_pairs.select("a", "b").distinct()
    covered = gold.join(cand, ["a", "b"], "left_semi")
    stats = cand.agg(
        F.count("*").cast("long").alias("n_candidate_pairs")
    ).crossJoin(
        gold.agg(F.count("*").cast("long").alias("n_gold"))
    ).crossJoin(
        covered.agg(F.count("*").cast("long").alias("n_covered"))
    )
    n = int(n_records)
    total = n * (n - 1) // 2
    return stats.select(
        F.lit(n).cast("long").alias("n_records"),
        F.lit(total).cast("long").alias("n_total_pairs"),
        "n_candidate_pairs",
        "n_gold",
        "n_covered",
        F.expr(
            f"CASE WHEN {total} >= 1 THEN"
            f" (1000000 * ({total} - n_candidate_pairs)) DIV {total} END"
        ).alias("reduction_ratio_micro"),
        F.expr(
            "CASE WHEN n_gold > 0 THEN"
            " (1000000 * n_covered) DIV n_gold END"
        ).alias("pairs_completeness_micro"),
    )
