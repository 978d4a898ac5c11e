"""Training-data curation plan: the operator families composed end to end.

The flow every large-scale text-corpus pipeline runs before training
(C4 / Gopher / RefinedWeb lineage — all public papers), here as ONE
declarative composition of this repo's operators:

    documents
      │ 0. canonical-URL dedup    (urls.url_duplicates keeper anti-join,
      │                            when a url column exists)
      │ 1. language filter        (text_analysis.language_scores)
      │ 2. quality gate           (text_analysis.quality_scores)
      │ 3. repetition gate        (text_analysis.repetition_scores)
      │ 4. exact dedup            (dedup.exact_duplicate_losers → anti-join)
      │ 5. near-dedup             (dedup.minhash_near_duplicates
      │                            → connected components → keeper only)
      │ 6. decontamination        (dedup.benchmark_contamination
      │                            anti-join, when a benchmark is given)
      │ 7. shard assignment       (sampling.assign_shards)
      ▼
    curated (doc_id, text, lang, n_chars, shard) + per-step stats

Every step is a JVM-native declarative plan (no per-row Python anywhere);
the near-dup keeper choice is the component's min doc_id, so the result
is deterministic and partition-independent.  At the 10^12-doc point each
gate is a narrow filter over one scan, the dedups are the bucketed
shapes documented in operators/dedup.py, and shard ranking runs within
date partitions (``assign_shards(within=...)``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators import dedup, sampling, text_analysis, urls
from ..operators.components import connected_components


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.2,
    max_top2_frac: float = 0.5,
    max_dup5_frac: float = 0.5,
    near_dup_threshold: float = 0.85,
    n_shards: int = 8,
    url_col: str | None = None,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 13,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation flow; returns (curated_docs, per_step_counts).

    The counts dict records survivors after each gate — the numbers a
    curation report needs (each is one count job over a narrow plan).

    ``url_col``: when given, stage 0 drops every non-keeper raw variant
    of a canonical URL before any text gate runs (the cheapest dedup
    first — one narrow canonicalization + one aggregate).
    ``benchmark``: when given, docs sharing a verbatim
    ``contamination_ngram``-token run with any benchmark doc are dropped
    after near-dedup (GPT-3 appendix-C decontamination).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *[c for c in docs.columns if c not in (id_col, text_col)],
    )
    stats: dict[str, int] = {"input": base.count()}

    if url_col is not None:
        canon = base.select(
            "doc_id", urls.canonicalize_url(url_col).alias("_curl")
        )
        keepers = canon.groupBy("_curl").agg(F.min("doc_id").alias("doc_id"))
        base = base.join(
            keepers.select("doc_id"), "doc_id", "left_semi"
        )
        stats["after_url_dedup"] = base.count()

    lang_ok = base.join(
        text_analysis.language_scores(base)
        .filter(F.col("lang_pred").isin(*keep_langs))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    stats["after_language"] = lang_ok.count()

    qual_ok = lang_ok.join(
        text_analysis.quality_scores(lang_ok)
        .filter(F.col("quality") >= min_quality)
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    stats["after_quality"] = qual_ok.count()

    rep_ok = qual_ok.join(
        text_analysis.repetition_scores(qual_ok)
        .filter(
            (F.col("top2_frac") <= max_top2_frac)
            & (F.col("dup5_frac") <= max_dup5_frac)
        )
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    stats["after_repetition"] = rep_ok.count()

    # exact dedup: drop every member of a fingerprint group except its
    # min-id keeper — join-based (no member arrays), so a C4-scale
    # boilerplate cluster never materializes as one row (r03 #1)
    exact_ok = rep_ok.join(
        dedup.exact_duplicate_losers(rep_ok), "doc_id", "left_anti"
    )
    stats["after_exact_dedup"] = exact_ok.count()

    # near-dedup: MinHash-LSH candidate pairs verified by exact Jaccard,
    # connected components over surviving pairs, keep each component's
    # min doc_id (deterministic, partition-independent)
    pairs = dedup.minhash_near_duplicates(
        exact_ok, threshold=near_dup_threshold
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(pairs)
    near_losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    near_ok = exact_ok.join(near_losers, "doc_id", "left_anti")
    stats["after_near_dedup"] = near_ok.count()

    if benchmark is not None:
        contaminated = dedup.benchmark_contamination(
            near_ok, benchmark, n=contamination_ngram, text_col="text"
        ).select("doc_id")
        near_ok = near_ok.join(contaminated, "doc_id", "left_anti")
        stats["after_decontamination"] = near_ok.count()

    size = (
        F.col("n_chars")
        if "n_chars" in near_ok.columns
        else F.length("text").alias("n_chars")
    )
    sized = near_ok.withColumn("n_chars", size)
    curated = sized.join(
        sampling.assign_shards(sized, n_shards=n_shards), "doc_id"
    )
    return curated, stats
