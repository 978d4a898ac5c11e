"""PII detection and redaction (training-data curation stage).

Every public LLM curation pipeline (C4, Dolma, RedPajama-v2, FineWeb)
carries a personally-identifiable-information pass before training: find
and mask emails, phone numbers, and IP addresses.  The reference repo
handles author emails as a *column* (``wos_tsv`` EM field); a web-scale
corpus needs the in-text scrub.

Spark-first shape: everything is JVM ``regexp_extract_all`` /
``regexp_replace`` — narrow, shuffle-free, whole-stage-codegen,
row-count preserving.  The patterns are deliberately restricted to the
RE2-compatible subset (no backrefs, no lookaround) so the identical
regex runs in DuckDB and the whole pass is oracle-checkable; they are
applied in a FIXED, documented order (email → ipv4 → phone) so
overlapping matches resolve identically in every engine.

100 TB shape: per-row regex over a projected text column — embarrassingly
parallel, no shuffle, no state; cost is one codegen'd scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Ordered: applied top-to-bottom.  Email first (its local part may
# contain digits/dots that the looser numeric patterns would bite into),
# then IPv4 (dotted quads must not be half-eaten by the phone pattern),
# then phone.  RE2-compatible: no lookaround, no backreferences.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def detect_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts → (doc_id, n_email, n_ipv4, n_phone).

    Counts follow the same fixed application order as :func:`redact_pii`
    — each pattern counts matches in the text with the PRIOR categories
    already masked, so a dotted quad is never double-counted as a phone
    and the counts are exactly the number of replacements redaction
    performs.  All-integer output, exactly replayable in ANSI SQL.
    """
    masked = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        masked = F.regexp_replace(masked, pat, token)
    return docs.select(F.col(id_col).alias("doc_id"), *counts)


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Counts AND redacted text in ONE projection →
    (doc_id, n_email, n_ipv4, n_phone, text_redacted).

    The audit form: what :func:`detect_pii` + :func:`redact_pii` would
    give joined on doc_id, without the join — a single narrow
    shuffle-free pass (Catalyst CSE shares the intermediate masked
    stages between the count and replace expressions).
    """
    masked = F.col(text_col)
    cols = []
    for name, pat, token in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        masked = F.regexp_replace(masked, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *cols,
        masked.alias("text_redacted"),
    )


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask PII in place → all input columns with ``text_col`` redacted.

    Chained global ``regexp_replace`` in the documented order; row-count
    and schema preserving, so the stage drops into any curation
    composition (`plans/curation.py`) between quality filtering and
    dedup.
    """
    masked = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, token)
    return docs.withColumn(text_col, masked)


def k_anonymity_generalize(
    df: DataFrame,
    static_qi: list[str],
    ladder: list,
    k: int,
    sensitive_col: str,
    l_diversity: int = 2,
) -> DataFrame:
    """Samarati-style minimal generalization for k-anonymity → the
    quasi-identifier groups at the LOWEST ladder level where every
    group reaches size ≥ k: (level, *static_qi, bucket, group_size,
    n_sensitive, l_ok).

    The training-data governance gate: before user-derived records
    (search logs, profile joins, annotator tables) enter a corpus, the
    quasi-identifier combination (static columns + one progressively
    coarsened column given as ``ladder`` — a list of Column
    expressions, finest first, typically ending in a constant =
    full suppression) must not isolate fewer than ``k`` individuals.
    The minimal qualifying level is chosen (monotonicity: coarsening
    only merges groups, so group sizes are non-decreasing in level);
    if even the coarsest level fails — some static-QI slice holds
    under k rows — the coarsest is returned with its violations
    visible, never silently dropped.  ``l_ok`` flags groups meeting
    distinct-l-diversity on ``sensitive_col`` (k-anonymity alone is
    defeated by a homogeneous group; Machanavajjhala et al., ICDE'06).

    One scan: every level's bucket is computed in a single
    ``posexplode`` over the ladder array, group stats are one
    map-side-combinable groupBy, level selection is a 4-row broadcast
    — fully declarative, no driver collect, replayed verbatim in SQL.
    """
    if not ladder:
        raise ValueError("k_anonymity_generalize needs >= 1 ladder level")
    leveled = df.select(
        *static_qi,
        F.col(sensitive_col).alias("_sens"),
        F.posexplode(
            F.array(*[e.cast("long") for e in ladder])
        ).alias("level", "bucket"),
    )
    stats = leveled.groupBy("level", *static_qi, "bucket").agg(
        F.count("*").cast("long").alias("group_size"),
        F.countDistinct("_sens").cast("long").alias("n_sensitive"),
    )
    per_level = stats.groupBy("level").agg(
        F.min("group_size").alias("_min_size")
    )
    chosen = per_level.agg(
        F.coalesce(
            F.min(F.when(F.col("_min_size") >= k, F.col("level"))),
            F.max("level"),
        ).alias("level")
    )
    return (
        stats.join(F.broadcast(chosen), "level")
        .select(
            "level",
            *static_qi,
            "bucket",
            "group_size",
            "n_sensitive",
            (F.col("n_sensitive") >= l_diversity).alias("l_ok"),
        )
    )
