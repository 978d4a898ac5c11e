"""Stage 3 — triple emission: mentions → (subj, pred, obj) rows.

The parity surface of BASELINE.json: the distinct (subj, pred, obj) set is
compared against the reference's emitted edge tables (P/R >= 0.95).

Predicate mapping (reference edge table → pred):
  publication_to_satellite      → MENTIONS_SATELLITE
      (/root/reference/analyze_sat_and_data_types_in_abstracts.py:74-97)
  publication_to_data_type      → MENTIONS_DATA_TYPE  (same file)
  satellite_type column         → HAS_MISSION
      (/root/reference/fast_regex_mission_id.py:252-269)
  publication_study_locations   → STUDY_LOCATION
      (/root/reference/populate_study_locations.py:79-109)
  publication_author_locations  → AUTHOR_LOCATED_IN
      (/root/reference/populate_author_locations.py:281-324)
  raw_topic_to_publication      → HAS_TOPIC
      (/root/reference/topic_discovery_pipeline.py:634-656; our miner is
      the deterministic TF-IDF substitute — excluded from the parity set)

Output schema:
  (subj string, pred string, obj string, doc_id long, surface string,
   method string, author string, year int)
subj = url (stable natural key); provenance columns mirror the reference's
matched_text / match_method (/root/reference/models.py:434-435).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import mentions as M
from .linking import link_affiliations

PARITY_PREDS = (
    "MENTIONS_SATELLITE",
    "MENTIONS_DATA_TYPE",
    "HAS_MISSION",
    "STUDY_LOCATION",
    "AUTHOR_LOCATED_IN",
)

_KIND_TO_PRED = {
    "satellite": "MENTIONS_SATELLITE",
    "data_type": "MENTIONS_DATA_TYPE",
    "mission": "HAS_MISSION",
    "study_location": "STUDY_LOCATION",
}


def _shape(mentions: DataFrame, docs: DataFrame, pred_map: dict[str, str]) -> DataFrame:
    pred = F.col("kind")
    for kind, name in pred_map.items():
        pred = F.when(F.col("kind") == kind, name).otherwise(pred)
    keys = docs.select("doc_id", "url", "year")
    return mentions.join(keys, "doc_id").select(
        F.col("url").alias("subj"),
        pred.alias("pred"),
        F.col("entity").alias("obj"),
        "doc_id",
        "surface",
        "method",
        F.lit(None).cast("string").alias("author"),
        "year",
    )


def emit_triples(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """documents → triples (all mention families unioned).

    The three Python mention families (mission regex bank, study
    locations, affiliation segmenting) run as ONE fused Arrow pass over
    the doc text, materialized once (localCheckpoint) and split by kind —
    the corpus is read once, not three times.  The dictionary substring
    scans stay pure-JVM broadcast contains-joins on the same docs scan.
    """
    sat_terms = M.dictionary_terms(spark, "satellite")
    dt_terms = M.dictionary_terms(spark, "data_type")

    fused = M.fused_python_mentions(docs).localCheckpoint(eager=False)

    py_mentions = fused.filter(F.col("kind") != "affiliation_segment").select(
        "doc_id", "kind", "surface", "entity", "method",
        F.lit(None).cast("string").alias("extra"),
    )
    mention_union = (
        M.substring_mentions(docs, sat_terms)
        .unionByName(M.substring_mentions(docs, dt_terms))
        .unionByName(py_mentions)
    )
    base = _shape(mention_union, docs, _KIND_TO_PRED)

    segments = fused.filter(F.col("kind") == "affiliation_segment").select(
        "doc_id",
        "affiliation_index",
        "author_name",
        "author_index",
        "raw_author_group",
        F.col("entity").alias("affiliation_text"),
    )
    linked = link_affiliations(segments).filter(F.col("location").isNotNull())
    keys = docs.select("doc_id", "url", "year")
    author_triples = linked.join(keys, "doc_id").select(
        F.col("url").alias("subj"),
        F.lit("AUTHOR_LOCATED_IN").alias("pred"),
        F.col("location").alias("obj"),
        "doc_id",
        F.col("affiliation_text").alias("surface"),
        "method",
        F.col("author_name").alias("author"),
        "year",
    )

    return base.unionByName(author_triples)


def parity_triples(triples: DataFrame) -> DataFrame:
    """The distinct (subj, pred, obj) set compared against the reference."""
    return (
        triples.filter(F.col("pred").isin(*PARITY_PREDS))
        .select("subj", "pred", "obj")
        .distinct()
    )


def negative_triples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 2,
    seed: str = "neg",
    entity_col: str = "entity",
    n_buckets: int = 64,
) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (Bordes et
    al., TransE, NIPS'13) → (subj, pred, obj_neg, neg_idx).

    For every true (subj, pred, obj) triple, ``k`` corrupted negatives:
    the object is replaced by a pseudo-random entity drawn from
    ``entities`` by deterministic hash index, then FILTERED — a corrupt
    candidate that equals the true object or collides with ANY true
    (subj, pred, ·) triple is dropped (so negatives are guaranteed
    false, the "filtered" protocol every KG-embedding paper evaluates
    under).  Seeded-hash draws make the sample bit-identical across
    engines, partitionings and retries.

    Entity indexing is the scale story: the draw needs a dense 0..n-1
    rank over the entity vocabulary, and ONE global row_number is a
    single-partition sort.  Rank order is DEFINED as
    (porthash64(entity), entity) and computed in two phases (the
    pack_documents distributed prefix-sum idiom): ranks within
    ``n_buckets`` hash-prefix buckets under a partitioned window, plus
    broadcast bucket offsets from a B-row aggregate.  Bucket id is the
    hash's HIGH bits, so bucket-major order IS hash order and the
    DuckDB oracle can replay the rank with one global window.
    """
    from pyspark.sql.window import Window

    from .dedup import porthash64

    h = porthash64(F.col("cand").cast("string"), seed)
    bits = max(1, (n_buckets - 1).bit_length())
    base = entities.select(F.col(entity_col).alias("cand")).distinct().select(
        "cand",
        h.alias("h"),
        F.shiftright(h, 60 - bits).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("h", "cand")
    local = base.withColumn("local_rank", F.row_number().over(w))
    totals = base.groupBy("bucket").agg(F.count("*").alias("bucket_n"))
    wp = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefixes = totals.select(
        "bucket",
        (F.sum("bucket_n").over(wp) - F.col("bucket_n")).alias("bucket_prefix"),
    )
    indexed = local.join(F.broadcast(prefixes), "bucket").select(
        "cand",
        (F.col("bucket_prefix") + F.col("local_rank") - 1).alias("idx"),
    )
    n = indexed.count()
    if n == 0:
        raise ValueError("entities is empty")

    true = triples.select("subj", "pred", "obj").distinct()
    drawn = true.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("neg_idx"),
    ).select(
        "subj",
        "pred",
        "obj",
        "neg_idx",
        F.pmod(
            porthash64(
                F.concat_ws(
                    "\x1f",
                    F.col("subj").cast("string"),
                    F.col("pred").cast("string"),
                    F.col("obj").cast("string"),
                    F.col("neg_idx").cast("string"),
                ),
                seed,
            ),
            F.lit(n),
        ).alias("idx"),
    )
    # plain equi-join on idx: the entity vocabulary can be ~10^9 rows at
    # the design scale, so no broadcast hint — AQE promotes it when small
    corrupted = (
        drawn.join(indexed, "idx")
        .filter(F.col("cand") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("cand").alias("obj_neg"),
            "neg_idx",
        )
    )
    return corrupted.join(
        true.select(
            "subj", "pred", F.col("obj").alias("obj_neg")
        ).distinct(),
        ["subj", "pred", "obj_neg"],
        "left_anti",
    )
