"""Affiliation enrichment stages (VERDICT r01 missing #3).

Spark-first re-expression of the reference's two enrichment scripts:

- :func:`clean_affiliations` — the H6 ``split_affiliation_and_place``
  kernel applied once per DISTINCT affiliation text, joined back to the
  author×segment rows (the reference loops every row through the kernel,
  /root/reference/populate_cleaned_author_affiliations.py:260-295; at
  10^12 docs the distinct-first shape does the Python work on the ~10^6
  unique surfaces instead of the 10^10 segment rows).
- :func:`affiliation_type_distances` — cosine similarity of every cleaned
  affiliation to the five seed affiliation types
  (/root/reference/populate_author_affiliation_type_distances.py:142-199;
  type list from populate_affiliation_type_embeddings_openai.py:17-23).
  OpenAI embeddings are out of sandbox scope — the hashed-TF embedding
  (operators/embedding.py, same contract) stands in, documented in
  SURVEY.md §2 J1/J2.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspark.sql import SparkSession
from pyspark.sql.window import Window

from ._parallel import spread_for_python

from ..functions import textkernels as K
from .embedding import hashed_doc_embeddings, similarity_to_dims

# (name, embedded description) — data copied from the reference's seed list,
# populate_affiliation_type_embeddings_openai.py:17-23.
AFFILIATION_TYPES: list[tuple[str, str]] = [
    ("academic", "Academic (universities, colleges)"),
    ("government", "Government (ministries, agencies, national labs)"),
    ("private", "Private (for-profit)"),
    ("nonprofit", "Nonprofit/NGO"),
    ("intergovernmental", "Intergovernmental/Multilateral"),
]

_CLEAN_SCHEMA = (
    "affiliation_text string, cleaned_affiliation string, place string"
)


def _clean_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        cleaned, places = [], []
        for text in batch["affiliation_text"]:
            c, p = K.split_affiliation_and_place(text or "")
            cleaned.append(c)
            places.append(p)
        yield pd.DataFrame(
            {
                "affiliation_text": batch["affiliation_text"],
                "cleaned_affiliation": cleaned,
                "place": places,
            }
        )


def clean_affiliations(segments: DataFrame) -> DataFrame:
    """segments (+affiliation_text) → + (cleaned_affiliation, place).

    The Arrow kernel pass runs on DISTINCT texts only; the join back is a
    plain equi join on the text (AQE broadcasts it when small).
    """
    uniq = spread_for_python(
        segments.select("affiliation_text")
        .filter(F.col("affiliation_text").isNotNull())
        .distinct()
    ).mapInPandas(_clean_batches, schema=_CLEAN_SCHEMA)
    return segments.join(uniq, "affiliation_text", "left").select(
        *segments.columns, "cleaned_affiliation", "place"
    )


def affiliation_type_dims(spark: SparkSession, dim: int = 64) -> DataFrame:
    """(dim_id=type name, embedding) for the five seed affiliation types."""
    types = spark.createDataFrame(
        AFFILIATION_TYPES, "type_name string, description string"
    )
    return hashed_doc_embeddings(
        types, dim=dim, id_col="type_name", text_col="description"
    ).withColumnRenamed("doc_id", "type_name")


def affiliation_type_distances(
    spark: SparkSession,
    cleaned: DataFrame,
    top_k: int = 5,
    dim: int = 64,
) -> DataFrame:
    """(doc_id, affiliation_index, affiliation_type, semantic_similarity).

    Embeds DISTINCT cleaned texts (hashed TF), broadcast-crosses the five
    type vectors (C10/I5 shape), keeps the per-text top_k, then joins back
    to the segment grain — the reference's ON CONFLICT upsert key
    (author_location_id, affiliation_type_id) maps to
    (doc_id, affiliation_index, affiliation_type).
    """
    texts = (
        cleaned.select("cleaned_affiliation")
        .filter(
            F.col("cleaned_affiliation").isNotNull()
            & (F.col("cleaned_affiliation") != "")
        )
        .distinct()
    )
    emb = hashed_doc_embeddings(
        texts, dim=dim, id_col="cleaned_affiliation", text_col="cleaned_affiliation"
    ).withColumnRenamed("doc_id", "cleaned_affiliation")
    dims = affiliation_type_dims(spark, dim=dim)
    sims = similarity_to_dims(
        emb,
        dims,
        id_col="cleaned_affiliation",
        dim_id_col="type_name",
    ).withColumnRenamed("doc_id", "cleaned_affiliation")
    w = Window.partitionBy("cleaned_affiliation").orderBy(
        F.desc("similarity"), F.asc("dim_id")
    )
    top = (
        sims.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_k)
        .select(
            "cleaned_affiliation",
            F.col("dim_id").alias("affiliation_type"),
            F.round("similarity", 6).alias("semantic_similarity"),
        )
    )
    return (
        cleaned.select("doc_id", "affiliation_index", "cleaned_affiliation")
        .distinct()
        .join(top, "cleaned_affiliation")
        .select(
            "doc_id",
            "affiliation_index",
            "affiliation_type",
            "semantic_similarity",
        )
    )
