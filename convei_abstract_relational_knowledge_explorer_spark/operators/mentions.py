"""Stage 2 — mention detection over documents.

Four detector families, each choosing the *fastest Spark shape* for its
semantics (SURVEY.md §2.H):

- substring dictionary scan (satellites, data types): pure JVM — a
  broadcast cross join with a ``contains`` residual predicate.  21 x N and
  15 x N comparisons stay inside whole-stage codegen; no Python involved.
  Semantics parity: ``name.lower() in abstract.lower()``
  (/root/reference/analyze_sat_and_data_types_in_abstracts.py:74-85).

- mission regex bank (45 verbose alternations with lookaheads): Arrow
  pandas UDF; patterns compile once per executor at module import.
  Parity: /root/reference/fast_regex_mission_id.py:252-269.

- study locations (word-bounded longest-first alternations over the
  normalized abstract): Arrow pandas UDF with module-cached matchers.
  Parity: /root/reference/populate_study_locations.py:35-109.

- affiliation segments (bracket-aware parsing → per-segment rows):
  ``mapInPandas`` explode.  Parity:
  /root/reference/populate_author_locations.py:154-224.

All outputs share the mentions schema:
  (doc_id, kind, surface, entity, method, extra)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import _dictdata as D
from ..functions import textkernels as K
from ._parallel import ensure_parallel_scan

# ---------------------------------------------------------------------------
# executor-side singletons (compiled once per Python worker)
# ---------------------------------------------------------------------------

_STUDY_MATCHERS = None


def _study_matchers():
    global _STUDY_MATCHERS
    if _STUDY_MATCHERS is None:
        _STUDY_MATCHERS = K.build_study_location_matchers()
    return _STUDY_MATCHERS


# ---------------------------------------------------------------------------
# substring dictionary scans — JVM-side broadcast join, zero Python
# ---------------------------------------------------------------------------


def dictionary_terms(spark: SparkSession, kind: str) -> DataFrame:
    """Tiny dimension of (kind, term) rows, to be broadcast."""
    terms = {
        "satellite": D.SATELLITE_NAMES,
        "data_type": [t for t in D.DATA_TYPE_NAMES],
    }[kind]
    return spark.createDataFrame(
        [(kind, t, t.lower()) for t in terms], "kind string, term string, term_lc string"
    )


def substring_mentions(docs: DataFrame, terms: DataFrame, text_col: str = "abstract") -> DataFrame:
    """Broadcast NL-join: docs x terms filtered on contains(lower(text), term).

    The 100 TB shape: the dim side is tiny, so Catalyst picks
    BroadcastNestedLoopJoin and the contains predicate runs inside
    whole-stage codegen; the fact side never shuffles.
    """
    return (
        docs.select("doc_id", F.lower(F.col(text_col)).alias("_hay"))
        .join(
            F.broadcast(terms),
            F.col("_hay").contains(F.col("term_lc")),
            "inner",
        )
        .select(
            "doc_id",
            "kind",
            F.col("term").alias("surface"),
            F.col("term").alias("entity"),
            F.lit("substring").alias("method"),
            F.lit(None).cast("string").alias("extra"),
        )
    )


# ---------------------------------------------------------------------------
# mission regex bank — Arrow pandas UDF
# ---------------------------------------------------------------------------

_MISSION_SCHEMA = "doc_id long, entity string"


def _mission_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        out_ids: list[int] = []
        out_labels: list[str] = []
        combined = batch["title"].fillna("") + " " + batch["abstract"].fillna("")
        for doc_id, text in zip(batch["doc_id"], combined):
            for label in K.detect_mission_labels(text):
                out_ids.append(doc_id)
                out_labels.append(label)
        yield pd.DataFrame({"doc_id": out_ids, "entity": out_labels})


def mission_mentions(docs: DataFrame) -> DataFrame:
    """Mission labels from the 45-group regex bank (title + abstract)."""
    return (
        docs.select("doc_id", "title", "abstract")
        .mapInPandas(_mission_batches, schema=_MISSION_SCHEMA)
        .select(
            "doc_id",
            F.lit("mission").alias("kind"),
            F.col("entity").alias("surface"),
            "entity",
            F.lit("regex-bank").alias("method"),
            F.lit(None).cast("string").alias("extra"),
        )
    )


# ---------------------------------------------------------------------------
# study locations — Arrow pandas UDF with cached longest-first matchers
# ---------------------------------------------------------------------------

_STUDY_SCHEMA = "doc_id long, entity string, surface string, method string"


def _study_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    matchers = _study_matchers()
    for batch in batches:
        ids, ents, surfs, methods = [], [], [], []
        for doc_id, abstract in zip(batch["doc_id"], batch["abstract"]):
            for loc, surface, method in K.match_study_locations(abstract, matchers):
                ids.append(doc_id)
                ents.append(loc)
                surfs.append(surface)
                methods.append(method)
        yield pd.DataFrame(
            {"doc_id": ids, "entity": ents, "surface": surfs, "method": methods}
        )


def study_location_mentions(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", "abstract")
        .filter(F.col("abstract").isNotNull() & (F.col("abstract") != ""))
        .mapInPandas(_study_batches, schema=_STUDY_SCHEMA)
        .select(
            "doc_id",
            F.lit("study_location").alias("kind"),
            "surface",
            "entity",
            "method",
            F.lit(None).cast("string").alias("extra"),
        )
    )


# ---------------------------------------------------------------------------
# affiliation segments — mapInPandas explode (one row per author x segment)
# ---------------------------------------------------------------------------

_SEGMENT_SCHEMA = (
    "doc_id long, affiliation_index int, author_name string, "
    "author_index int, raw_author_group string, affiliation_text string"
)


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        rows = []
        for doc_id, affil in zip(batch["doc_id"], batch["affiliations"]):
            if not affil:
                continue
            for seg in K.parse_affiliation_segments(affil):
                authors = seg.authors or [""]
                for author_index, author in enumerate(authors):
                    rows.append(
                        (
                            doc_id,
                            seg.affiliation_index,
                            author,
                            author_index if author else None,
                            seg.raw_author_group,
                            seg.affiliation_text,
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "affiliation_index",
                "author_name",
                "author_index",
                "raw_author_group",
                "affiliation_text",
            ],
        )


def affiliation_segments(docs: DataFrame) -> DataFrame:
    """One row per author x affiliation segment (reference row shape at
    /root/reference/populate_author_locations.py:311-322)."""
    return ensure_parallel_scan(
        docs.select("doc_id", "affiliations")
        .filter(F.col("affiliations").isNotNull() & (F.col("affiliations") != ""))
    ).mapInPandas(_segment_batches, schema=_SEGMENT_SCHEMA)


# ---------------------------------------------------------------------------
# fused Python pass — missions + study locations + affiliation segments in
# ONE scan of the doc text (one Arrow round-trip instead of three; at the
# 100 TB design point this is the difference between reading the corpus
# once and three times)
# ---------------------------------------------------------------------------

_FUSED_SCHEMA = (
    "doc_id long, kind string, entity string, surface string, method string, "
    "affiliation_index int, author_name string, author_index int, "
    "raw_author_group string"
)


def _fused_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    matchers = _study_matchers()
    for batch in batches:
        rows = []
        for doc_id, title, abstract, affil in zip(
            batch["doc_id"], batch["title"], batch["abstract"],
            batch["affiliations"],
        ):
            title = title or ""
            abstract = abstract or ""
            combined = (title + " " + abstract) if (title or abstract) else ""
            for label in K.detect_mission_labels(combined):
                rows.append(
                    (doc_id, "mission", label, label, "regex-bank",
                     None, None, None, None)
                )
            for loc, surface, method in K.match_study_locations(
                abstract, matchers
            ):
                rows.append(
                    (doc_id, "study_location", loc, surface, method,
                     None, None, None, None)
                )
            if affil:
                for seg in K.parse_affiliation_segments(affil):
                    authors = seg.authors or [""]
                    for author_index, author in enumerate(authors):
                        rows.append(
                            (
                                doc_id, "affiliation_segment",
                                seg.affiliation_text, seg.affiliation_text,
                                "segment", seg.affiliation_index, author,
                                author_index if author else None,
                                seg.raw_author_group,
                            )
                        )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "kind", "entity", "surface", "method",
                "affiliation_index", "author_name", "author_index",
                "raw_author_group",
            ],
        )


def fused_python_mentions(docs: DataFrame) -> DataFrame:
    """All three Python mention families from a single pass over the docs.

    The scan is widened to the core count first when the input is a
    small delta (an increment's staged batch is one ~64 MB file = ONE
    split; the kernel here is the pipeline's most expensive Python pass
    and must not run serially) — a full corpus stage already scans wide
    and skips the repartition (operators/_parallel.py).
    """
    return ensure_parallel_scan(
        docs.select("doc_id", "title", "abstract", "affiliations")
    ).mapInPandas(_fused_batches, schema=_FUSED_SCHEMA)
