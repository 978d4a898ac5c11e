"""Stage 1 — web_pages → documents (extraction).

Spark-first shape: one Arrow-batched ``mapInPandas`` pass computing the
extracted text (html → text kernel when the ``text`` field is NULL — the
reference analog of TSV field decoding, /root/reference/file_scanner.py:
91-122), plus JVM-side derived columns (doc_id, year) so Catalyst keeps
pruning/pushdown around the UDF.

documents schema:
  doc_id: long (xxhash64(url) — deterministic, resume-stable; replaces the
          reference's autoincrement PKs, /root/reference/models.py:64)
  url, lang: string
  warc_ts: timestamp, year: int (partition column at scale)
  text: string   (byte-identical per url — the input_hint invariant)
  title / abstract / affiliations: string (first line / middle / last block,
          mirroring the synthetic payload contract and the reference's
          title/abstract/author_affiliations columns, models.py:66-82)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.textkernels import extract_text_from_html

EXTRACT_SCHEMA = "url string, warc_ts timestamp, lang string, text string"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        text = batch["text"].copy()
        missing = text.isna()
        if missing.any():
            text.loc[missing] = batch.loc[missing, "html"].map(
                extract_text_from_html
            )
        yield pd.DataFrame(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "text": text,
            }
        )


def extract_documents(web_pages: DataFrame, lang: str | None = None) -> DataFrame:
    """web_pages → documents.  Pure DataFrame plan; no driver-side loops.

    The metadata columns ride through the Arrow UDF so the html bytes are
    dropped inside the extraction pass — no re-join, no shuffle, and the
    same plan runs unmodified on a streaming DataFrame.
    """
    pages = web_pages
    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)

    docs = pages.select("url", "warc_ts", "lang", "html", "text").mapInPandas(
        _extract_batches, schema=EXTRACT_SCHEMA
    )

    # title = first line; affiliations = last line when it contains a
    # bracketed author group; abstract = everything in between.
    lines = F.split(F.col("text"), "\n")
    n = F.size(lines)
    last = F.element_at(lines, -1)
    has_affil = last.contains("[") & last.contains("]") & (n >= F.lit(3))
    return docs.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "lang",
        "warc_ts",
        F.year("warc_ts").alias("year"),
        "text",
        F.element_at(lines, 1).alias("title"),
        F.array_join(
            F.slice(lines, 2, F.when(has_affil, n - 2).otherwise(n - 1)), " "
        ).alias("abstract"),
        F.when(has_affil, last).alias("affiliations"),
    )


# Hearst-pattern bank: (pattern_name, regex, hypernym group, hyponym group).
# Single-token captures keep the regex portable — Spark (Java regex) and
# DuckDB (RE2) agree on sequential non-overlapping scans of these shapes.
HEARST_PATTERNS: tuple[tuple[str, str, int, int], ...] = (
    ("such_as", r"([a-z0-9-]+) such as ([a-z0-9-]+)", 1, 2),
    ("and_other", r"([a-z0-9-]+) and other ([a-z0-9-]+)", 2, 1),
    ("including", r"([a-z0-9-]+) including ([a-z0-9-]+)", 1, 2),
)


def hearst_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hearst-pattern hypernym extraction (Hearst, COLING'92) →
    (``id_col``, pattern, hyper, hypo): one row per pattern instance —
    the lexico-syntactic IS-A miner that seeds a taxonomy from raw web
    text ("engines such as spark" ⇒ spark IS-A engine).

    Three classic patterns (X *such as* Y; Y *and other* X;
    X *including* Y) over lowercased text, single-token noun slots.
    Each pattern is TWO ``regexp_extract_all`` calls (hyper group, hypo
    group) zipped positionally — the i-th elements of both arrays come
    from the i-th match, so the pairing is exact without any per-row
    Python.  All three scans are narrow projections of one text column;
    Catalyst collapses them into a single WholeStageCodegen pass over
    the scan — no shuffle until the caller aggregates.

    Duplicate instances within a document are KEPT (instance-level
    output); aggregate to (hyper, hypo) support counts at the call
    site, where the doc-frequency threshold belongs.
    """
    parts = []
    for name, pat, gh, gx in HEARST_PATTERNS:
        zipped = F.arrays_zip(
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{pat}', {gh})"
            ).alias("hyper"),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{pat}', {gx})"
            ).alias("hypo"),
        )
        parts.append(
            docs.select(
                F.col(id_col),
                F.lit(name).alias("pattern"),
                F.explode(zipped).alias("m"),
            ).select(
                id_col,
                "pattern",
                F.col("m.hyper").alias("hyper"),
                F.col("m.hypo").alias("hypo"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
