"""Ranked retrieval over the documents table: TF, document length
normalization, and BM25 scoring — all JVM-native column expressions.

The reference ranks explorer search hits client-side over SQLite FTS
(explorer HTML + the report CSVs); here ranking is a first-class
distributed operator: one token explode, one broadcast semi-join on the
query terms, one groupBy per (doc, term), one per-doc sum.  Everything
stays inside whole-stage codegen; the corpus statistics (df per term,
average document length) are one extra aggregate over the SAME exploded
frame, so the whole plan is two shuffles (doc-term, then doc) plus two
scalar/broadcast-sized aggregates regardless of corpus size.

BM25 (Robertson/Spärck Jones; the Lucene +1 idf form, which is
non-negative for every df):

    idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(d, q) = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))

Scale notes: the query-term list is a literal broadcast (queries are
tiny); df and avgdl are map-side-combinable aggregates; a 100 TB corpus
pays one exploded-token shuffle hashed on (doc_id, token) — the same
shape as q13's document-frequency plan — and the final per-doc sum is
partial-aggregated.  No window, no sort except the optional top-k,
which is a global TakeOrderedAndProject (driver-sized k).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from .text_analysis import TOKEN_PATTERN


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")
        ).alias("token"),
    )


def bm25_scores(docs: DataFrame, terms: list[str], id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term.

    ``terms`` are matched as whole tokens after the engine's standard
    lowercase tokenization (the q12/q13 token rule).  Scores use corpus
    statistics computed over ``docs`` itself; N, df and avgdl are exact.
    """
    terms = sorted({t.lower() for t in terms})
    toks = _doc_tokens(docs, id_col, text_col)
    # per-doc length (every token), BEFORE restricting to query terms
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_and_avg = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtok = toks.filter(F.col("token").isin(terms))
    tf = qtok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = (
        tf.groupBy("token").agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )


def bm25_top_k(docs: DataFrame, terms: list[str], k: int = 20,
               id_col: str = "doc_id", text_col: str = "text",
               k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(rank, doc_id, score) — global top-``k`` BM25 hits, doc_id
    tie-break so the cut is deterministic.  orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows
    — no global sort), the q20 plan shape."""
    scored = bm25_scores(docs, terms, id_col, text_col, k1, b)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    top_k: int | None = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack, Clarke
    & Büttcher, SIGIR'09) → (id, rrf_micro, n_lists): the standard way
    a hybrid retriever combines a lexical (BM25) and a semantic
    (embedding-cosine) ranking without score calibration — each list
    contributes 1/(k0 + rank), summed per document.

    Contributions are held in integer MICRO units
    (``1_000_000 div (k0 + rank)``) so the fused score is exact BIGINT
    arithmetic — deterministic cross-engine, no float-sum ordering
    sensitivity — and the ranks themselves come from the caller's
    already-deterministic (score DESC, id) row_numbers.

    Plan shape: one unionByName of the (id, rank) lists (each already
    top-k sized, so the union is k·N rows regardless of corpus size) →
    one groupBy(id) sum → TakeOrderedAndProject for the final cut.
    Nothing here ever touches the corpus again; at 100 TB the cost
    lives entirely in the input rankings.

    The reference ranks explorer hits with a single SQLite FTS score
    (explorer HTML); fusion of independent rankers is the
    training-data-pipeline extension (hybrid retrieval for hard-negative
    mining and eval-set construction).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = None
    for part in rankings:
        sel = part.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("_rank"),
        )
        tagged = sel if tagged is None else tagged.unionByName(sel)
    fused = (
        tagged.withColumn(
            "_contrib", F.expr(f"1000000 div ({int(k0)} + _rank)")
        )
        .groupBy(id_col)
        .agg(
            F.sum("_contrib").cast("long").alias("rrf_micro"),
            F.count("*").cast("long").alias("n_lists"),
        )
    )
    if top_k is None:
        return fused
    return fused.orderBy(F.desc("rrf_micro"), F.asc(id_col)).limit(
        int(top_k)
    )
