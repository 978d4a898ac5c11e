"""Sequence packing: concat-and-chunk documents into fixed-token blocks.

The last step of every LLM pretraining data pipeline: documents are
concatenated in a deterministic order and cut into fixed-length training
blocks (e.g. 2048 tokens), documents straddling block boundaries.  The
output here is the PLACEMENT MAP — for each document, which block its
first token lands in and at what offset, and which block holds its last
token — from which a writer can emit the physical blocks with a single
partitioned pass.

Spark-first shape (and the reason this module exists): the naive
formulation is a cumulative sum over ONE global window — a
single-partition sort, the same 100×-scale killer `assign_shards` was
flipped away from (r03 VERDICT #2).  Instead the global order is DEFINED
bucket-major — ``(bucket, order_key, doc_id)`` with
``bucket = porthash64(doc_id) % n_buckets`` — and the scan runs in two
phases, the classic distributed prefix-sum:

1. per-bucket running sums under a hash-partitioned window (B
   independent sorts, each ~1/B of the corpus), and
2. bucket prefix offsets from a B-row aggregate, broadcast back.

Every quantity is an integer, so the placement map is bit-identical
across engines, partitionings, and cluster sizes; the DuckDB oracle
(q52) computes the SAME order with ONE global window — an independent
formulation whose hash match proves the two-phase scan equals the
global scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .dedup import porthash64

TOKEN_RE = "[a-z0-9]+(?:-[a-z0-9]+)*"


def pack_documents(
    docs: DataFrame,
    block_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Placement map for concat-and-chunk packing →
    (doc_id, n_tokens, start_block, start_offset, end_block).

    ``tokens_col`` supplies a precomputed token count; otherwise tokens
    are whitespace/punctuation words of ``text_col`` (the repo-standard
    token regex).  Zero-token documents are dropped (they occupy no
    block).  ``start_offset`` is 0-based within ``start_block``;
    ``end_block == start_block`` iff the document fits without crossing
    a boundary.
    """
    if block_tokens <= 0:
        raise ValueError("block_tokens must be positive")
    n_tok = (
        F.col(tokens_col)
        if tokens_col
        else F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
            )
        )
    ).cast("long")
    h = porthash64(F.col(id_col).cast("string"), "pack")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        h.alias("order_key"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    ).filter(F.col("n_tokens") > 0)

    w = (
        Window.partitionBy("bucket")
        .orderBy("order_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w))

    # B-row aggregate → running prefix over bucket ids (window over B
    # rows, not the corpus), broadcast back.
    totals = base.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_total")
    )
    wp = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.select(
        "bucket",
        (F.sum("bucket_total").over(wp) - F.col("bucket_total")).alias(
            "bucket_prefix"
        ),
    )

    placed = local.join(F.broadcast(prefixes), "bucket").select(
        "doc_id",
        "n_tokens",
        (F.col("bucket_prefix") + F.col("local_cum") - F.col("n_tokens"))
        .alias("cum_before"),
    )
    return placed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"cum_before DIV {block_tokens}").alias("start_block"),
        (F.col("cum_before") % block_tokens).alias("start_offset"),
        F.expr(
            f"(cum_before + n_tokens - 1) DIV {block_tokens}"
        ).alias("end_block"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style overlapping window chunking → (doc_id, chunk_idx,
    start_tok, n_tok, chunk_text).

    The retrieval-index sibling of :func:`pack_documents`: instead of
    concatenating documents into training blocks, each document splits
    into windows of ``chunk_tokens`` tokens advancing by ``chunk_tokens
    - overlap`` (trailing chunk may be shorter; a document shorter than
    one window is one chunk).  Chunk text is the token sequence joined
    by single spaces — a DOCUMENTED normalization that makes the output
    deterministic and engine-exact (reconstructing original whitespace
    would need byte offsets; the H1-normalized token stream is the
    retrieval contract everywhere else in this repo, q12/q52).

    Shape: tokenize once per document, then one ``sequence → explode``
    over the chunk count and a JVM ``slice`` + ``array_join`` per chunk
    — narrow after the explode, no shuffle at all (plan-testable), no
    Python.  Chunk count is closed-form integer arithmetic
    (``1 + ceil((n - chunk)/stride)``), so chunk ids are stable under
    re-runs and across engines — the resume/backfill property the
    pipeline's checkpointer relies on.
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    n_chunks = F.when(F.col("_n") <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(f"(_n - {chunk_tokens} + {stride} - 1) DIV {stride}")
    )
    chunks = base.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
        ).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx").cast("long") * stride).alias("start_tok")
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start,
        F.size(piece).cast("long").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
