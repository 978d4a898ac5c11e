"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride as opaque ``binary`` columns plus a metadata
struct.  The *Spark-side* plumbing (schema, partition sizing, Arrow batch
shape, UDF signatures) is real and tested; the codec step is stubbed
behind deterministic fakes because no media libraries exist in this
container (clearly marked below).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)


def synthetic_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes).

    r6: generated with pure JVM expressions — ``unhex(sha2(...))``
    repeated 8× is byte-identical to the former per-row Python
    ``hashlib.sha256(...).digest() * 8`` — so synthesis no longer
    spins up a Python worker per partition (guide §4.1; the measured
    cost was pandas imports in 32 forked workers, not the hashing).
    Partition count is sized from ``n`` (bounded by the cluster's
    parallelism) instead of inheriting ``spark.range``'s default, so a
    small synthetic table does not fan out into dozens of near-empty
    tasks."""
    par = max(1, min(spark.sparkContext.defaultParallelism, n // 64 or 1))
    base = spark.range(0, n, 1, par)
    digest = F.unhex(
        F.sha2(
            F.concat(F.lit("media:"), F.col("id").cast("string")), 256
        )
    )
    payload = F.concat(*([digest] * 8))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("id") % 512 + 64).cast("int").alias("width"),
        ((F.col("id") * 7) % 512 + 64).cast("int").alias("height"),
        (F.col("id") % 60000 + 1000).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


_FEATURE_SCHEMA = "media_id long, feature array<float>, n_bytes int"


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction.

    STUB: a real deployment would decode payload bytes with PIL/ffmpeg
    here.  Those libraries are not in this container, so the "decoder" is
    a deterministic byte-histogram — the batch shape, schema, and
    memory profile match the real thing.
    """
    import numpy as np

    for batch in batches:
        feats = []
        sizes = []
        for payload in batch["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr % 16, minlength=16).astype("float32")
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
            sizes.append(len(payload))
        yield pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "feature": feats,
                "n_bytes": sizes,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """media → (media_id, feature: array<float>, n_bytes)."""
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, schema=_FEATURE_SCHEMA
    )


def decode_image(_payload: bytes):
    """Real image decode — requires PIL, absent in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this sandbox; "
        "extract_features uses a deterministic fake decoder instead"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) sampling plan from metadata only (no decode).

    JVM-native: sequence() over the duration — shows how frame fan-out
    partitions before any decoder runs.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Content-type sniffing — file-format detection from magic bytes.

#: (content_type, hex prefix at byte 1) — the match order is the rule
#: order (longest/most-specific first); RIFF/WEBP additionally checks
#: bytes 9-12.  Sources: the published magic numbers each format's spec
#: defines (PNG RFC 2083 §12.11, JPEG ISO 10918 SOI, GIF87a/89a, PDF
#: %PDF, RFC 1952 gzip, APPNOTE zip, RIFF/WebP container).
MAGIC_RULES: tuple[tuple[str, str], ...] = (
    ("image/png", "89504E470D0A1A0A"),
    ("image/gif", "474946383761"),
    ("image/gif", "474946383961"),
    ("application/pdf", "25504446"),
    ("application/zip", "504B0304"),
    ("application/gzip", "1F8B"),
    ("image/jpeg", "FFD8FF"),
    ("text/html", "3C68746D6C"),  # '<html'
)

_RIFF, _WEBP = "52494646", "57454250"


def sniff_content_type(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Magic-byte content-type detection over an opaque binary column →
    input columns + (content_type string, n_bytes int).

    The first gate of any multimodal crawl pipeline: WARC payloads
    arrive with lying or absent Content-Type headers, so type routing
    (image decoder vs text extractor vs archive expander) keys off the
    leading bytes.  Pure JVM expressions — the prefix is hex-encoded
    once and matched against the published magic numbers (longest rule
    first; RIFF containers check the format tag at bytes 9-12 to split
    WebP from plain RIFF) — no UDF, no shuffle, codegen-friendly, and
    the same hex comparisons replay verbatim in any SQL engine.
    Unmatched payloads fall to ``application/octet-stream``.
    """
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 8))
    expr = F.lit("application/octet-stream")
    # build WHEN chain in reverse so the FIRST rule wins ties
    rules: list[tuple[str, F.Column]] = [
        (ct, head.startswith(magic)) for ct, magic in MAGIC_RULES
    ]
    rules.append(
        (
            "image/webp",
            head.startswith(_RIFF)
            & (F.hex(F.substring(p, 9, 4)) == _WEBP),
        )
    )
    for ct, cond in reversed(rules):
        expr = F.when(cond, ct).otherwise(expr)
    return df.select(
        "*",
        expr.alias("content_type"),
        F.length(p).cast("int").alias("n_bytes"),
    )
