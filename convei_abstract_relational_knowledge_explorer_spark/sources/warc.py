"""WARC-style web-archive record source (synthesize + parse).

The reference reads tagged-TSV exports (sources/wos_tsv.py); a web-scale
corpus arrives as WARC archives (ISO 28500: ``WARC/1.0`` header block,
named headers, Content-Length-framed payload).  No media/network libs
are needed for the TEXTUAL record layer, so unlike the multimodal decode
stub this is fully real: records are synthesized and parsed with pure
JVM string expressions — whole-stage codegen, no Python in the loop.

Scale shape: synthesis is a per-batch sort + concat (one shuffle on the
batch key); parsing is a narrow split/regexp projection per blob — at
corpus scale each blob is one archive file and the explode fans records
out without any shuffle.  The parser is header-boundary based (split on
the version line) rather than Content-Length-framed, which a SQL engine
cannot stream; the framing is instead VERIFIED per record
(``length_ok``: octet_length(payload) == Content-Length), so a payload
that happens to contain the boundary string is flagged, not silently
mis-parsed — the honest contract for a declarative parser.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CRLF2 = "\r\n\r\n"


def synthesize_warc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_batches: int = 50,
    uri_base: str = "http://example.org/doc/",
) -> DataFrame:
    """documents → (batch_id, warc): deterministic WARC/1.0-style
    response records, concatenated per hash batch in ``id_col`` order
    (sort_array over (id, record) structs — no global sort)."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.lit(uri_base),
        F.col(id_col).cast("string"),
        F.lit("\r\nWARC-Record-ID: "),
        F.col(id_col).cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.col(text_col)).cast("string"),
        F.lit(_CRLF2),
        F.col(text_col),
        F.lit(_CRLF2),
    )
    return (
        docs.select(
            F.pmod(F.col(id_col), F.lit(n_batches)).alias("batch_id"),
            F.struct(F.col(id_col).alias("i"), rec.alias("r")).alias("_s"),
        )
        .groupBy("batch_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("_s")), lambda s: s["r"]
                ),
                "",
            ).alias("warc")
        )
    )


def parse_warc(
    archives: DataFrame,
    blob_col: str = "warc",
) -> DataFrame:
    """(…, warc) → one row per record: (record_id, uri, content_length,
    payload, length_ok).

    Split on the ``WARC/1.0\\r\\n`` version line, regexp-extract the
    named headers, take the payload between the header terminator and
    the record separator, and VERIFY the Content-Length framing
    (``length_ok``) — a record whose payload contained the boundary
    splits short and fails the check instead of corrupting silently.
    """
    seg = F.explode(
        F.split(F.col(blob_col), "WARC/1\\.0\r\n")
    ).alias("_seg")
    segs = archives.select(seg).filter(F.length("_seg") > 0)
    body = F.expr(f"substring(_seg, instr(_seg, '{_CRLF2}') + 4)")
    payload = F.expr(
        f"left(substring(_seg, instr(_seg, '{_CRLF2}') + 4),"
        f" length(substring(_seg, instr(_seg, '{_CRLF2}') + 4)) - 4)"
    )
    _ = body
    return segs.select(
        F.regexp_extract("_seg", r"WARC-Record-ID: ([^\r]+)", 1)
        .try_cast("long")
        .alias("record_id"),
        F.regexp_extract("_seg", r"WARC-Target-URI: ([^\r]+)", 1).alias(
            "uri"
        ),
        # try_cast: a boundary-collision FRAGMENT segment has no
        # headers at all — it must surface as a NULL-id, length_ok
        # false row, not fail the job under ANSI cast
        F.regexp_extract("_seg", r"Content-Length: ([0-9]+)", 1)
        .try_cast("long")
        .alias("content_length"),
        payload.alias("payload"),
    ).withColumn(
        "length_ok",
        F.coalesce(
            F.octet_length("payload") == F.col("content_length"),
            F.lit(False),
        ),
    )
