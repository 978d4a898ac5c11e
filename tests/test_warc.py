from __future__ import annotations


def test_warc_roundtrip_and_collision_flagging(spark):
    from convei_abstract_relational_knowledge_explorer_spark.sources.warc import (
        parse_warc,
        synthesize_warc,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "second doc\nwith newline"),
            (51, "same batch as 1 (mod 50)"),
            # adversarial: payload embeds the record boundary — the
            # header-split parser must FLAG it via the framing check,
            # never silently mis-frame
            (3, "evil WARC/1.0\r\n embedded boundary"),
        ],
        "doc_id long, text string",
    )
    parsed = parse_warc(synthesize_warc(docs)).collect()
    by_id = {r.record_id: r for r in parsed}
    for i in (1, 2, 51):
        r = by_id[i]
        assert r.length_ok, i
        assert r.uri == f"http://example.org/doc/{i}"
        orig = {1: "hello world", 2: "second doc\nwith newline",
                51: "same batch as 1 (mod 50)"}[i]
        assert r.payload == orig
        assert r.content_length == len(orig.encode())
    # the collision-bearing record split short: flagged, not corrupted
    assert not by_id[3].length_ok
    # batching is deterministic: 1 and 51 share batch 1
    arch = {r.batch_id: r.warc for r in synthesize_warc(docs).collect()}
    assert arch[1].count("WARC/1.0") == 2
    assert arch[1].index("doc/1") < arch[1].index("doc/51")  # id order
