"""End-to-end triple parity: Spark pipeline vs reference-logic golden.

The golden (tests/golden/expected_triples.json) was produced by
tools/gen_goldens.py running the REFERENCE's own mention/linking functions
over the same deterministic synthetic corpus.  Gate: P/R >= 0.95
(BASELINE.json north_rule).
"""

from __future__ import annotations

import json
from pathlib import Path

from convei_abstract_relational_knowledge_explorer_spark.functions.textkernels import (
    extract_text_from_html,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.extract import (
    extract_documents,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
    emit_triples,
    parity_triples,
)
from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
    make_page,
    web_pages,
)

GOLDEN = Path(__file__).parent / "golden"


def test_html_extraction_byte_identical_per_url():
    """input_hint invariant: extracted text is byte-identical to the payload."""
    for i in range(300):
        page = make_page(i)
        assert extract_text_from_html(page["html"]) == page["_payload"], (
            f"extraction mismatch at doc {i}"
        )


def test_extract_documents_fields(spark):
    docs = extract_documents(web_pages(spark, 40, partitions=4))
    rows = {r["url"]: r for r in docs.collect()}
    assert len(rows) == 40
    for i in range(40):
        page = make_page(i)
        row = rows[page["url"]]
        lines = page["_payload"].split("\n")
        assert row["text"] == page["_payload"]  # byte-identical per url
        assert row["title"] == lines[0]
        assert row["affiliations"] == lines[-1]
        assert row["abstract"] == " ".join(lines[1:-1])
        assert row["year"] == page["warc_ts"].year
        assert row["doc_id"] is not None


def test_triple_parity_p_r(spark):
    golden = json.loads((GOLDEN / "expected_triples.json").read_text())
    expected = {tuple(t) for t in golden["triples"]}
    n = golden["n_corpus"]

    docs = extract_documents(web_pages(spark, n, partitions=4))
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in parity_triples(emit_triples(spark, docs)).collect()
    }

    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    print(f"\ntriple parity: P={precision:.4f} R={recall:.4f} "
          f"(got={len(got)}, expected={len(expected)}, tp={tp})")
    if precision < 1.0 or recall < 1.0:
        fp = sorted(got - expected)[:10]
        fn = sorted(expected - got)[:10]
        print("sample false-positives:", fp)
        print("sample false-negatives:", fn)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"
def test_curate_corpus_end_to_end(spark):
    """The full curation flow: language -> quality -> repetition -> exact
    dedup -> near dedup -> shards, with per-step survivor counts."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.curation import (
        curate_corpus,
    )

    base = "the quick brown fox jumps over the lazy dog and it runs far away today"
    rows = [
        (0, base),                                   # survivor (keeper)
        (1, base),                                   # exact dup of 0
        (2, base.replace("lazy", "sleepy")),         # near dup of 0
        (3, "der Hund und die Katze sind nicht mit der Maus hier"),  # de
        (4, "and a and a and a and a and a"),        # repetitive
        (5, "the aa bb cc dd ee ff gg hh ii jj kk"), # low quality
        (6, "it is a completely different story about data and the many"
            " ways of spark processing today"),      # survivor
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, stats = curate_corpus(docs, near_dup_threshold=0.5, n_shards=2)
    got = {r["doc_id"] for r in curated.collect()}
    assert got == {0, 6}
    assert stats["input"] == 7
    assert stats["after_language"] == 6
    assert stats["after_quality"] == 5
    assert stats["after_repetition"] == 4
    assert stats["after_exact_dedup"] == 3
    assert stats["after_near_dedup"] == 2
    shards = {r["doc_id"]: r["shard"] for r in curated.collect()}
    assert set(shards.values()) <= {0, 1}


def test_curate_corpus_url_dedup_and_decontamination(spark):
    """Stage 0 (canonical-URL keeper) and the decontamination gate, both
    opt-in: raw URL variants of one canonical page collapse to the
    min-id keeper BEFORE text gates, and a doc sharing a verbatim 8-gram
    with the benchmark is dropped AFTER near-dedup."""
    from convei_abstract_relational_knowledge_explorer_spark.plans.curation import (
        curate_corpus,
    )

    bench_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa stand in"
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs far today",
         "https://ex.com/a?b=1"),
        # same canonical URL as 0 (tracking junk) → dropped at stage 0
        (1, "totally different text that would otherwise survive the gates",
         "HTTPS://WWW.Ex.COM:443/a/?utm_source=x&b=1#frag"),
        # contains a verbatim 8-gram from the benchmark → decontaminated
        (2, "it begins and then " + " ".join(bench_text.split()[:8])
         + " it ends with many other words of padding here today",
         "https://ex.com/c"),
        (3, "it is a completely different story about data and the many"
            " ways of spark processing today", "https://ex.com/d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    curated, stats = curate_corpus(
        docs, near_dup_threshold=0.5, n_shards=2,
        url_col="url", benchmark=bench, contamination_ngram=8,
    )
    got = {r["doc_id"] for r in curated.collect()}
    assert got == {0, 3}
    assert stats["input"] == 4
    assert stats["after_url_dedup"] == 3
    assert stats["after_near_dedup"] == 3
    assert stats["after_decontamination"] == 2
