"""Byte-parity tests: our kernels vs goldens recorded from the reference.

Goldens in tests/golden/*.json were produced by tools/gen_goldens.py,
which executes the reference's own pure functions (AST-extracted, no side
effects) on the shared inputs in tests/fixture_inputs.py.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import pytest

import fixture_inputs as FI
from convei_abstract_relational_knowledge_explorer_spark.functions import (
    textkernels as K,
)
from convei_abstract_relational_knowledge_explorer_spark.functions import vector as V
from convei_abstract_relational_knowledge_explorer_spark.functions.linking import (
    build_location_index,
    match_location,
)

GOLDEN = Path(__file__).parent / "golden"


def load(name):
    return json.loads((GOLDEN / f"{name}.json").read_text())


def test_clean_text():
    for text, expected in load("clean_text"):
        assert K.clean_text(text) == expected


def test_remove_stopwords():
    for text, expected in load("remove_stopwords"):
        assert K.remove_stopwords(text) == expected


def test_is_acronym_or_model():
    for tok, expected in load("is_acronym_or_model"):
        assert K.is_acronym_or_model(tok) == expected


def test_is_truncated_head_phrase():
    for toks, expected in load("is_truncated_head_phrase"):
        assert K.is_truncated_head_phrase(toks) == expected


def test_find_generic_terms_equivalent():
    """Our D8 document-frequency leg reproduces the reference's counts."""
    golden = load("find_generic_terms")
    df = Counter()
    for abstract in FI.ABSTRACT_SAMPLES:
        toks = {
            t for t in K.tokenize(K.clean_text(abstract)) if len(t) >= 2
        }
        df.update(toks)
    cutoff = 0.15 * len(FI.ABSTRACT_SAMPLES)
    generic = sorted(t for t, c in df.items() if c >= cutoff)
    assert generic == golden["generic"]
    assert dict(sorted(df.items())) == golden["df"]
    assert len(FI.ABSTRACT_SAMPLES) == golden["n_docs"]


def test_parse_date():
    for inp, expected in load("parse_date"):
        assert list(K.parse_date(*inp)) == expected


def test_parse_published_in_type():
    for inp, expected in load("parse_published_in_type"):
        assert K.parse_published_in_type(*inp) == expected


def test_split_segments_outside_brackets():
    for text, expected in load("split_segments_outside_brackets"):
        assert K.split_segments_outside_brackets(text) == expected


def test_parse_affiliation_segments():
    for text, expected in load("parse_affiliation_segments"):
        got = [
            {
                "affiliation_index": s.affiliation_index,
                "raw_author_group": s.raw_author_group,
                "authors": s.authors,
                "affiliation_text": s.affiliation_text,
            }
            for s in K.parse_affiliation_segments(text)
        ]
        assert got == expected


def test_normalize_lookup_text():
    for text, expected in load("normalize_lookup_text"):
        assert K.normalize_lookup_text(text) == expected


def test_normalize_mention_text():
    for text, expected in load("normalize_mention_text"):
        assert K.normalize_mention_text(text) == expected


def test_normalize_affiliation_text():
    for text, expected in load("normalize_affiliation_text"):
        assert K.normalize_affiliation_text(text) == expected


def test_token_count():
    for text, expected in load("token_count"):
        assert K.token_count(text) == expected


def test_split_affiliation_and_place():
    for text, expected in load("split_affiliation_and_place"):
        assert list(K.split_affiliation_and_place(text)) == expected


def test_extract_first_affiliation():
    for text, expected in load("extract_first_affiliation"):
        assert K.extract_first_affiliation(text) == expected


def test_detect_missions():
    for (title, abstract), expected in load("detect_satellite_types"):
        assert K.detect_missions(title, abstract) == expected


def test_study_locations():
    matchers = K.build_study_location_matchers()
    for abstract, expected in load("study_locations"):
        got = [list(row) for row in K.match_study_locations(abstract, matchers)]
        assert got == expected


def test_match_location_cascade_deterministic_legs():
    """alias/direct/us-heuristic/unmatched legs match the reference exactly.

    The golden was produced with the fuzzy leg disabled (rapidfuzz absent);
    rows whose golden method is 'unmatched' may legitimately resolve via our
    fuzzy leg, so for those we only check that our method is fuzzy-or-unmatched.
    """
    index = build_location_index()
    for text, expected_loc, expected_method in load("match_location_cascade"):
        loc, method = match_location(text, index)
        if expected_method == "unmatched":
            assert method in ("fuzzy", "unmatched")
        else:
            assert method == expected_method
            assert (loc or "").casefold() == (expected_loc or "")


def test_power_normalize():
    for values, expected in load("power_normalize"):
        got = V.power_normalize(values)
        assert got.tolist() == pytest.approx(expected, abs=1e-15)
        if all(max(v, 0.0) == 0.0 for v in values):
            assert got.sum() == 0.0


def test_fuzzy_extract_one_deterministic():
    from convei_abstract_relational_knowledge_explorer_spark.functions.fuzzy import (
        extract_one,
        wratio,
    )

    choices = ["united states", "united kingdom", "germany", "china"]
    assert extract_one("untied sttaes", choices) is not None
    assert extract_one("untied sttaes", choices)[0] == "united states"
    assert extract_one("zzzzqqqq", choices) is None
    # symmetric and bounded
    assert 0.0 <= wratio("abc", "abd") <= 100.0
    assert wratio("same", "same") == 100.0


def test_extract_text_from_html_roundtrip():
    payload = "Title sentence\nAbstract paragraph with Landsat 8 data."
    html = (
        "<html><head><script>var x=1;</script><style>p{}</style></head>"
        "<body><nav>menu</nav><h1>Title sentence</h1>"
        "<p>Abstract   paragraph with Landsat 8 data.</p>"
        "<footer>c 2026</footer></body></html>"
    ).encode()
    assert K.extract_text_from_html(html) == payload
    assert K.extract_text_from_html(None) is None
    # determinism: same bytes -> same text (byte-identical invariant)
    assert K.extract_text_from_html(html) == K.extract_text_from_html(html)


def test_porthash_lanes_cross_engine_adversarial(spark):
    """The portable hash family (one md5 → two 60-bit lanes → rot/xor
    mixing) must agree bit-for-bit between Spark and DuckDB on
    adversarial inputs — unicode, quotes, separators, long strings —
    not just corpus-shaped tokens."""
    import duckdb

    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        porthash_lanes,
    )
    import pyspark.sql.functions as F

    vals = [
        "", " ", "a", "naïve café", "…", "它是中文", "O'Brien \"quoted\"",
        "tab\tsep", "x" * 500, "0", "-1", "line1\nline2", "\x1f", "%s'; --",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    h1, h2, lanes = porthash_lanes(F.col("s"), 4)
    got = (
        df.select("s", h1.alias("_h1"), h2.alias("_h2"))
        .select("s", *[lane.alias(f"l{i}") for i, lane in enumerate(lanes)])
        .collect()
    )
    spark_lanes = {r["s"]: tuple(r[f"l{i}"] for i in range(4)) for r in got}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    rot = (
        lambda h, r: h
        if r % 60 == 0
        else f"((({h}) & ((1::BIGINT << {60 - r}) - 1)) << {r})"
             f" | (({h}) >> {60 - r})"
    )
    lane_exprs = ", ".join(
        f"xor({rot('h1', (7 * i + 3) % 60)}, {rot('h2', (13 * i + 5) % 60)})"
        f" AS l{i}"
        for i in range(4)
    )
    rows = con.execute(
        f"""WITH h AS (SELECT s,
                CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
                CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) AS h2
             FROM t)
            SELECT s, {lane_exprs} FROM h"""
    ).fetchall()
    duck_lanes = {r[0]: tuple(r[1:]) for r in rows}
    assert spark_lanes == duck_lanes
