"""Edge-case units for the q165-q169 operator wave: BGP matching,
N-Triples serialization, sameAs canonicalization, exact AUC, Cohen's κ."""

from __future__ import annotations

import itertools

import pytest

from convei_abstract_relational_knowledge_explorer_spark.operators.evaluation import (
    cohens_kappa,
    exact_auc,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
    bgp_match,
    canonicalize_triples,
    to_ntriples,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_shared_variable_join(spark):
    t = _triples(
        spark,
        [
            ("a", "knows", "b"),
            ("b", "knows", "c"),
            ("a", "knows", "c"),
            ("c", "type", "Person"),
        ],
    )
    got = sorted(
        tuple(r)
        for r in bgp_match(
            t, [("?x", "knows", "?y"), ("?y", "type", "Person")]
        ).collect()
    )
    assert got == [("a", "c"), ("b", "c")]


def test_bgp_repeated_variable_in_one_pattern(spark):
    t = _triples(
        spark, [("a", "self", "a"), ("a", "self", "b"), ("b", "self", "b")]
    )
    got = sorted(r.x for r in bgp_match(t, [("?x", "self", "?x")]).collect())
    assert got == ["a", "b"]


def test_bgp_disjoint_patterns_cross_product(spark):
    t = _triples(spark, [("a", "p", "1"), ("b", "q", "2"), ("c", "q", "3")])
    got = bgp_match(t, [("?x", "p", "?v"), ("?y", "q", "?w")]).collect()
    assert len(got) == 2  # 1 p-binding x 2 q-bindings


def test_bgp_select_projection_and_bag_semantics(spark):
    t = _triples(spark, [("a", "p", "x"), ("a", "p", "y")])
    got = [r.x for r in bgp_match(t, [("a", "p", "?x")], select=["x"]).collect()]
    assert sorted(got) == ["x", "y"]


def test_ntriples_escapes_in_grammar_order(spark):
    nasty = 'say "hi"\\once\nand\ragain\ttabbed'
    t = _triples(spark, [("C1", "NOTE", nasty)])
    line = to_ntriples(t).collect()[0].line
    expected_lit = (
        '"say \\"hi\\"\\\\once\\nand\\ragain\\ttabbed"'
    )
    assert line == (
        "<http://example.org/e/C1> <http://example.org/p/NOTE> "
        + expected_lit
        + " ."
    )


def test_ntriples_entity_vs_literal_and_percent_encoding(spark):
    t = _triples(
        spark,
        [
            ("Brand#12", "OFFERS", "SMALL PLATED TIN"),
            ("N7", "IN_REGION", "R2"),
        ],
    )
    lines = {r.subj: r.line for r in to_ntriples(t).collect()}
    assert lines["Brand#12"] == (
        "<http://example.org/e/Brand%2312> <http://example.org/p/OFFERS> "
        '"SMALL PLATED TIN" .'
    )
    assert lines["N7"] == (
        "<http://example.org/e/N7> <http://example.org/p/IN_REGION> "
        "<http://example.org/e/R2> ."
    )


def test_canonicalize_closes_alias_chains_transitively(spark):
    # chain x3 - x2 - x1 - C0: only the transitive closure maps x3 to C0
    trips = _triples(
        spark,
        [
            ("x3", "IN", "N1"),
            ("x2", "IN", "N1"),
            ("C0", "IN", "N1"),
            ("untouched", "IN", "N2"),
        ],
    )
    aliases = spark.createDataFrame(
        [("x3", "x2"), ("x2", "x1"), ("x1", "C0")], "a string, b string"
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_rows, r.n_subj_variants)
        for r in canonicalize_triples(trips, aliases).collect()
    }
    assert got == {
        ("C0", "IN", "N1"): (3, 3),
        ("untouched", "IN", "N2"): (1, 1),
    }


def _brute_auc2(pairs):
    """Reference doubled Mann-Whitney U: 2 per win, 1 per tie."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    u2 = sum(
        2 if p > n else (1 if p == n else 0)
        for p, n in itertools.product(pos, neg)
    )
    return len(pos), len(neg), u2


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, True), (2, True), (0, False)],           # perfect ranker
        [(5, False), (4, True), (3, False), (5, True)],  # ties across classes
        [(7, True), (7, False), (7, True), (7, False)],  # all tied -> 0.5
        [(1, True), (2, False), (3, True), (2, True), (2, False)],
    ],
)
def test_exact_auc_matches_brute_force(spark, pairs):
    df = spark.createDataFrame(
        [(s, y) for s, y in pairs], "score long, label boolean"
    )
    row = exact_auc(df, "score", "label").collect()[0]
    n_pos, n_neg, u2 = _brute_auc2(pairs)
    assert (row.n_pos, row.n_neg, row.auc_u2) == (n_pos, n_neg, u2)
    assert row.auc_denom2 == 2 * n_pos * n_neg
    assert row.auc_micro == (10**6 * u2) // (2 * n_pos * n_neg)


def test_exact_auc_single_class_is_null(spark):
    df = spark.createDataFrame(
        [(1, True), (2, True)], "score long, label boolean"
    )
    row = exact_auc(df, "score", "label").collect()[0]
    assert row.auc_micro is None and row.n_neg == 0


def test_cohens_kappa_hand_computed(spark):
    # 2x2 table: a=keep/b=keep 20, keep/drop 5, drop/keep 10, drop/drop 15
    rows = (
        [("keep", "keep")] * 20
        + [("keep", "drop")] * 5
        + [("drop", "keep")] * 10
        + [("drop", "drop")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, agree = 50, 35
    chance2 = 25 * 30 + 25 * 20  # keep marginals 25x30, drop 25x20
    assert (r.n, r.n_agree, r.chance2) == (n, agree, chance2)
    assert r.kappa_milli == (1000 * (n * agree - chance2)) // (n * n - chance2)


def test_cohens_kappa_degenerate_is_null(spark):
    df = spark.createDataFrame(
        [("keep", "keep")] * 4, "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.kappa_milli is None and r.n_agree == 4


def test_cohens_kappa_grouped_independent(spark):
    rows = [("g1", "keep", "keep")] * 3 + [("g2", "keep", "drop")] * 3
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {
        r.g: r.n_agree for r in cohens_kappa(df, "a", "b", by=["g"]).collect()
    }
    assert got == {"g1": 3, "g2": 0}


def test_bgp_optional_keeps_unmatched_rows(spark):
    t = _triples(
        spark,
        [
            ("o1", "by", "c1"),
            ("o2", "by", "c2"),
            ("o1", "nation", "n1"),
        ],
    )
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
    )

    got = {
        r.o: r.n
        for r in bgp(
            t, [("?o", "by", "?c")], optional=[("?o", "nation", "?n")]
        ).collect()
    }
    assert got == {"o1": "n1", "o2": None}


def test_bgp_optional_disjoint_raises(spark):
    t = _triples(spark, [("a", "p", "b")])
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
    )

    with pytest.raises(ValueError, match="shares no variable"):
        bgp(t, [("?x", "p", "?y")], optional=[("?z", "q", "?w")])


def test_sniff_all_magics(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.multimodal import (
        sniff_content_type,
    )

    cases = [
        (bytes.fromhex("89504E470D0A1A0A") + b"x", "image/png"),
        (b"GIF87a" + b"\x00" * 4, "image/gif"),
        (b"GIF89a" + b"\x00" * 4, "image/gif"),
        (b"%PDF-1.7 rest", "application/pdf"),
        (bytes.fromhex("504B0304") + b"zip", "application/zip"),
        (bytes.fromhex("1F8B08") + b"gz", "application/gzip"),
        (bytes.fromhex("FFD8FFE0") + b"jfif", "image/jpeg"),
        (b"<html><body>", "text/html"),
        (b"RIFF\x01\x02\x03\x04WEBPVP8 ", "image/webp"),
        (b"RIFF\x01\x02\x03\x04WAVEfmt ", "application/octet-stream"),
        (b"plain text", "application/octet-stream"),
        (b"", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(cases)],
        "i int, payload binary",
    )
    got = {r.i: (r.content_type, r.n_bytes) for r in sniff_content_type(df).collect()}
    for i, (p, expect) in enumerate(cases):
        assert got[i] == (expect, len(p)), (i, got[i], expect)


def _ref_alpha_milli(pairs):
    """Independent coincidence-matrix reference (Krippendorff 2011,
    nominal data, 2 raters): build o(c,k) explicitly, then
    alpha = 1 - (n-1) * sum_offdiag(o) / (n^2 - sum_c n_c^2)."""
    from collections import Counter

    pairable = [(a, b) for a, b in pairs if a is not None and b is not None]
    o = Counter()
    for a, b in pairable:
        o[(a, b)] += 1
        o[(b, a)] += 1
    n_c = Counter()
    for (c, _k), v in o.items():
        n_c[c] += v
    n = sum(n_c.values())
    do = sum(v for (c, k), v in o.items() if c != k)
    de = n * n - sum(v * v for v in n_c.values())
    if de <= 0:
        return None
    return (1000 * (de - (n - 1) * do)) // de


@pytest.mark.parametrize(
    "pairs",
    [
        [("a", "a"), ("b", "b"), ("a", "b"), ("b", "a"), ("a", "a")],
        [("a", "a"), ("a", None), (None, "b"), ("b", "b"), ("a", "b")],
        [("x", "y"), ("y", "x")],          # pure disagreement
        [("k", "k"), ("k", "k")],          # degenerate -> NULL
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "a"), ("b", "b")],
    ],
)
def test_krippendorff_matches_reference(spark, pairs):
    from convei_abstract_relational_knowledge_explorer_spark.operators.evaluation import (
        krippendorff_alpha,
    )

    df = spark.createDataFrame(pairs, "a string, b string")
    r = krippendorff_alpha(df, "a", "b").collect()[0]
    assert r.alpha_milli == _ref_alpha_milli(pairs)
    assert r.n_units == len(pairs)
    assert r.n_pairable == sum(
        1 for a, b in pairs if a is not None and b is not None
    )


def test_calibration_bins_hand_computed(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.evaluation import (
        calibration_bins,
    )

    # bin 0: conf 50_000 x2, one positive -> |1e6*1 - 100_000| = 900_000
    # bin 9: conf 950_000 and 1_000_000 (top edge folds down), one pos
    #        -> |1e6*1 - 1_950_000| = 950_000
    rows = [
        (50_000, True),
        (50_000, False),
        (950_000, True),
        (1_000_000, False),
    ]
    df = spark.createDataFrame(rows, "conf long, y boolean")
    got = {
        r.bin: (r.n, r.n_pos, r.sum_conf_micro, r.ece_micro)
        for r in calibration_bins(df, "conf", "y", n_bins=10).collect()
    }
    ece = (900_000 + 950_000) // 4
    assert got == {
        0: (2, 1, 100_000, ece),
        9: (2, 1, 1_950_000, ece),
    }


def test_calibration_perfectly_calibrated_is_zero(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.evaluation import (
        calibration_bins,
    )

    # conf 500_000 on 2 rows, exactly one positive -> ECE 0
    df = spark.createDataFrame(
        [(500_000, True), (500_000, False)], "conf long, y boolean"
    )
    rows = calibration_bins(df, "conf", "y").collect()
    assert all(r.ece_micro == 0 for r in rows)


def test_validate_shapes_zero_degree_and_max(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        validate_shapes,
    )

    t = _triples(
        spark,
        [
            ("C1", "IN", "N1"),
            ("C1", "IN", "N2"),   # C1 deg 2
            ("C2", "OTHER", "x"),  # C2 deg 0 on IN  -> min violation
        ],
    )
    got = {
        (r.shape_idx, r.status): (r.n_entities, r.n_triples)
        for r in validate_shapes(t, [("Customer", "IN", 1, 1)]).collect()
    }
    assert got == {
        (0, "violation_max"): (1, 2),  # C1 over max
        (0, "violation_min"): (1, 0),  # C2 zero-degree caught
    }


def test_infer_types_domain_and_range_evidence(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        infer_types,
    )

    t = _triples(
        spark,
        [
            ("O1", "PLACED_BY", "C1"),
            ("C1", "IN_NATION", "N1"),
            ("C1", "FROM", "R1"),  # pred not in ontology -> no entailment
        ],
    )
    ont = [("PLACED_BY", "Order", "Customer"), ("IN_NATION", "Customer", None)]
    got = {
        (r.entity, r.inferred_type): (r.n_evidence, r.n_preds)
        for r in infer_types(t, ont).collect()
    }
    assert got == {
        ("O1", "Order"): (1, 1),
        ("C1", "Customer"): (2, 2),  # range of PLACED_BY + domain of IN_NATION
    }


def test_induce_schema_signatures(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        induce_schema,
    )

    t = _triples(
        spark,
        [
            ("C1", "IN_NATION", "N1"),
            ("C2", "IN_NATION", "N1"),
            ("N1", "HAS_NAME", "FRANCE"),
        ],
    )
    got = {
        (r.subj_type, r.pred, r.obj_type): (r.n_triples, r.n_subj, r.n_obj)
        for r in induce_schema(t).collect()
    }
    assert got == {
        ("Customer", "IN_NATION", "Nation"): (2, 2, 1),
        ("Nation", "HAS_NAME", "Literal"): (1, 1, 1),
    }


def test_blocking_quality_counts(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        blocking_quality,
    )

    # 4 records, blocks {b1: r1 r2 r3, b2: r4}: total C(4,2)=6, cand C(3,2)=3
    recs = spark.createDataFrame(
        [(1, "b1"), (2, "b1"), (3, "b1"), (4, "b2")],
        "doc_id long, blk string",
    )
    # gold: (1,2) covered, (3,4) split across blocks
    gold = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    r = blocking_quality(recs, "blk", gold).collect()[0]
    assert (r.n_records, r.n_total_pairs, r.n_candidate_pairs) == (4, 6, 3)
    assert (r.n_gold, r.n_covered) == (2, 1)
    assert r.reduction_ratio_micro == (1_000_000 * 3) // 6
    assert r.pairs_completeness_micro == 500_000


def test_minhash_calibration_identical_docs_hit_16_lanes(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        minhash_calibration,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    rows = {r.n_matching_lanes: r for r in minhash_calibration(docs).collect()}
    # the identical pair matches every lane and has exact jaccard 1000
    assert 16 in rows
    r = rows[16]
    assert r.n_pairs == 1
    assert r.est_milli == 1000
    assert r.mean_exact_milli == 1000
    assert r.mean_abs_err_milli == 0


def test_bgp_selectivity_order_cheapest_connected_first(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
        bgp_selectivity_order,
    )

    # HAS_NAME: 2 triples; KNOWS: 6 triples fan-out 2 — the constant-obj
    # HAS_NAME pattern is cheapest, then the connected KNOWS pattern
    rows = [
        ("a", "KNOWS", "b"), ("a", "KNOWS", "c"), ("b", "KNOWS", "c"),
        ("b", "KNOWS", "d"), ("c", "KNOWS", "d"), ("d", "KNOWS", "a"),
        ("a", "HAS_NAME", "alice"), ("b", "HAS_NAME", "bob"),
    ]
    t = _triples(spark, rows)
    pats = [("?x", "KNOWS", "?y"), ("?x", "HAS_NAME", "alice")]
    ordered = bgp_selectivity_order(t, pats)
    assert ordered[0] == ("?x", "HAS_NAME", "alice")
    # results identical with and without optimize, same column order
    plain = bgp(t, pats)
    opt = bgp(t, pats, optimize=True)
    assert plain.columns == opt.columns
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, opt.collect())
    )


def test_bgp_selectivity_order_avoids_cross_products(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_selectivity_order,
    )

    t = _triples(spark, [("a", "P", "b")] * 1 + [("x", "Q", "y")] * 1)
    # Q-pattern is as cheap as P's, but after picking the first pattern
    # the other shares no variable; ordering must still emit both, with
    # connected ones preferred when available
    pats = [
        ("?x", "P", "?y"),
        ("?y", "Q", "?z"),
        ("?a", "Q", "?b"),  # disconnected from ?x/?y/?z? no — fresh vars
    ]
    ordered = bgp_selectivity_order(t, pats)
    assert set(map(tuple, ordered)) == set(map(tuple, pats))
    # the second position must be the pattern connected to the first
    first_vars = {v[1:] for v in ordered[0] if v.startswith("?")}
    second_vars = {v[1:] for v in ordered[1] if v.startswith("?")}
    assert first_vars & second_vars


def test_blocking_quality_pairs_lsh_style(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        blocking_quality_pairs,
    )

    cands = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2)], "doc_a long, doc_b long"  # dup collapses
    )
    gold = spark.createDataFrame([(1, 2), (1, 4)], "a long, b long")
    r = blocking_quality_pairs(cands, gold, 5).collect()[0]
    assert (r.n_records, r.n_total_pairs, r.n_candidate_pairs) == (5, 10, 2)
    assert (r.n_gold, r.n_covered) == (2, 1)
    assert r.reduction_ratio_micro == (1_000_000 * 8) // 10
    assert r.pairs_completeness_micro == 500_000


def test_bgp_values_restricts_and_filters_drop_nulls(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
    )

    t = _triples(
        spark,
        [("c2", "in", "n1"), ("c3", "in", "n1"), ("c4", "in", "n2")],
    )
    got = sorted(
        r.c
        for r in bgp(
            t,
            [("?c", "in", "?n")],
            values={"n": ["n1"]},
            filters=["CAST(substr(c, 2, 8) AS BIGINT) % 2 = 0"],
        ).collect()
    )
    assert got == ["c2"]  # n2 excluded by VALUES, c3 by FILTER


def test_bgp_values_unbound_variable_raises(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
    )

    t = _triples(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="not bound"):
        bgp(t, [("?x", "p", "?y")], values={"z": ["v"]})


def test_referential_integrity_dangling_by_type(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        referential_integrity,
    )

    t = _triples(
        spark,
        [
            ("C1", "IN_NATION", "N1"),     # defines C1; refs N1
            ("N1", "IN_REGION", "R9"),     # defines N1; refs R9 (dangling)
            ("O1", "PLACED_BY", "C1"),     # refs C1 (defined)
            ("O2", "PLACED_BY", "C7"),     # refs C7 (dangling)
        ],
    )
    got = {
        (r.pred, r.obj_type): (r.n_refs, r.n_dangling_entities, r.n_dangling_refs)
        for r in referential_integrity(
            t, {"Customer": "IN_NATION", "Nation": "IN_REGION",
                "Region": "REGION_DEF"}
        ).collect()
    }
    assert got == {
        ("IN_NATION", "Nation"): (1, 0, 0),
        ("IN_REGION", "Region"): (1, 1, 1),
        ("PLACED_BY", "Customer"): (2, 1, 1),
    }


def test_bgp_construct_substitutes_and_dedupes(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_construct,
    )

    t = _triples(
        spark,
        [
            ("o1", "by", "c1"),
            ("o2", "by", "c1"),
            ("c1", "in", "r1"),
        ],
    )
    got = sorted(
        map(
            tuple,
            bgp_construct(
                t,
                [("?o", "by", "?c"), ("?c", "in", "?r")],
                [("?o", "IN_REGION", "?r"), ("?r", "HAS_ORDER", "?o")],
            ).collect(),
        )
    )
    assert got == [
        ("o1", "IN_REGION", "r1"),
        ("o2", "IN_REGION", "r1"),
        ("r1", "HAS_ORDER", "o1"),
        ("r1", "HAS_ORDER", "o2"),
    ]


def test_bgp_construct_unbound_template_raises(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_construct,
    )

    t = _triples(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="not bound"):
        bgp_construct(t, [("?x", "p", "?y")], [("?x", "q", "?z")])


def test_describe_entities_sorted_bounded_preview(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        describe_entities,
    )

    t = _triples(
        spark,
        [
            ("e", "p", "zeta"),
            ("e", "p", "alpha"),
            ("e", "p", "beta"),
            ("e", "p", "gamma"),
            ("e", "p", "alpha"),  # duplicate collapses
        ],
    )
    r = describe_entities(t, max_objs=2).collect()[0]
    assert r.n_objs == 4
    assert r.objs_preview == "alpha;beta"


def test_blocking_quality_null_keys_no_candidates_no_coverage(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        blocking_quality,
    )

    # 3 NULL-keyed records form NO block: 0 candidate pairs from them,
    # and the NULL-keyed gold pair (4,5) counts as uncovered — the two
    # sides of the metric agree (ADVICE r4: NULL-block consistency)
    recs = spark.createDataFrame(
        [(1, "b1"), (2, "b1"), (3, None), (4, None), (5, None)],
        "doc_id long, blk string",
    )
    gold = spark.createDataFrame([(1, 2), (4, 5)], "a long, b long")
    r = blocking_quality(recs, "blk", gold).collect()[0]
    assert (r.n_records, r.n_total_pairs) == (5, 10)
    assert r.n_candidate_pairs == 1  # C(2,2 in b1)=1, NULL trio excluded
    assert (r.n_gold, r.n_covered) == (2, 1)
    assert r.reduction_ratio_micro == (1_000_000 * 9) // 10
    assert r.pairs_completeness_micro == 500_000


def test_bgp_constant_pattern_is_existence_guard(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
    )

    # store carries the guard triple TWICE: graph set semantics demand
    # each solution appear once, not doubled (ADVICE r4)
    t = _triples(
        spark,
        [
            ("c1", "in", "n1"),
            ("c2", "in", "n1"),
            ("sys", "status", "ready"),
            ("sys", "status", "ready"),
        ],
    )
    pats = [("?c", "in", "n1"), ("sys", "status", "ready")]
    got = sorted(r.c for r in bgp(t, pats).collect())
    assert got == ["c1", "c2"]
    # absent guard -> empty result
    pats_miss = [("?c", "in", "n1"), ("sys", "status", "offline")]
    assert bgp(t, pats_miss).count() == 0


def test_bgp_optimize_pins_column_order_to_original_patterns(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_match as bgp,
        bgp_selectivity_order,
    )

    # KNOWS fans out (6 triples), HAS_NAME is cheap (1 triple): the
    # optimizer reorders HAS_NAME first, whose natural column order
    # would be [y, x] — the result schema must stay the ORIGINAL
    # first-appearance order [x, y] regardless (ADVICE r4 determinism)
    rows = [
        ("a", "KNOWS", "b"), ("a", "KNOWS", "c"), ("b", "KNOWS", "c"),
        ("b", "KNOWS", "d"), ("c", "KNOWS", "d"), ("d", "KNOWS", "a"),
        ("b", "HAS_NAME", "bob"),
    ]
    t = _triples(spark, rows)
    pats = [("?x", "KNOWS", "?y"), ("?y", "HAS_NAME", "bob")]
    assert bgp_selectivity_order(t, pats)[0] == ("?y", "HAS_NAME", "bob")
    plain = bgp(t, pats)
    opt = bgp(t, pats, optimize=True)
    assert plain.columns == ["x", "y"]
    assert opt.columns == ["x", "y"]
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, opt.collect())
    )


def test_property_path_plus_cycle_and_star_nodes(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        property_path_pairs,
    )

    # chain a->b->c->d plus a 2-cycle x<->y, plus an unrelated HAS_NAME
    t = _triples(
        spark,
        [
            ("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d"),
            ("x", "next", "y"), ("y", "next", "x"),
            ("q", "HAS_NAME", "quux"),
        ],
    )
    plus = sorted(
        map(tuple, property_path_pairs(t, "next+").collect())
    )
    assert plus == sorted(
        [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
            # cycle: reachability WITHOUT duplicates, self-pairs included
            ("x", "y"), ("y", "x"), ("x", "x"), ("y", "y"),
        ]
    )
    star = {
        tuple(r) for r in property_path_pairs(t, "next*").collect()
    }
    # zero-length pairs for EVERY term of the graph (nodes(G)),
    # including the ones not touching 'next'
    for n in ("a", "b", "c", "d", "x", "y", "q", "quux"):
        assert (n, n) in star
    assert star.issuperset(set(plus))
    assert len(star) == len(plus) + 8 - 2  # x,x / y,y already in plus


def test_property_path_sequence_inverse_alternation(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        property_path_pairs,
    )

    t = _triples(
        spark,
        [
            ("o1", "PLACED_BY", "c1"), ("o2", "PLACED_BY", "c2"),
            ("c1", "IN_NATION", "n1"), ("c2", "IN_NATION", "n2"),
            ("o2", "ORDER_NATION", "n2"),
        ],
    )
    seq = sorted(
        map(tuple, property_path_pairs(t, "PLACED_BY/IN_NATION").collect())
    )
    assert seq == [("o1", "n1"), ("o2", "n2")]
    # alternation is a set union: ORDER_NATION adds no NEW pair here
    alt = sorted(
        map(
            tuple,
            property_path_pairs(
                t, "PLACED_BY/IN_NATION|ORDER_NATION"
            ).collect(),
        )
    )
    assert alt == seq
    inv = sorted(
        map(tuple, property_path_pairs(t, "^IN_NATION").collect())
    )
    assert inv == [("n1", "c1"), ("n2", "c2")]
    # inverse inside a sequence: nation -> its customers' orders
    back = sorted(
        map(
            tuple,
            property_path_pairs(t, "^IN_NATION/^PLACED_BY").collect(),
        )
    )
    assert back == [("n1", "o1"), ("n2", "o2")]


def test_bgp_aggregate_counts_and_sum_casts(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        bgp_aggregate,
    )

    t = _triples(
        spark,
        [
            ("o1", "PLACED_BY", "c1"), ("o2", "PLACED_BY", "c1"),
            ("o3", "PLACED_BY", "c2"),
            ("c1", "IN_NATION", "n1"), ("c2", "IN_NATION", "n1"),
            ("o1", "HAS_TOTAL", "10"), ("o2", "HAS_TOTAL", "25"),
            ("o3", "HAS_TOTAL", "oops"),  # mistyped literal drops from SUM
        ],
    )
    rows = bgp_aggregate(
        t,
        [
            ("?o", "PLACED_BY", "?c"),
            ("?c", "IN_NATION", "?n"),
            ("?o", "HAS_TOTAL", "?v"),
        ],
        group_vars=["n"],
        aggs=[
            ("count", None, "n_orders"),
            ("count_distinct", "c", "n_customers"),
            ("sum", "v", "total"),
            ("min", "o", "first_order"),
        ],
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n, r.n_orders, r.n_customers, r.total, r.first_order) == (
        "n1", 3, 2, 35, "o1"
    )


def test_ndcg_at_k_hand_case(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.evaluation import (
        ndcg_at_k,
        ndcg_discounts_q20,
    )

    # scores rank docs d1..d4; rel 3,0,2,1 -> dcg uses rank order,
    # idcg uses rel desc (3,2,1,0)
    df = spark.createDataFrame(
        [("q", "d1", 90, 3), ("q", "d2", 80, 0),
         ("q", "d3", 70, 2), ("q", "d4", 60, 1)],
        "qid string, doc string, score long, rel long",
    )
    d = dict(ndcg_discounts_q20(3))
    exp_dcg = 3 * d[1] + 0 * d[2] + 2 * d[3]      # rank cut k=3
    exp_idcg = 3 * d[1] + 2 * d[2] + 1 * d[3]
    r = ndcg_at_k(
        df, "score", "rel", "doc", by=["qid"], k=3
    ).collect()[0]
    assert (r.qid, r.n_ranked) == ("q", 4)
    assert (r.dcg_q20, r.idcg_q20) == (exp_dcg, exp_idcg)
    assert r.ndcg_milli == (1000 * exp_dcg) // exp_idcg
    # all-zero rel -> NULL ndcg
    z = spark.createDataFrame(
        [("q", "d1", 5, 0)], "qid string, doc string, score long, rel long"
    )
    rz = ndcg_at_k(z, "score", "rel", "doc", by=["qid"], k=3).collect()[0]
    assert rz.ndcg_milli is None
