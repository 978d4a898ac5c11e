"""Property-based kernel tests (hypothesis) — robustness beyond goldens."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from convei_abstract_relational_knowledge_explorer_spark.functions import (
    fuzzy,
    textkernels as K,
    vector as V,
)

text_strategy = st.text(max_size=200)
small_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=60
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_clean_text_idempotent(s):
    once = K.clean_text(s)
    assert K.clean_text(once) == once
    # output alphabet is exactly lowercase alnum, hyphen, space
    assert all(c.islower() or c.isdigit() or c in "- " for c in once)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_normalizers_idempotent(s):
    for fn in (K.normalize_lookup_text, K.normalize_mention_text):
        once = fn(s)
        assert fn(once) == once


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_remove_stopwords_subset_of_clean(s):
    kept = K.remove_stopwords(s).split()
    all_tokens = K.clean_text(s).split()
    assert set(kept) <= set(all_tokens)
    assert not set(kept) & K.STOPWORDS


@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_power_normalize_distribution(v):
    out = V.power_normalize(v)
    assert len(out) == len(v)
    assert all(x >= 0 for x in out)
    total = out.sum()
    assert abs(total - 1.0) < 1e-9 or total == 0.0


def _lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


@given(small_text, small_text)
@settings(max_examples=300, deadline=None)
def test_bitparallel_lcs_equals_dp(a, b):
    assert fuzzy._lcs_len(a, b) == _lcs_dp(a, b)


@given(small_text, small_text)
@settings(max_examples=200, deadline=None)
def test_fuzzy_scores_bounded_and_reflexive(a, b):
    for fn in (fuzzy.ratio, fuzzy.token_set_ratio, fuzzy.token_sort_ratio):
        score = fn(a, b)
        assert 0.0 <= score <= 100.0
        assert fn(a, a) == 100.0
    w = fuzzy.wratio(a, b)
    assert 0.0 <= w <= 100.0


@given(st.text(alphabet="ab;[] \n", max_size=100))
@settings(max_examples=200, deadline=None)
def test_affiliation_parsing_never_crashes(s):
    segments = K.parse_affiliation_segments(s)
    for seg in segments:
        assert seg.affiliation_text
    K.split_segments_outside_brackets(s)
    K.split_affiliation_and_place(s)
    K.extract_first_affiliation(s)


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_html_extractor_stable(s):
    html = f"<html><body><p>{s.replace('<', ' ').replace('>', ' ')}</p></body></html>"
    out1 = K.extract_text_from_html(html.encode())
    out2 = K.extract_text_from_html(html.encode())
    assert out1 == out2
