"""From-scratch fuzzy string scoring (rapidfuzz is unavailable here).

Implements the public fuzzywuzzy/rapidfuzz scorer family — ``ratio`` (InDel
similarity), ``partial_ratio``, ``token_sort_ratio``, ``token_set_ratio``,
and the ``WRatio`` combination — in pure Python.  These back the last
(fuzzy) leg of the entity-linking cascade, whose reference behavior is
``rapidfuzz.process.extractOne(..., scorer=fuzz.WRatio, score_cutoff=80)``
(/root/reference/populate_author_locations.py:268-276).  Exact numeric
parity with rapidfuzz is NOT guaranteed (documented delta, absorbed by the
P/R >= 0.95 budget); determinism and the alias/direct/us-heuristic legs are.
"""

from __future__ import annotations

import re
from functools import lru_cache

_WORD_RE = re.compile(r"[a-z0-9]+")


def _process(s: str) -> str:
    """Default rapidfuzz preprocessing: lowercase, non-alnum -> space, trim."""
    return " ".join(_WORD_RE.findall(s.lower()))


def _char_masks(a: str) -> dict[str, int]:
    masks: dict[str, int] = {}
    for i, c in enumerate(a):
        masks[c] = masks.get(c, 0) | (1 << i)
    return masks


def _lcs_len_with_masks(masks: dict[str, int], b: str) -> int:
    """Bit-parallel LLCS (Crochemore-Iliopoulos-Pinzon-Reid recurrence);
    exact LCS length, verified against the classic DP in tests."""
    row = 0
    for c in b:
        match = masks.get(c, 0)
        x = row | match
        row = x & ~(x - ((row << 1) | 1))
    return row.bit_count()


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, bit-parallel O(len(b)) word-ops."""
    if not a or not b:
        return 0
    return _lcs_len_with_masks(_char_masks(a), b)


def ratio(a: str, b: str) -> float:
    """InDel similarity * 100 (rapidfuzz ``fuzz.ratio`` semantics)."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def partial_ratio(a: str, b: str) -> float:
    """Best ratio of the shorter string vs any equal-length window of the longer."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 100.0 if not b else 0.0
    if len(a) == len(b):
        return ratio(a, b)
    masks = _char_masks(a)
    m = len(a)
    best = 0.0
    for start in range(len(b) - m + 1):
        lcs = _lcs_len_with_masks(masks, b[start : start + m])
        score = 200.0 * lcs / (2 * m)
        if score > best:
            best = score
            if best == 100.0:
                break
    return best


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(_WORD_RE.findall(s.lower())))


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(_sorted_tokens(a), _sorted_tokens(b))


def token_set_ratio(a: str, b: str) -> float:
    """fuzzywuzzy token_set_ratio: compare shared-token core vs each side."""
    ta, tb = set(_WORD_RE.findall(a.lower())), set(_WORD_RE.findall(b.lower()))
    if not ta and not tb:
        return 100.0
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def partial_token_sort_ratio(a: str, b: str) -> float:
    return partial_ratio(_sorted_tokens(a), _sorted_tokens(b))


def partial_token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(_WORD_RE.findall(a.lower())), set(_WORD_RE.findall(b.lower()))
    if ta & tb:
        return 100.0
    return partial_ratio(" ".join(sorted(ta)), " ".join(sorted(tb)))


def wratio(a: str, b: str) -> float:
    """Weighted ratio — the public fuzzywuzzy WRatio combination."""
    pa, pb = _process(a), _process(b)
    if not pa or not pb:
        return 0.0
    base = ratio(pa, pb)
    len_ratio = max(len(pa), len(pb)) / min(len(pa), len(pb))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(pa, pb) * unbase_scale,
            token_set_ratio(pa, pb) * unbase_scale,
        )
    partial_scale = 0.90 if len_ratio < 8 else 0.60
    return max(
        base,
        partial_ratio(pa, pb) * partial_scale,
        partial_token_sort_ratio(pa, pb) * unbase_scale * partial_scale,
        partial_token_set_ratio(pa, pb) * unbase_scale * partial_scale,
    )


@lru_cache(maxsize=65536)
def _cached_wratio(a: str, b: str) -> float:
    return wratio(a, b)


def extract_one(
    query: str, choices: list[str], score_cutoff: float = 80.0
) -> tuple[str, float] | None:
    """Best-scoring choice by WRatio, first-wins on ties, or None below cutoff.

    Mirrors ``rapidfuzz.process.extractOne`` call shape used at
    /root/reference/populate_author_locations.py:268-276.
    """
    best: tuple[str, float] | None = None
    for choice in choices:
        score = _cached_wratio(query, choice)
        if score >= score_cutoff and (best is None or score > best[1]):
            best = (choice, score)
            if score == 100.0:
                break
    return best
