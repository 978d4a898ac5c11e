"""Exact prefix-filtered set-similarity join vs a Python brute force,
in both verify regimes (bitset small-vocab, array_intersect large-vocab)."""

from __future__ import annotations

import random
import re

import pytest

from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
    jaccard_similarity_join,
)

TOKEN_RE = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")


def _brute(docs, t_millis):
    sets = {i: set(TOKEN_RE.findall(txt.lower())) for i, txt in docs}
    sets = {i: s for i, s in sets.items() if s}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 1000 * inter >= t_millis * union:
                out.add((a, b, inter, union, (1000 * inter) // union))
    return out


def _random_docs(seed, vocab, n_docs, lo, hi):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        k = rng.randint(lo, hi)
        docs.append((i, " ".join(rng.sample(words, k))))
    # plant exact-duplicate clusters so the same-signature path is hit
    docs.append((n_docs, docs[0][1]))
    docs.append((n_docs + 1, docs[0][1]))
    return docs


@pytest.mark.parametrize(
    "vocab,bitset_max,seed",
    [
        (20, 4096, 7),      # one-word bitset regime
        (150, 4096, 11),    # multi-word bitset regime
        (150, 1, 11),       # array_intersect regime forced
    ],
)
def test_jaccard_join_matches_brute_force(spark, vocab, bitset_max, seed):
    docs = _random_docs(seed, vocab, 40, max(3, vocab // 6), max(6, vocab // 2))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        tuple(r)
        for r in jaccard_similarity_join(
            sdf, threshold_millis=500, bitset_max_vocab=bitset_max
        ).collect()
    }
    assert got == _brute(docs, 500)


def test_jaccard_join_threshold_validation(spark):
    sdf = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="threshold_millis"):
        jaccard_similarity_join(sdf, threshold_millis=0)


def test_jaccard_join_identical_sets_score_1000(spark):
    sdf = spark.createDataFrame(
        [(1, "x y z"), (2, "z y x"), (3, "x y z z z")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["jacc_millis"]
        for r in jaccard_similarity_join(sdf, threshold_millis=900).collect()
    }
    assert rows == {(1, 2): 1000, (1, 3): 1000, (2, 3): 1000}
