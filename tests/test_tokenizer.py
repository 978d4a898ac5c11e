"""BPE merge learning vs a pure-Python Sennrich reference.

The reference implementation below is the textbook algorithm (Sennrich,
Haddow & Birch, ACL 2016, Algorithm 1): count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair greedily
left-to-right, repeat.  Ties break (count DESC, left ASC, right ASC) —
the same total order the operator and the q73 oracle use.
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators.tokenizer import (
    END_OF_WORD,
    apply_bpe,
    learn_bpe,
)


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Pure-python Sennrich BPE: returns (merges, final segmentation)."""
    vocab = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freq.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        stats: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (a, b), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cats sat on the mats"),
    (3, "low lower lowest low low"),
    (4, "newer newest new new new"),
    (5, "aaaa aaaa aa aaaa"),  # repeated-symbol runs: greedy-merge edge
    (6, "the the the banana bandana"),
]


def _word_freq():
    wf: collections.Counter = collections.Counter()
    for _, text in CORPUS:
        wf.update(text.lower().split())
    return dict(wf)


def test_learn_bpe_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in learn_bpe(docs, 10).orderBy("merge_rank").collect()
    ]
    want, _ = _ref_bpe(_word_freq(), 10)
    assert got == want


def test_learn_bpe_repeated_symbol_greedy(spark):
    # "aaaa": first (a,a) merge must give aa|aa, not aa|a|a — the
    # doubled-space encoding's whole point.
    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in learn_bpe(docs, 3).orderBy("merge_rank").collect()
    ]
    want, _ = _ref_bpe({"aaaa": 3}, 3)
    assert got == want
    # rank-1 merge is (a, a) seen 3 times per word ⇒ 9
    assert got[0][1:] == ("a", "a", "aa", 9)


def test_learn_bpe_early_stop(spark):
    # single 1-char word: one pair (x, </w>), then nothing left
    docs = spark.createDataFrame([(1, "x x")], ["doc_id", "text"])
    rows = learn_bpe(docs, 5).collect()
    assert len(rows) == 1
    assert (rows[0].lhs, rows[0].rhs) == ("x", END_OF_WORD)


def test_apply_bpe_reproduces_training_segmentation(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges_df = learn_bpe(docs, 8)
    merges = [
        (r.lhs, r.rhs) for r in merges_df.orderBy("merge_rank").collect()
    ]
    enc = apply_bpe(docs, merges)
    # the encoded distinct-word segmentation equals the reference's
    # post-training vocab segmentation
    _, ref_vocab = _ref_bpe(_word_freq(), 8)
    ref_segs = {"".join(s).replace(END_OF_WORD, ""): list(s) for s in ref_vocab}
    for r in enc.collect():
        word = "".join(r.subwords).replace(END_OF_WORD, "")
        assert r.subwords == ref_segs[word], word
    # coverage: every (doc, token position) present exactly once
    docs_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).collect()
    assert enc.count() == sum(r.n for r in docs_tok)
