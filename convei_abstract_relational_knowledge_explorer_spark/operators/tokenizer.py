"""Distributed BPE tokenizer learning over the document corpus.

The reference ships its corpus to an external embedding/tokenizer stack
(/root/reference/embed_abstracts.py relies on a pretrained
SentenceTransformer vocabulary); a from-scratch training-data engine has
to be able to LEARN the subword vocabulary itself, at corpus scale —
byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016) is the standard
algorithm.  This module implements BPE merge learning as a sequence of
declarative DataFrame rounds over the *distinct-word frequency table*
(the same distinct-first idiom as the fuzzy topic dedupe and the mention
kernels: Heap's law makes |vocab| ≪ |corpus|, so per-round cost is
bounded by vocabulary size, not corpus size).

Exactness / cross-engine determinism
------------------------------------
Word segmentations are carried as DOUBLE-SPACE-delimited symbol strings
with single-space sentinels::

    "hello"  →  " h  e  l  l  o  </w> "

Merging pair (a, b) is then the plain (non-regex) string replacement
``' a  b ' → ' ab '``.  Because the doubled separator donates one space
to each neighboring match, a left-to-right non-overlapping replace-all
— the semantics of BOTH Spark's and DuckDB's ``replace`` — merges a run
``x x x x`` to ``xx xx`` in one pass, exactly the greedy behavior of
the reference algorithm's ``(?<!\\S)a\\sb(?!\\S)`` regex (which DuckDB's
RE2 cannot express: no lookbehind).  The encoding makes greedy BPE a
pure string function, bit-identical across engines and partitionings.

Pair counts are exact 64-bit integer sums of word frequencies
(associative ⇒ partitioning-independent); the per-round argmax is
``ORDER BY cnt DESC, a ASC, b ASC LIMIT 1`` — a total order, so ties
are deterministic.

100 TB shape
------------
One corpus-wide ``groupBy(word)`` builds the frequency table (map-side
combinable, the q12 idiom); every subsequent round touches only the
|vocab|-row table: one narrow projection (explode adjacent pairs), one
map-side-combinable aggregate, one ``TakeOrderedAndProject`` scalar for
the argmax, one narrow ``replace`` projection.  The single-row argmax
collect per round is the Sennrich algorithm's inherent sync point (each
merge depends on the previous one), not a driver-side loop over data.
The words frame is localCheckpointed per round so lineage stays flat
across hundreds of merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .packing import TOKEN_RE

END_OF_WORD = "</w>"


def _spaced_words(docs: DataFrame, text_col: str) -> DataFrame:
    """(s, freq): double-space symbol encoding of each distinct word,
    weighted by corpus frequency."""
    word = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
        )
    ).alias("word")
    return (
        docs.select(word)
        .select(
            F.concat(
                F.lit(" "),
                F.regexp_replace("word", "(.)", "$1  "),
                F.lit(END_OF_WORD + " "),
            ).alias("s")
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs weighted by word frequency.

    Counts EVERY adjacent occurrence (overlaps included) — the
    reference algorithm's ``get_stats`` convention."""
    syms = F.split(F.trim(F.col("s")), "  ")
    return (
        words.select(syms.alias("syms"), "freq")
        # fully-merged words (one symbol) have no pairs — and Spark's
        # sequence(1, 0) would descend, not return empty
        .filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
            "freq",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_expr(a: str, b: str):
    """The greedy-merge column expression for one learned pair."""
    return F.expr(
        "replace(s, {}, {})".format(
            _sql_str(f" {a}  {b} "), _sql_str(f" {a}{b} ")
        )
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges → (merge_rank, lhs, rhs, merged,
    pair_count), rank-ordered.

    Stops early (fewer rows) if the vocabulary runs out of mergeable
    pairs.  The result is the merge table a production encoder ships —
    tiny by construction (one row per merge), assembled on the driver
    from the per-round scalar argmaxes.
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    spark = docs.sparkSession
    # r6: ONE action per merge round — the argmax collect materializes
    # the lazily-checkpointed words frame.  The previous generation is
    # unpersisted only after the NEXT generation has materialized from
    # it (localCheckpoint truncates lineage, so blocks must outlive
    # their one consumer).
    words = _spaced_words(docs, text_col).localCheckpoint(eager=False)
    prev = None
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            best = (
                _pair_counts(words)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((rank, a, b, a + b, cnt))
            nxt = words.select(merge_expr(a, b).alias("s"), "freq")
            nxt = nxt.localCheckpoint(eager=False)
            prev, words = words, nxt
    finally:
        words.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a learned merge list → (doc_id, token_idx,
    subwords array<string>): each word's subword segmentation.

    Applies merges sequentially in rank order, each as one global greedy
    replace — on the training corpus this reproduces the training-time
    segmentation exactly (round r of :func:`learn_bpe` IS a global
    greedy application of merge r to the round-(r-1) segmentation).
    Production priority-queue encoders (min-rank-first per word) can
    differ on words whose later merge creates an adjacency for an
    earlier pair; the sequential convention is documented and the unit
    test pins it.

    Shape: ``posexplode`` per word then a chain of narrow ``replace``
    projections — all JVM whole-stage codegen, no shuffle after the
    explode.  Suitable for bounded merge tables (≤ a few hundred); a
    30k-merge production encoder would move the rank loop into an
    Arrow-batched ``mapInPandas`` scan instead of 30k stacked
    expressions.
    """
    word = F.posexplode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
        )
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"), word.alias("token_idx", "word")
    ).withColumn(
        "s",
        F.concat(
            F.lit(" "),
            F.regexp_replace("word", "(.)", "$1  "),
            F.lit(END_OF_WORD + " "),
        ),
    )
    for a, b in merges:
        out = out.withColumn("s", merge_expr(a, b))
    return out.select(
        "doc_id",
        "token_idx",
        F.split(F.trim(F.col("s")), "  ").alias("subwords"),
    )
