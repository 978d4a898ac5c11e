"""Text-analysis operators for training-data pipelines.

Language ID (n-gram heuristic), quality scoring, token counting, and
rolling-hash document fingerprinting — all JVM-native column expressions
(whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..functions import _dictdata as D

TOKEN_PATTERN = "[a-z0-9]+(?:-[a-z0-9]+)*"

# Tiny per-language stopword marker sets for the n-gram/marker heuristic.
# Public common function words; en list intersects the reference's
# STOPWORDS (/root/reference/topic_discovery_pipeline.py:92-334).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "für", "ein", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "avec", "pour", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "con", "para", "una", "por"],
}


def _tokens(text_col: str):
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, n_distinct_tokens)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def language_scores(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — marker-token voting heuristic."""
    toks = _tokens(text_col)
    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t))
        )
        score_cols.append(
            F.struct(
                (hits / F.greatest(F.size(toks), F.lit(1)))
                .cast("double")
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*score_cols))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("lang_pred"),
        F.round(best["score"], 6).alias("lang_score"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, stopword_ratio, punct_ratio, mean_line_len, quality).

    The classic web-text quality trio: stopword density (signal of real
    prose), punctuation density, and line-length shape.
    """
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in sorted(D.STOPWORDS)[:120]])
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_toks
    )
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    punct_ratio = (
        F.length(F.regexp_replace(text_col, "[^.,;:!?]", "")) / n_chars
    )
    lines = F.split(F.col(text_col), "\n")
    mean_line_len = n_chars / F.greatest(F.size(lines), F.lit(1))
    quality = (
        F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.5
        + F.when((punct_ratio > 0.001) & (punct_ratio < 0.1), 0.3).otherwise(0.0)
        + F.when(mean_line_len > 40, 0.2).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_line_len, 6).alias("mean_line_len"),
        F.round(quality, 6).alias("quality"),
    )


def rolling_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", window: int = 8) -> DataFrame:
    """(doc_id, fingerprint) — min-sampled rolling window hash over tokens.

    Winnowing-style: hash every ``window``-token run, keep the minimum —
    robust to small edits, all JVM.
    """
    toks = _tokens(text_col)
    runs = F.expr(
        f"transform(sequence(1, greatest(size(_t) - {window - 1}, 1)),"
        f" i -> xxhash64(concat_ws(' ', slice(_t, i, {window}))))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select("doc_id", F.array_min(runs).alias("fingerprint"))
    )


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        window: int = 4, portable: bool = False) -> DataFrame:
    """(doc_id, pos, fingerprint) — the full winnowing fingerprint SET.

    Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting" (SIGMOD 2003): hash every ``k``-token gram, slide a
    window of ``window`` consecutive gram hashes, select each window's
    MINIMUM hash (rightmost occurrence on ties, the paper's rule), and
    record each selected (position, hash) once.  Guarantee: any token
    run of length >= ``window + k - 1`` shared by two documents yields
    at least one shared fingerprint — so PARTIAL overlaps (a quoted
    paragraph, boilerplate section, plagiarised passage) are detectable,
    which :func:`rolling_fingerprints`' single whole-document min digest
    cannot do.  Expected density is 2/(window+1) fingerprints per token.

    Narrow plan: one projection per document, no shuffle, no Python —
    the per-window argmin runs inside whole-stage codegen as nested
    array lambdas (O(tokens x window), window is small).  ``portable``
    swaps xxhash64 for the md5-slice hash with an exact ANSI-SQL twin
    (see :func:`..dedup.porthash64`), which lets the operator be
    oracle-checked end to end.

    Documents shorter than ``k`` tokens have no gram and emit no rows.
    """
    hash_sql = (
        "cast(conv(substring(md5(concat_ws(' ', slice(_t, i, {k}))), 1, 15),"
        " 16, 10) as bigint)"
        if portable
        else "xxhash64(concat_ws(' ', slice(_t, i, {k})))"
    ).format(k=k)
    grams = F.expr(f"transform(sequence(1, size(_t) - {k - 1}), i -> {hash_sql})")
    w = window
    # per window j: fingerprint = min(slice); pos = rightmost index
    # attaining it (ties only affect pos, never the selected hash)
    sel = F.expr(
        f"transform(sequence(1, greatest(size(_h) - {w - 1}, 1)), j ->"
        f" named_struct("
        f"   'pos', array_max(filter(sequence(j, least(j + {w - 1}, size(_h))),"
        f"            p -> _h[p - 1] = array_min(slice(_h, j, {w})))),"
        f"   'fingerprint', array_min(slice(_h, j, {w}))))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_t"))
        .filter(F.size("_t") >= k)
        .select("doc_id", grams.alias("_h"))
        .select("doc_id", F.explode(F.array_distinct(sel)).alias("_s"))
        .select("doc_id", F.col("_s.pos").alias("pos"),
                F.col("_s.fingerprint").alias("fingerprint"))
    )


def fingerprint_overlap(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        window: int = 4, min_shared: int = 3,
                        portable: bool = False) -> DataFrame:
    """(doc_a, doc_b, n_shared) — document pairs sharing >= ``min_shared``
    winnowing fingerprints, the MOSS-style overlap report.

    Self-join on the fingerprint value over DISTINCT (doc, hash) rows —
    positions drop out first, so a hash repeated across many positions
    in one document contributes once.  One shuffle on the 60/64-bit
    fingerprint; at corpus scale the join is bucketable on it and a hot
    boilerplate hash is AQE-skew-splittable, the same topology as the
    shingle join in q29 (``__spark_entry__._q29_ngram_jaccard_pairs``).
    """
    fp = (
        winnow_fingerprints(docs, id_col, text_col, k=k, window=window,
                            portable=portable)
        .select("doc_id", "fingerprint")
        .distinct()
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", top_n: int = 2,
                      dup_n: int = 5) -> DataFrame:
    """(doc_id, top2_frac, dup5_frac) — Gopher-style repetition filters.

    The two classic web-text repetition signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1 — public paper):

    - ``top2_frac``: occurrences of the single most frequent word
      ``top_n``-gram divided by total ``top_n``-grams (boilerplate /
      template pages score high);
    - ``dup5_frac``: fraction of word ``dup_n``-grams occurring more than
      once within the document (internally repetitive pages score high).

    Spark-first: n-gram explode → (doc, gram) counts (partial map-side
    combine) → one per-doc aggregate each; two shuffles keyed by doc_id,
    no per-row Python, whole-stage codegen throughout.  Docs shorter than
    the n-gram width keep fraction 0.0 via the left join-back.
    """

    def _grams(n: int):
        # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty
        # (unlike DuckDB's generate_series) — short docs need the guard
        return F.expr(
            f"CASE WHEN size(_t) >= {n} THEN"
            f" transform(sequence(1, size(_t) - {n - 1}),"
            f" i -> concat_ws(' ', slice(_t, i, {n})))"
            f" ELSE array() END"
        )

    if top_n == dup_n:
        raise ValueError("top_n and dup_n must differ (one pass per width)")
    base = (
        docs.select(F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_t"))
    )
    # ONE scan + tokenize + explode for both widths: tag each gram with its
    # width and aggregate (doc, n, gram) once — at corpus scale the text
    # scan dominates, so fusing the two n-gram passes halves it
    def _tag(n: int):
        # NB: a two-parameter lambda would be taken as transform's
        # (element, index) form — close over n via a factory instead
        return F.transform(
            _grams(n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.concat(_tag(top_n), _tag(dup_n))
    per = (
        base.select("doc_id", F.explode(tagged).alias("g"))
        .groupBy("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "n")
        .agg(
            F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_frac"),
            F.round(
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
                / F.sum("cnt"),
                6,
            ).alias("dup_frac"),
        )
    )
    top = per.filter(F.col("n") == top_n).select(
        "doc_id", F.col("top_frac").alias("top2_frac")
    )
    dup = per.filter(F.col("n") == dup_n).select(
        "doc_id", F.col("dup_frac").alias("dup5_frac")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(top, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("dup5_frac", F.lit(0.0)).alias("dup5_frac"),
        )
    )


def bigram_coherence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**9,
) -> DataFrame:
    """Self-trained bigram language-model quality score →
    (doc_id, n_bigrams, coherence) — the CCNet-style LM filter family
    (Wenzek et al., LREC'20) with the corpus itself as the model.

    coherence = integer mean over a doc's bigram INSTANCES of the
    scaled conditional frequency ``(scale * c(ab)) div c(a·)`` where
    ``c(ab)`` is the corpus bigram count and ``c(a·)`` the count of
    bigrams starting with ``a`` (so each per-prefix distribution sums
    to ~scale).  Gibberish and boilerplate-free unique text score low;
    repeated/templated text scores high — the standard perplexity
    signal with the sign flipped, in FIXED-POINT integer arithmetic
    (the q44 PageRank idiom): sums of integers are associative, so the
    score is bit-identical across engines, partitionings, and plans —
    unlike a float sum of log-probs, which is order-dependent.

    Plan: one token scan → bigram explode; model counts are two partial-
    aggregatable groupBys over the SAME bigram stream (Zipf-head safe —
    counts, not gram lists); the scoring join runs over PER-(doc, gram)
    COUNTS, not per-instance rows, so within-doc repetition (the Zipf
    head of boilerplate pages) never multiplies the shuffle — the score
    of a gram is constant, so weighting by the count is the identical
    sum.  Docs with < 2 tokens get n_bigrams = 0, coherence = 0 (kept,
    not dropped — a quality filter must see every doc).
    """
    toks = _tokens(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    grams = base.filter(F.size("_toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1),"
                " i -> struct(_toks[i - 1] AS a,"
                " concat_ws(' ', _toks[i - 1], _toks[i]) AS gram))"
            )
        ).alias("_g"),
    ).select("doc_id", "_g.a", "_g.gram")
    per = grams.groupBy("doc_id", "a", "gram").agg(
        F.count("*").cast("long").alias("_n")
    )
    model_bi = per.groupBy("gram").agg(F.sum("_n").cast("long").alias("_c_ab"))
    model_uni = per.groupBy("a").agg(F.sum("_n").cast("long").alias("_c_a"))
    scored = (
        per.join(model_bi, "gram")
        .join(model_uni, "a")
        .withColumn("_s", F.expr(f"({scale}L * _c_ab) div _c_a"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("_n").cast("long").alias("n_bigrams"),
        F.expr("sum(_s * _n) div sum(_n)").cast("long").alias("coherence"),
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("coherence", F.lit(0).cast("long")).alias("coherence"),
        )
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    scale: int = 10**6,
) -> DataFrame:
    """PMI collocation mining (Church & Hanks, CL'90) →
    (a, b, n_ab, lift_micro): the ``top_k`` adjacent-token bigrams most
    over-represented relative to their positional marginals — the
    phrase-mining primitive behind multiword-entity vocabularies
    (Mikolov NIPS'13 phrase pass uses the same score family).

    Scored by LIFT in fixed-point integers —
    ``lift_micro = (scale * N * c_ab) div (c_a* * c_*b)`` over the
    bigram event space (``c_a*`` = bigrams starting with ``a``,
    ``c_*b`` = bigrams ending with ``b``, ``N`` = total bigram
    instances) — PMI is ``log`` of this ratio, a monotone transform, so
    the integer ranking IS the PMI ranking with no runtime logs or
    float sums anywhere (the q44/q59/q61 portability idiom): the
    result is bit-identical across engines, partitionings, and plans.
    ``min_count`` is the standard sparse-PMI guard (rare pairs get
    unboundedly lucky); total order (lift desc, a, b) makes the
    ``top_k`` cut deterministic.

    Plan shape: one token scan → bigram explode; the pair table and
    both marginals are partial-aggregatable counts over the SAME gram
    stream (Zipf-safe — never a gram list); the marginal joins key on
    single tokens AFTER the ``min_count`` filter has shrunk the pair
    table, and the global cut is TakeOrderedAndProject (no full sort).
    Integer headroom: scale·N·c_ab < 2^63 holds through ~10^5-doc
    slices (10^6 · N · c_ab); the 100 TB path swaps ``scale`` for a
    post-division rescale or decimal(38) — documented, not silent.
    """
    toks = _tokens(text_col)
    grams = (
        docs.select(toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i - 1] AS a, _toks[i] AS b))"
                )
            ).alias("_g")
        )
        .select("_g.a", "_g.b")
    )
    pairs = grams.groupBy("a", "b").agg(F.count("*").cast("long").alias("n_ab"))
    first = pairs.groupBy("a").agg(F.sum("n_ab").cast("long").alias("_c_a"))
    second = pairs.groupBy("b").agg(F.sum("n_ab").cast("long").alias("_c_b"))
    total = pairs.agg(F.sum("n_ab").cast("long").alias("_n_total"))
    return (
        pairs.filter(F.col("n_ab") >= min_count)
        .join(first, "a")
        .join(second, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "n_ab",
            F.expr(f"({scale}L * _n_total * n_ab) div (_c_a * _c_b)")
            .cast("long")
            .alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "a", "b")
        .limit(top_k)
    )


def token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram token entropy → (doc_id, n_tokens,
    entropy_milli): the Shannon entropy of the doc's own token
    distribution, a standard curation quality signal — low entropy
    flags keyword-stuffed / template / repetitive spam pages that
    length and stopword ratios miss (complements the Gopher repetition
    filters, which look at surface n-gram mass rather than the
    distribution).

    entropy_milli = ml2(n) − (Σ_t c_t·ml2(c_t)) DIV n  — the exact
    identity H = log2 n − (1/n)·Σ c·log2 c evaluated in the integer
    MILLI-LOG2 fixed point shared with :func:`~.sampling.dsir_importance`
    (msb via bin() length + linear mantissa interpolation;
    deterministic cross-engine, truncating division, documented
    ≤86-milli interpolation error is part of the score definition).

    Plan shape: one token scan → per-(doc, token) counts (Zipf-safe:
    everything downstream is per-COUNT rows) → one per-doc sum.  Docs
    with zero tokens have no distribution and are not scored.
    """
    from .sampling import _ML2

    per = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(text_col)).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        per.withColumn("_cl", F.expr(_ML2.format(x="c")))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("_cl")).cast("long").alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr(_ML2.format(x="n_tokens"))
                - F.expr("_s div n_tokens")
            )
            .cast("long")
            .alias("entropy_milli"),
        )
    )


def skipgram_pairs(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram co-occurrence pair counts (the word2vec training-pair
    table, Mikolov NIPS'13) → (a, b, n_pairs): for every token
    position i, count the ordered pairs (t[i], t[j]) with
    i < j ≤ i+window, the positive examples an embedding trainer
    consumes.  Top-k by the total order (n_pairs DESC, a, b).

    Plan shape: the pairs are enumerated INSIDE the token array with a
    nested ``transform`` + ``flatten`` (one JVM pass per doc, output
    exactly n·window structs) — no positional self-join, so the cost
    is linear in corpus size, not quadratic in document length; then
    one groupBy and a TakeOrderedAndProject cut.  ``min_count``
    drops the Zipf tail before the ranking.
    """
    toks = _tokens(text_col)
    w = int(window)
    pairs = (
        docs.select(toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(_toks) - 2),"
                    " i -> transform("
                    f"sequence(i + 1, least(i + {w}, size(_toks) - 1)),"
                    " j -> struct(_toks[i] AS a, _toks[j] AS b))))"
                )
            ).alias("_g")
        )
        .select("_g.a", "_g.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") >= int(min_count))
    )
    return pairs.orderBy(F.desc("n_pairs"), "a", "b").limit(int(top_k))


def zipf_fit(
    docs: DataFrame,
    top_v: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank-frequency fit → ONE row (n_vocab, slope_milli,
    intercept_milli): the least-squares slope of ml2(frequency) against
    ml2(rank) over the ``top_v`` most frequent tokens — the standard
    corpus-health diagnostic (natural text sits near slope ≈ −1000
    milli, i.e. Zipf exponent ≈ 1; template/boilerplate-heavy or
    synthetic corpora bend it).

    Everything is exact integer arithmetic in the shared MILLI-LOG2
    fixed point: x=ml2(rank), y=ml2(freq), then the closed-form
    slope  = (V·Σxy − Σx·Σy)·1000 DIV (V·Σx² − Σx·Σx)  and
    intercept = (Σy·1000 − slope·Σx) DIV (V·1000), both truncating
    toward zero — identical semantics in Spark ``div`` and DuckDB
    ``//``, so the oracle hash-matches including the negative slope.

    Plan shape: token scan → vocab groupBy → ``TakeOrderedAndProject``
    cut to ``top_v`` rows — the ONLY window runs over that bounded
    ≤top_v-row frame (single partition by construction, never
    data-sized), then one scalar aggregate.  Returns NULL slope when
    fewer than 2 vocabulary rows exist.
    """
    from .sampling import _ML2

    freq = (
        docs.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("f"))
    )
    top = freq.orderBy(F.desc("f"), "token").limit(int(top_v))
    w = Window.orderBy(F.desc("f"), "token")  # bounded: <= top_v rows
    xy = top.select(
        F.row_number().over(w).cast("long").alias("r"), "f"
    ).select(
        F.expr(_ML2.format(x="r")).cast("long").alias("x"),
        F.expr(_ML2.format(x="f")).cast("long").alias("y"),
    )
    return (
        xy.agg(
            F.count("*").cast("long").alias("v"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        .withColumn(
            "slope_milli",
            F.expr(
                "(v * sxy - sx * sy) * 1000"
                " div nullif(v * sxx - sx * sx, 0)"
            ).cast("long"),
        )
        .select(
            F.col("v").alias("n_vocab"),
            "slope_milli",
            F.expr("(sy * 1000 - slope_milli * sx) div (v * 1000)")
            .cast("long")
            .alias("intercept_milli"),
        )
    )


def label_votes(
    docs: DataFrame,
    lfs: list[tuple[str, Column, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Weak-supervision labeling-function votes (the Snorkel data
    model, Ratner et al. VLDB'18) → long frame (``id_col``, lf, label):
    each labeling function is (name, boolean fire condition, label);
    a row is emitted only where the LF fires — abstains are absent by
    construction.

    One narrow select building an array of per-LF structs + one
    explode with a null filter — no shuffle, no UDF; the conditions
    are arbitrary JVM Column expressions (keyword hits, length gates,
    metadata predicates), so the whole vote matrix stays inside
    WholeStageCodegen over the document scan.
    """
    if not lfs:
        raise ValueError("label_votes needs at least one labeling function")
    votes = F.array(
        *[
            F.when(
                cond,
                F.struct(
                    F.lit(name).alias("lf"), F.lit(label).alias("label")
                ),
            )
            for name, cond, label in lfs
        ]
    )
    return (
        docs.select(F.col(id_col), F.explode(votes).alias("v"))
        .filter(F.col("v").isNotNull())
        .select(id_col, F.col("v.lf").alias("lf"), F.col("v.label").alias("label"))
    )


def majority_label(votes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document majority vote over a ``label_votes`` frame →
    (``id_col``, n_votes, label, margin): label = the plurality label
    (COUNT ties break to the smallest label string — deterministic),
    margin = winner count − runner-up count (0 on a tie).  Two hash
    aggs + one per-doc window rank over the (bounded) label domain.
    """
    from pyspark.sql import Window

    per_label = votes.groupBy(id_col, "label").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("n"), F.asc("label"))
    ranked = per_label.withColumn("rk", F.row_number().over(w))
    top2 = (
        ranked.filter(F.col("rk") <= 2)
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("label"))).alias("label"),
            F.max(F.when(F.col("rk") == 1, F.col("n"))).cast("long").alias("_n1"),
            F.coalesce(
                F.max(F.when(F.col("rk") == 2, F.col("n"))), F.lit(0)
            ).cast("long").alias("_n2"),
        )
    )
    totals = votes.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_votes")
    )
    return (
        totals.join(top2, id_col)
        .select(
            id_col,
            "n_votes",
            "label",
            (F.col("_n1") - F.col("_n2")).cast("long").alias("margin"),
        )
    )


def lf_summary(votes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-labeling-function diagnostics over a ``label_votes`` frame →
    (lf, n_fired, n_overlap, n_conflict): THE Snorkel analysis triple —
    coverage (how often the LF fires), overlap (fires alongside at
    least one other LF), conflict (fires alongside an LF voting a
    DIFFERENT label) — computed exactly, used to decide which noisy
    rules to keep before training a label model.

    Plan: one per-doc pre-aggregate (n LFs fired, distinct labels
    voted) broadcast-or-shuffle joined back to the vote frame, then one
    hash agg per LF.  A doc's vote row conflicts when the doc carries
    >1 distinct label — the per-LF attribution needs no pair join, so
    cost is linear in |votes|, never quadratic in LFs.
    """
    per_doc = votes.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lfs"),
        F.countDistinct("label").cast("long").alias("n_labels"),
    )
    return (
        votes.join(per_doc, id_col)
        .groupBy("lf")
        .agg(
            F.count("*").cast("long").alias("n_fired"),
            F.sum((F.col("n_lfs") > 1).cast("long"))
            .cast("long")
            .alias("n_overlap"),
            F.sum((F.col("n_labels") > 1).cast("long"))
            .cast("long")
            .alias("n_conflict"),
        )
    )


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Positional inverted-index build → one posting per (token, doc):
    (token, ``id_col``, tf, positions_csv) with positions the 0-based
    token offsets in document order, serialized as a comma string (a
    fixed-width-friendly, engine-comparable form of the posting
    payload).

    The search-index construction job: phrase and proximity queries
    need positions, BM25 needs tf, and the (token, doc) grain keeps
    every output row bounded by ONE document's length — a stopword's
    postings spread across many rows instead of one mega-array (the
    exact-dedup keeper lesson).  Plan: one posexplode → one (token,
    doc) hash-agg with a sorted collect bounded per doc; df/cf term
    statistics are one further agg on the output.  Shuffle key is
    (token, doc) — head tokens spread over their documents, so there
    is no single-reducer hot key by construction.
    """
    return (
        docs.select(
            F.col(id_col), F.posexplode(F.col(tokens_col)).alias("pos", "token")
        )
        .groupBy("token", id_col)
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("pos").cast("long"))), ","
            ).alias("positions_csv"),
        )
    )


def lm_perplexity_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """CCNet-style n-gram language-model quality filter (Wenzek et al.
    LREC'20) in exact integer milli-log2 → one row per document with
    ≥1 bigram: (``id_col``, n_bigrams, mll2_total, ppl_milli).

    A bigram LM with add-one smoothing is trained on the corpus itself
    and every document is scored under it — the CommonCrawl curation
    step that ranks pages by how "in-domain" their text is (low
    perplexity = fluent prose, high = gibberish/boilerplate).  Per
    bigram instance the additive score is
    ``mll2(c(w1,w2)+1) − mll2(c(w1)+V)`` (Laplace P(w2|w1) in the
    integer milli-log2 of operators/sampling._ML2 — monotone,
    zero-float, bit-identical in ANSI SQL); ``mll2_total`` sums the
    instances and ``ppl_milli = (−mll2_total) DIV n_bigrams`` is the
    milli-log2 perplexity (higher = less probable).

    Plan: one explode to bigram instances; context counts c(w1) and
    bigram counts c(w1,w2) are two map-side-combinable hash aggs over
    the SAME instance frame (so the model is self-consistent: c(w1) =
    Σ_w2 c(w1,w2)); V (vocab size) is a broadcast scalar; scoring is
    two shuffle equi-joins on (w1,w2) and (w1) — no head key worse than
    the corpus's own token skew, no arrays, no Python.
    """
    from .sampling import _ML2

    # sequence(1, 0) DESCENDS in Spark (it is not empty) — filter the
    # sub-bigram docs out before building the instance frame
    bi = (
        docs.filter(F.size(tokens_col) >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({tokens_col}) - 1), "
                    f"i -> struct({tokens_col}[i - 1] AS w1, "
                    f"{tokens_col}[i] AS w2))"
                )
            ).alias("_b"),
        )
        .select(id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("_cb"))
    cu = bi.groupBy("w1").agg(F.count("*").alias("_cu"))
    vocab = docs.select(
        F.explode(F.col(tokens_col)).alias("_w")
    ).agg(F.countDistinct("_w").alias("_v"))
    scored = (
        bi.join(bc, ["w1", "w2"])
        .join(cu, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                F.expr(_ML2.format(x="(_cb + 1)"))
                - F.expr(_ML2.format(x="(_cu + _v)"))
            ).alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("_s").cast("long").alias("mll2_total"),
        F.expr("(-sum(_s)) DIV count(*)").cast("long").alias("ppl_milli"),
    )
