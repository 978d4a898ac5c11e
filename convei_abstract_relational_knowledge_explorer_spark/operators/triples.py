"""Stage 3 — triple emission: mentions → (subj, pred, obj) rows.

The parity surface of BASELINE.json: the distinct (subj, pred, obj) set is
compared against the reference's emitted edge tables (P/R >= 0.95).

Predicate mapping (reference edge table → pred):
  publication_to_satellite      → MENTIONS_SATELLITE
      (/root/reference/analyze_sat_and_data_types_in_abstracts.py:74-97)
  publication_to_data_type      → MENTIONS_DATA_TYPE  (same file)
  satellite_type column         → HAS_MISSION
      (/root/reference/fast_regex_mission_id.py:252-269)
  publication_study_locations   → STUDY_LOCATION
      (/root/reference/populate_study_locations.py:79-109)
  publication_author_locations  → AUTHOR_LOCATED_IN
      (/root/reference/populate_author_locations.py:281-324)
  raw_topic_to_publication      → HAS_TOPIC
      (/root/reference/topic_discovery_pipeline.py:634-656; our miner is
      the deterministic TF-IDF substitute — excluded from the parity set)

Output schema:
  (subj string, pred string, obj string, doc_id long, surface string,
   method string, author string, year int)
subj = url (stable natural key); provenance columns mirror the reference's
matched_text / match_method (/root/reference/models.py:434-435).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import mentions as M
from .linking import link_affiliations

PARITY_PREDS = (
    "MENTIONS_SATELLITE",
    "MENTIONS_DATA_TYPE",
    "HAS_MISSION",
    "STUDY_LOCATION",
    "AUTHOR_LOCATED_IN",
)

_KIND_TO_PRED = {
    "satellite": "MENTIONS_SATELLITE",
    "data_type": "MENTIONS_DATA_TYPE",
    "mission": "HAS_MISSION",
    "study_location": "STUDY_LOCATION",
}


def _shape(mentions: DataFrame, docs: DataFrame, pred_map: dict[str, str]) -> DataFrame:
    pred = F.col("kind")
    for kind, name in pred_map.items():
        pred = F.when(F.col("kind") == kind, name).otherwise(pred)
    keys = docs.select("doc_id", "url", "year")
    return mentions.join(keys, "doc_id").select(
        F.col("url").alias("subj"),
        pred.alias("pred"),
        F.col("entity").alias("obj"),
        "doc_id",
        "surface",
        "method",
        F.lit(None).cast("string").alias("author"),
        "year",
    )


def emit_triples(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """documents → triples (all mention families unioned).

    The three Python mention families (mission regex bank, study
    locations, affiliation segmenting) run as ONE fused Arrow pass over
    the doc text, materialized once (localCheckpoint) and split by kind —
    the corpus is read once, not three times.  The dictionary substring
    scans stay pure-JVM broadcast contains-joins on the same docs scan.
    """
    sat_terms = M.dictionary_terms(spark, "satellite")
    dt_terms = M.dictionary_terms(spark, "data_type")

    fused = M.fused_python_mentions(docs).localCheckpoint(eager=False)

    py_mentions = fused.filter(F.col("kind") != "affiliation_segment").select(
        "doc_id", "kind", "surface", "entity", "method",
        F.lit(None).cast("string").alias("extra"),
    )
    mention_union = (
        M.substring_mentions(docs, sat_terms)
        .unionByName(M.substring_mentions(docs, dt_terms))
        .unionByName(py_mentions)
    )
    base = _shape(mention_union, docs, _KIND_TO_PRED)

    segments = fused.filter(F.col("kind") == "affiliation_segment").select(
        "doc_id",
        "affiliation_index",
        "author_name",
        "author_index",
        "raw_author_group",
        F.col("entity").alias("affiliation_text"),
    )
    linked = link_affiliations(segments).filter(F.col("location").isNotNull())
    keys = docs.select("doc_id", "url", "year")
    author_triples = linked.join(keys, "doc_id").select(
        F.col("url").alias("subj"),
        F.lit("AUTHOR_LOCATED_IN").alias("pred"),
        F.col("location").alias("obj"),
        "doc_id",
        F.col("affiliation_text").alias("surface"),
        "method",
        F.col("author_name").alias("author"),
        "year",
    )

    return base.unionByName(author_triples)


def parity_triples(triples: DataFrame) -> DataFrame:
    """The distinct (subj, pred, obj) set compared against the reference."""
    return (
        triples.filter(F.col("pred").isin(*PARITY_PREDS))
        .select("subj", "pred", "obj")
        .distinct()
    )


def negative_triples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 2,
    seed: str = "neg",
    entity_col: str = "entity",
    n_buckets: int = 64,
) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (Bordes et
    al., TransE, NIPS'13) → (subj, pred, obj_neg, neg_idx).

    For every true (subj, pred, obj) triple, ``k`` corrupted negatives:
    the object is replaced by a pseudo-random entity drawn from
    ``entities`` by deterministic hash index, then FILTERED — a corrupt
    candidate that equals the true object or collides with ANY true
    (subj, pred, ·) triple is dropped (so negatives are guaranteed
    false, the "filtered" protocol every KG-embedding paper evaluates
    under).  Seeded-hash draws make the sample bit-identical across
    engines, partitionings and retries.

    Entity indexing is the scale story: the draw needs a dense 0..n-1
    rank over the entity vocabulary, and ONE global row_number is a
    single-partition sort.  Rank order is DEFINED as
    (porthash64(entity), entity) and computed in two phases (the
    pack_documents distributed prefix-sum idiom): ranks within
    ``n_buckets`` hash-prefix buckets under a partitioned window, plus
    broadcast bucket offsets from a B-row aggregate.  Bucket id is the
    hash's HIGH bits, so bucket-major order IS hash order and the
    DuckDB oracle can replay the rank with one global window.
    """
    from pyspark.sql.window import Window

    from .dedup import porthash64

    h = porthash64(F.col("cand").cast("string"), seed)
    bits = max(1, (n_buckets - 1).bit_length())
    base = entities.select(F.col(entity_col).alias("cand")).distinct().select(
        "cand",
        h.alias("h"),
        F.shiftright(h, 60 - bits).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("h", "cand")
    local = base.withColumn("local_rank", F.row_number().over(w))
    totals = base.groupBy("bucket").agg(F.count("*").alias("bucket_n"))
    wp = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefixes = totals.select(
        "bucket",
        (F.sum("bucket_n").over(wp) - F.col("bucket_n")).alias("bucket_prefix"),
    )
    indexed = local.join(F.broadcast(prefixes), "bucket").select(
        "cand",
        (F.col("bucket_prefix") + F.col("local_rank") - 1).alias("idx"),
    )
    n = indexed.count()
    if n == 0:
        raise ValueError("entities is empty")

    true = triples.select("subj", "pred", "obj").distinct()
    drawn = true.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("neg_idx"),
    ).select(
        "subj",
        "pred",
        "obj",
        "neg_idx",
        F.pmod(
            porthash64(
                F.concat_ws(
                    "\x1f",
                    F.col("subj").cast("string"),
                    F.col("pred").cast("string"),
                    F.col("obj").cast("string"),
                    F.col("neg_idx").cast("string"),
                ),
                seed,
            ),
            F.lit(n),
        ).alias("idx"),
    )
    # plain equi-join on idx: the entity vocabulary can be ~10^9 rows at
    # the design scale, so no broadcast hint — AQE promotes it when small
    corrupted = (
        drawn.join(indexed, "idx")
        .filter(F.col("cand") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("cand").alias("obj_neg"),
            "neg_idx",
        )
    )
    return corrupted.join(
        true.select(
            "subj", "pred", F.col("obj").alias("obj_neg")
        ).distinct(),
        ["subj", "pred", "obj_neg"],
        "left_anti",
    )


def relation_cardinality(triples: DataFrame) -> DataFrame:
    """Relation-cardinality profiling (schema / TBox induction) → one
    row per predicate: (pred, n_triples, n_subj, n_obj, max_out,
    max_in, functionality_milli, inv_functionality_milli, card_class
    ∈ 1:1 | 1:N | N:1 | N:M).

    THE first pass of KG construction over extracted triples: before a
    relation can be stored, validated, or embedded, the builder must
    know whether it is functional (everyone has ONE birthplace) or
    multi-valued (a paper has MANY authors).  ``max_out`` is the
    largest distinct-object fan-out of any subject, ``max_in`` the
    largest distinct-subject fan-in of any object;
    ``functionality_milli = (1000·n_subj) DIV n_triples`` is AMIE's
    functionality score (Galárraga et al., WWW'13) in exact integer
    milli units — 1000 means perfectly functional.

    The classification uses the observed extremes: max_out = max_in =
    1 → ``1:1``; only fan-out exceeds 1 → ``1:N``; only fan-in →
    ``N:1``; both → ``N:M``.

    Plan: one distinct over (s,p,o), then two (pred, endpoint)
    hash-agg chains (groupBy(pred, subj) → countDistinct obj →
    per-pred max; mirrored for obj) joined on the (tiny) pred key —
    every stage map-side combinable, linear in |triples|, no windows.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    out = (
        t.groupBy("pred", "subj")
        .agg(F.count("*").cast("long").alias("fo"))
        .groupBy("pred")
        .agg(
            F.sum("fo").cast("long").alias("n_triples"),
            F.count("*").cast("long").alias("n_subj"),
            F.max("fo").cast("long").alias("max_out"),
        )
    )
    inn = (
        t.groupBy("pred", "obj")
        .agg(F.count("*").cast("long").alias("fi"))
        .groupBy("pred")
        .agg(
            F.count("*").cast("long").alias("n_obj"),
            F.max("fi").cast("long").alias("max_in"),
        )
    )
    return (
        out.join(inn, "pred")
        .select(
            "pred",
            "n_triples",
            "n_subj",
            "n_obj",
            "max_out",
            "max_in",
            F.expr("(1000 * n_subj) DIV n_triples").alias(
                "functionality_milli"
            ),
            F.expr("(1000 * n_obj) DIV n_triples").alias(
                "inv_functionality_milli"
            ),
            F.when(
                (F.col("max_out") == 1) & (F.col("max_in") == 1), "1:1"
            )
            .when(F.col("max_in") == 1, "1:N")
            .when(F.col("max_out") == 1, "N:1")
            .otherwise("N:M")
            .alias("card_class"),
        )
    )


def mine_path_rules(
    triples: DataFrame,
    min_support: int = 1,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """AMIE-style length-2 closed-rule mining → (r1, r2, r3, support,
    n_body, n_head, conf_milli, hc_milli): for every rule
    ``r1(x,y) ∧ r2(y,z) ⇒ r3(x,z)``, the exact integer support
    (distinct (x,z) pairs satisfying body AND head), PCA-free standard
    confidence ``conf_milli = (1000·support) DIV n_body`` and head
    coverage ``hc_milli = (1000·support) DIV n_head`` (Galárraga et
    al., WWW'13, §4) — the rule-mining step that turns an extracted
    triple store into an inference-capable KG.

    Reflexive bindings x = z are excluded from both body and head
    universes (a rule that only proves self-loops is noise), and all
    counts are over DISTINCT entity pairs, so duplicate extractions
    carry no weight.

    ``max_mid_degree`` drops middle entities y whose total degree
    (in+out over distinct triples) exceeds the cap BEFORE the
    body self-join — the hub guard: one celebrity y of degree 10⁶
    would otherwise contribute 10¹² body pairs.  The same
    rare-first discipline as the co-occurrence and containment
    joins; None means no cap.

    Plan: distinct triples; optional degree filter (two hash aggs +
    one semi join); body = one equi self-join on the middle entity
    (shuffle on y) → distinct (r1,r2,x,z); head = left join of body
    pairs against the triple set on (x,z) (shuffle on the pair);
    three hash aggs.  No windows, no cross joins; cost is bounded by
    Σ_y deg_in(y)·deg_out(y) — exactly what the hub cap bounds.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    if max_mid_degree is not None:
        deg = (
            t.select(F.col("subj").alias("e"))
            .unionAll(t.select(F.col("obj").alias("e")))
            .groupBy("e")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_mid_degree)
            .select("e")
        )
        mid_ok = deg
    else:
        mid_ok = None
    left = t.select(
        F.col("subj").alias("x"),
        F.col("pred").alias("r1"),
        F.col("obj").alias("y"),
    )
    right = t.select(
        F.col("subj").alias("y"),
        F.col("pred").alias("r2"),
        F.col("obj").alias("z"),
    )
    if mid_ok is not None:
        left = left.join(mid_ok.select(F.col("e").alias("y")), "y", "left_semi")
        right = right.join(
            mid_ok.select(F.col("e").alias("y")), "y", "left_semi"
        )
    body = (
        left.join(right, "y")
        .filter(F.col("x") != F.col("z"))
        .select("r1", "r2", "x", "z")
        .distinct()
    )
    heads = t.filter(F.col("subj") != F.col("obj")).select(
        F.col("subj").alias("x"),
        F.col("pred").alias("r3"),
        F.col("obj").alias("z"),
    )
    n_head = heads.groupBy("r3").agg(
        F.count("*").cast("long").alias("n_head")
    )
    matched = (
        body.join(heads, ["x", "z"])
        .groupBy("r1", "r2", "r3")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    n_body = body.groupBy("r1", "r2").agg(
        F.count("*").cast("long").alias("n_body")
    )
    return (
        matched.join(n_body, ["r1", "r2"])
        .join(n_head, "r3")
        .select(
            "r1",
            "r2",
            "r3",
            "support",
            "n_body",
            "n_head",
            F.expr("(1000 * support) DIV n_body").alias("conf_milli"),
            F.expr("(1000 * support) DIV n_head").alias("hc_milli"),
        )
    )


def ranking_eval(
    scored: DataFrame,
    test: DataFrame,
    truths: DataFrame,
    ks: tuple[int, ...] = (1, 3, 10),
) -> DataFrame:
    """Filtered link-prediction ranking evaluation (the TransE protocol,
    Bordes et al., NIPS'13) → ONE row: (n_test, hits_K per K,
    mrr_micro, mean_rank_milli), all exact integers.

    For each test pair (subj, obj*) the rank of obj* among the scored
    candidates for subj is ``1 + #{obj' : better(obj', obj*)}`` where
    better = higher score, ties broken by obj ascending (a pure
    function of the data — no nondeterministic tie handling), and
    candidates appearing in ``truths`` (the full known-true set, train
    ∪ test) are FILTERED out except obj* itself — the standard
    filtered setting that stops a model being punished for ranking a
    different true answer first.

    ``mrr_micro = (Σ 1000000 DIV rank) DIV n_test`` and
    ``mean_rank_milli = (1000·Σ rank) DIV n_test`` — bit-identical
    across engines, no floats.

    Plan: candidates join test on subj (shuffle on subj; the test
    side is small — broadcast when it fits), one anti-condition for
    the filter (left join against truths, keep unmatched-or-self),
    one hash agg per test pair for the rank, one global agg.  The
    per-subject candidate list is the caller's contract — pass
    blocked candidates (IVF cells, recordlinkage blocks) at scale,
    never an unblocked entity cross join.
    """
    cand = scored.select(
        "subj", F.col("obj").alias("cobj"), F.col("score").cast("long")
    )
    tst = test.select("subj", F.col("obj").alias("tobj"))
    true_score = cand.join(
        tst.withColumnRenamed("tobj", "cobj"), ["subj", "cobj"]
    ).select(
        "subj",
        F.col("cobj").alias("tobj"),
        F.col("score").alias("tscore"),
    )
    filt = truths.select(
        "subj", F.col("obj").alias("cobj"), F.lit(True).alias("is_true")
    ).distinct()
    better = (
        cand.join(filt, ["subj", "cobj"], "left")
        .join(true_score, "subj")
        .filter(
            (F.col("is_true").isNull() | (F.col("cobj") == F.col("tobj")))
            & (
                (F.col("score") > F.col("tscore"))
                | (
                    (F.col("score") == F.col("tscore"))
                    & (F.col("cobj") < F.col("tobj"))
                )
            )
        )
        .groupBy("subj", "tobj")
        .agg(F.count("*").cast("long").alias("n_better"))
    )
    ranks = (
        true_score.join(better, ["subj", "tobj"], "left")
        .select(
            "subj",
            "tobj",
            (F.coalesce(F.col("n_better"), F.lit(0)) + 1)
            .cast("long")
            .alias("rank"),
        )
    )
    aggs = [F.count("*").cast("long").alias("n_test")]
    for k in ks:
        aggs.append(
            F.sum((F.col("rank") <= k).cast("long"))
            .cast("long")
            .alias(f"hits{k}")
        )
    aggs.append(
        F.sum(F.expr("1000000 DIV rank")).cast("long").alias("rr_sum")
    )
    aggs.append(F.sum("rank").cast("long").alias("rank_sum"))
    return ranks.agg(*aggs).select(
        "n_test",
        *[f"hits{k}" for k in ks],
        F.expr("(rr_sum) DIV n_test").alias("mrr_micro"),
        F.expr("(1000 * rank_sum) DIV n_test").alias("mean_rank_milli"),
    )


def truth_discovery(
    claims: DataFrame,
    rounds: int = 2,
    source_col: str = "source",
    obj_col: str = "obj",
    val_col: str = "val",
) -> DataFrame:
    """Iterative truth discovery / source-reliability estimation
    (TruthFinder family, Yin et al. KDD'07, in integer fixed point) →
    (source, n_claims, trust_milli): ``rounds`` alternations of

      fact confidence(o, v) = Σ trust of the sources claiming (o, v)
      winner(o)             = argmax confidence, ties to smallest v
      trust(s)              = (1000 · #claims of s that agree with the
                               winner) DIV #claims of s

    starting from uniform trust 500 — the knowledge-fusion step that
    resolves CONFLICTING extractions (three crawlers claim different
    values for the same attribute; believe the reliable ones, and
    judge reliability by agreement with the consensus).  All
    arithmetic is exact integer milli units and every tie breaks
    deterministically, so round r is a pure function of round r−1 and
    the whole run replays as unrolled SQL CTEs.

    Claims are deduped to distinct (source, obj, val) first — a source
    repeating itself gains no weight.  Plan per round: one equi-join
    of claims against the (small) trust frame, two hash aggs, one
    per-object window rank over distinct (obj, val) candidates (bounded
    by the value domain, not the claim count), one agreement join.
    The trust frame is localCheckpointed per round so lineage stays
    flat (the connected-components discipline).
    """
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError("truth_discovery needs rounds >= 1")
    c = claims.select(
        F.col(source_col).alias("source"),
        F.col(obj_col).alias("obj"),
        F.col(val_col).alias("val"),
    ).distinct()
    c = c.localCheckpoint(eager=True)
    trust = (
        c.select("source")
        .distinct()
        .withColumn("trust_milli", F.lit(500).cast("long"))
    )
    w = Window.partitionBy("obj").orderBy(
        F.desc("conf"), F.asc("val")
    )
    for _ in range(rounds):
        conf = (
            c.join(trust, "source")
            .groupBy("obj", "val")
            .agg(F.sum("trust_milli").cast("long").alias("conf"))
        )
        winners = (
            conf.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("obj", F.col("val").alias("winner"))
        )
        trust = (
            c.join(winners, "obj")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_claims"),
                F.sum(
                    (F.col("val") == F.col("winner")).cast("long")
                ).alias("n_agree"),
            )
            .select(
                "source",
                "n_claims",
                F.expr("(1000 * n_agree) DIV n_claims").alias(
                    "trust_milli"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return trust.select("source", "n_claims", "trust_milli")
