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


def bgp_selectivity_order(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> list[tuple[str, str, str]]:
    """Statistics-driven BGP join ordering (the RDF planner heuristic of
    Stocker et al., WWW'08): estimate each pattern's result cardinality
    from ONE tiny per-predicate statistics aggregate, then greedily
    order patterns cheapest-first under the constraint that every
    pattern after the first shares a variable with the already-joined
    prefix (no accidental cross products).

    Estimates (n_t = store triple count, per-pred n_p / distinct subj
    s_p / distinct obj o_p):
      (s  P  o)  →  1
      (?x P  o)  →  n_p / o_p          (avg fan-in of P)
      (s  P ?y)  →  n_p / s_p          (avg fan-out of P)
      (?x P ?y)  →  n_p
      variable predicate → n_t (scan) — rare, ranked last.

    The stats frame is bounded by the predicate vocabulary (tiny) and
    collected once; Catalyst/AQE then refines the actual join strategy
    at runtime — this ordering only fixes the join TREE, which AQE
    cannot change.
    """
    stats = {
        r["pred"]: (r["n"], r["ns"], r["no"])
        for r in triples.groupBy("pred")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("subj").alias("ns"),
            F.countDistinct("obj").alias("no"),
        )
        .collect()
    }
    n_total = sum(n for n, _, _ in stats.values()) or 1

    def est(pat):
        s, p, o = pat
        sv, ov = s.startswith("?"), o.startswith("?")
        if p.startswith("?"):
            return float(n_total)
        n, ns, no = stats.get(p, (0, 1, 1))
        if not sv and not ov:
            return 1.0
        if sv and not ov:
            return n / max(no, 1)
        if not sv and ov:
            return n / max(ns, 1)
        return float(n)

    def pat_vars(pat):
        return {t[1:] for t in pat if t.startswith("?")}

    remaining = list(patterns)
    ordered: list[tuple[str, str, str]] = []
    bound: set[str] = set()
    while remaining:
        connected = [
            p for p in remaining if not ordered or pat_vars(p) & bound
        ]
        pool = connected or remaining  # disconnected BGP: cheapest next
        best = min(pool, key=lambda p: (est(p), remaining.index(p)))
        ordered.append(best)
        bound |= pat_vars(best)
        remaining.remove(best)
    return ordered


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    optional: list[tuple[str, str, str]] | None = None,
    optimize: bool = False,
    values: dict[str, list] | None = None,
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL-style basic-graph-pattern matching over a (subj, pred,
    obj) store → one row per variable binding.

    ``patterns`` is a conjunction of triple patterns; a term starting
    with ``?`` is a variable, anything else a constant.  The classic
    worked example (SPARQL 1.1 §5.2; the reference's explorer.html
    filters publications by satellite AND country client-side, and
    /root/reference/build_reports.py hand-loops one lookup per such
    conjunction) becomes ONE declarative multi-way self-join
    Catalyst can reorder:

      each pattern  → one filtered scan of the store (constants become
                      pushed-down equality predicates on subj/pred/obj)
      shared vars   → inner equi-join keys between the pattern frames
      repeated var
      in ONE pattern→ an intra-row equality filter (``?x P ?x``)

    Scale shape: a pattern with a constant predicate scans one
    predicate partition (the store is partitioned by pred at scale);
    every join is a hash equi-join on binding columns, so AQE sizes
    and reorders them — no cartesian unless two patterns genuinely
    share no variable (in which case the BGP *is* a cross product and
    the caller asked for it).

    ``select`` projects a subset of variables (names without ``?``)
    after matching; duplicate bindings are preserved (SPARQL bag
    semantics — wrap in ``.distinct()`` for set semantics).
    ``optimize=True`` reorders the required patterns cheapest-first by
    per-predicate statistics (:func:`bgp_selectivity_order`) before
    building the join tree — binding-column order and results are
    unchanged (first-appearance order is pinned on the ORIGINAL pattern
    list).
    ``values={var: [v1, v2, …]}`` is SPARQL 1.1 §10 VALUES: inline data
    joined onto the bindings — realized as a BROADCAST inner join on a
    literal frame, so it both restricts and (on Catalyst's side) seeds
    runtime filters into the pattern scans.
    ``filters=[sql_bool_expr, …]`` is FILTER: each expression (over the
    variable columns) is applied after matching; in SPARQL semantics a
    FILTER whose expression errors/NULLs drops the row, which is
    exactly DataFrame ``filter`` semantics.
    """
    if not patterns:
        raise ValueError("bgp_match needs at least one triple pattern")
    optional = optional or []
    # first-appearance variable order over the ORIGINAL pattern list —
    # captured BEFORE any statistics-driven reorder so the result
    # schema is data-independent (optimize=True must not change it)
    order: list[str] = []
    for pat in patterns:
        for term in pat:
            if term.startswith("?") and term[1:] not in order:
                order.append(term[1:])
    if optimize:
        patterns = bgp_selectivity_order(triples, patterns)

    def frame(pat: tuple[str, str, str]) -> DataFrame:
        s, p, o = pat
        df = triples.select("subj", "pred", "obj")
        cols: dict[str, str] = {}
        for pos, term in zip(("subj", "pred", "obj"), (s, p, o)):
            if term.startswith("?"):
                var = term[1:]
                if var in cols:
                    # repeated variable inside one pattern: equality
                    df = df.filter(F.col(pos) == F.col(cols[var]))
                else:
                    cols[var] = pos
            else:
                df = df.filter(F.col(pos) == F.lit(term))
        out = df.select(
            *[F.col(pos).alias(var) for var, pos in cols.items()]
        )
        if not cols:
            # variable-free pattern: a pure existence guard.  A graph is
            # a SET of triples, so matching must contribute each
            # solution exactly once — limit(1) keeps "≥1 match → keep
            # all bindings, 0 matches → empty", and a duplicate-bearing
            # store can no longer multiply the bag via the crossJoin.
            out = out.limit(1)
        return out

    out = frame(patterns[0])
    for pat in patterns[1:]:
        nxt = frame(pat)
        shared = sorted(set(out.columns) & set(nxt.columns))
        out = out.join(nxt, shared) if shared else out.crossJoin(nxt)
    # OPTIONAL patterns (SPARQL 1.1 §6): left outer joins AFTER the
    # required block — a non-matching optional keeps the binding row
    # and leaves its fresh variables NULL.  Each optional must share at
    # least one variable with the required block (otherwise it would be
    # an unbounded cross product of unrelated bindings).
    for pat in optional:
        nxt = frame(pat)
        shared = sorted(set(order) & set(nxt.columns))
        if not shared:
            raise ValueError(
                f"OPTIONAL pattern {pat} shares no variable with the"
                " required patterns"
            )
        out = out.join(nxt, shared, "left")
        order += [c for c in nxt.columns if c not in order]
    for var, vals in (values or {}).items():
        if var not in order:
            raise ValueError(f"VALUES variable ?{var} is not bound")
        vdf = triples.sparkSession.createDataFrame(
            [(v,) for v in vals], f"{var} string"
        )
        out = out.join(F.broadcast(vdf), var)
    for expr in filters or []:
        out = out.filter(F.expr(expr))
    # joins reorder columns (shared keys float left); pin the binding
    # order to variable first appearance so results are plan-independent
    out = out.select(*order)
    if select is not None:
        out = out.select(*select)
    return out


#: obj tokens that denote entities (vs literals) in the synthetic KG
#: store — single-letter-prefixed ids and part brands.
ENTITY_RE = "^([CSNOR][0-9]+|Brand#[0-9]+)$"


def to_ntriples(
    triples: DataFrame,
    entity_base: str = "http://example.org/e/",
    pred_base: str = "http://example.org/p/",
    entity_re: str = ENTITY_RE,
) -> DataFrame:
    """Serialize a (subj, pred, obj) store to RDF N-Triples 1.1 lines
    → (subj, pred, obj, line).

    The materialize-to-RDF step of a KG build (the reference keeps its
    graph in SQLite tables; the interchange form at web scale is a
    sharded ``.nt`` dump).  Pure string expressions, byte-deterministic:

    * subj / pred → IRIs under the two base namespaces; the only
      IRI-hostile bytes our ids carry (``#``, space) are
      percent-encoded — ``Brand#12`` → ``<…/e/Brand%2312>``.
    * obj → an IRI when it matches ``entity_re``, else a quoted
      literal with the five mandatory N-Triples escapes applied in
      the grammar's order: backslash FIRST, then ``"``, LF, CR, TAB.

    Narrow per-row transform — no shuffle, whole-stage codegen; the
    writer can emit ``line`` alone as a text sink partitioned however
    the store already is.
    """

    def iri(col, base):
        enc = F.expr(
            f"replace(replace({col}, '#', '%23'), ' ', '%20')"
        )
        return F.concat(F.lit("<" + base), enc, F.lit(">"))

    lit = F.col("obj")
    for raw, esc in (
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
    ):
        lit = F.replace(lit, F.lit(raw), F.lit(esc))
    obj_term = F.when(
        F.col("obj").rlike(entity_re), iri("obj", entity_base)
    ).otherwise(F.concat(F.lit('"'), lit, F.lit('"')))
    return triples.select(
        "subj",
        "pred",
        "obj",
        F.concat(
            iri("subj", entity_base),
            F.lit(" "),
            iri("pred", pred_base),
            F.lit(" "),
            obj_term,
            F.lit(" ."),
        ).alias("line"),
    )


def canonicalize_triples(
    triples: DataFrame,
    alias_edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """sameAs-closure canonicalization of a triple store → one row per
    MERGED triple with provenance counts:
    (subj, pred, obj, n_rows, n_subj_variants, n_obj_variants).

    The entity-resolution step the north rule names ("entity linking
    and canonicalization … connected-components to merge duplicate
    nodes"): ``alias_edges`` is the undirected sameAs evidence (from
    LSH blocking, dictionary aliases, redirect chains …); its
    *transitive closure* — computed with the distributed
    large-star/small-star :func:`~..components.connected_components`,
    NOT pairwise — maps every surface form to the lexicographic-min
    member of its equivalence class.  Subjects and objects are then
    rewritten through that map (two left joins against the same
    broadcast-or-shuffle canonical frame) and identical rewritten
    triples collapse, keeping exact provenance: how many raw rows
    merged, and how many distinct surface forms each endpoint had.

    Scale shape: CC is the bounded-round iterate (its cost is the
    alias graph, far smaller than the store); the two rewrite joins
    hash on the mention string — the same key the store is bucketed
    by — and the final groupBy is map-side combinable.
    """
    from .components import connected_components

    canon = connected_components(alias_edges, src=src, dst=dst).select(
        F.col("node"), F.col("component").alias("canon")
    )
    c1 = canon.select(
        F.col("node").alias("subj"), F.col("canon").alias("subj_c")
    )
    c2 = canon.select(
        F.col("node").alias("obj"), F.col("canon").alias("obj_c")
    )
    return (
        triples.join(c1, "subj", "left")
        .join(c2, "obj", "left")
        .select(
            F.coalesce("subj_c", "subj").alias("c_subj"),
            "pred",
            F.coalesce("obj_c", "obj").alias("c_obj"),
            F.col("subj").alias("raw_subj"),
            F.col("obj").alias("raw_obj"),
        )
        .groupBy(
            F.col("c_subj").alias("subj"),
            "pred",
            F.col("c_obj").alias("obj"),
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("raw_subj").cast("long").alias(
                "n_subj_variants"
            ),
            F.countDistinct("raw_obj").cast("long").alias(
                "n_obj_variants"
            ),
        )
    )


def entity_type(col) -> F.Column:
    """Deterministic entity-typing of the synthetic store's id scheme —
    the prefix convention _kg_triples emits (C/S/N/R/O + digits,
    Brand#n); anything else is a literal."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.rlike("^C[0-9]+$"), "Customer")
        .when(c.rlike("^S[0-9]+$"), "Supplier")
        .when(c.rlike("^N[0-9]+$"), "Nation")
        .when(c.rlike("^R[0-9]+$"), "Region")
        .when(c.rlike("^O[0-9]+$"), "Order")
        .when(c.rlike("^Brand#[0-9]+$"), "Brand")
        .otherwise("Literal")
    )


def induce_schema(triples: DataFrame) -> DataFrame:
    """Schema-graph induction over a raw triple store →
    (subj_type, pred, obj_type, n_triples, n_subj, n_obj).

    The TBox a KG builder reads off freshly-extracted ABox triples:
    every typed relation signature with its support and endpoint
    cardinalities.  A signature with tiny support next to a dominant
    one for the same pred is the classic extraction-noise smell the
    reference's hand-checked CSV step looks for.  One map-side
    combinable groupBy over a narrow typed projection — no joins, the
    type tags are pure regex expressions.
    """
    typed = triples.select(
        entity_type("subj").alias("subj_type"),
        "pred",
        entity_type("obj").alias("obj_type"),
        "subj",
        "obj",
    )
    return typed.groupBy("subj_type", "pred", "obj_type").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )


def validate_shapes(
    triples: DataFrame,
    shapes: list[tuple[str, str, int, int | None]],
) -> DataFrame:
    """SHACL-style cardinality validation → one row per
    (shape_idx, target_type, pred, status) with entity counts:
    status ∈ conforming / violation_min / violation_max.

    ``shapes`` is a list of (target_type, pred, min_count, max_count)
    — sh:targetClass + sh:property/sh:minCount/sh:maxCount, the core
    of the SHACL cardinality profile (W3C SHACL §4.2).  For every
    entity of the target type (drawn from the store's subjects), the
    out-degree on ``pred`` is checked against [min, max]; entities
    with ZERO such triples still participate (the left join), which is
    exactly what makes minCount violations detectable.

    Scale shape: the shape list is a broadcast literal frame; degrees
    are one map-side-combinable groupBy of the pred-filtered store;
    entity universes come from the same store scan.  No windows.
    """
    spark = triples.sparkSession
    shape_rows = [
        (i, t, p, int(mn), (int(mx) if mx is not None else None))
        for i, (t, p, mn, mx) in enumerate(shapes)
    ]
    shape_df = spark.createDataFrame(
        shape_rows,
        "shape_idx int, target_type string, pred string,"
        " min_count int, max_count int",
    )
    entities = (
        triples.select(
            F.col("subj").alias("entity"),
            entity_type("subj").alias("target_type"),
        )
        .filter(F.col("target_type") != "Literal")
        .distinct()
    )
    degrees = triples.groupBy(
        F.col("subj").alias("entity"), "pred"
    ).agg(F.count("*").cast("long").alias("deg"))
    checked = (
        entities.join(F.broadcast(shape_df), "target_type")
        .join(degrees, ["entity", "pred"], "left")
        .withColumn("deg", F.coalesce("deg", F.lit(0).cast("long")))
        .withColumn(
            "status",
            F.when(F.col("deg") < F.col("min_count"), "violation_min")
            .when(
                F.col("max_count").isNotNull()
                & (F.col("deg") > F.col("max_count")),
                "violation_max",
            )
            .otherwise("conforming"),
        )
    )
    return checked.groupBy(
        "shape_idx", "target_type", "pred", "status"
    ).agg(
        F.count("*").cast("long").alias("n_entities"),
        F.sum("deg").cast("long").alias("n_triples"),
    )


def infer_types(
    triples: DataFrame,
    ontology: list[tuple[str, str | None, str | None]],
) -> DataFrame:
    """RDFS domain/range type inference (rdfs2/rdfs3 entailment) →
    (entity, inferred_type, n_evidence, n_preds).

    ``ontology`` maps each predicate to (rdfs:domain, rdfs:range):
    every triple (s, P, o) with P's domain D entails (s, rdf:type, D);
    with range R it entails (o, rdf:type, R) — the first inference
    pass a KG runs after extraction, materialized with evidence
    counts (how many triples and distinct predicates support each
    typing).  The ontology is a broadcast literal; the entailment is
    two projections of one store scan unioned and rolled up —
    map-side combinable, no windows.
    """
    spark = triples.sparkSession
    ont = spark.createDataFrame(
        [(p, d, r) for p, d, r in ontology],
        "pred string, domain string, range string",
    )
    with_ont = triples.join(F.broadcast(ont), "pred")
    subj_types = with_ont.filter(F.col("domain").isNotNull()).select(
        F.col("subj").alias("entity"),
        F.col("domain").alias("inferred_type"),
        "pred",
    )
    obj_types = with_ont.filter(F.col("range").isNotNull()).select(
        F.col("obj").alias("entity"),
        F.col("range").alias("inferred_type"),
        "pred",
    )
    return (
        subj_types.unionByName(obj_types)
        .groupBy("entity", "inferred_type")
        .agg(
            F.count("*").cast("long").alias("n_evidence"),
            F.countDistinct("pred").cast("long").alias("n_preds"),
        )
    )


def referential_integrity(
    triples: DataFrame,
    defining_preds: dict[str, str],
) -> DataFrame:
    """Object-side referential-closure audit of a triple store →
    (pred, obj_type, n_refs, n_entities, n_dangling_entities,
    n_dangling_refs).

    ``defining_preds`` maps an entity type to the predicate whose
    SUBJECT position defines entities of that type (its "primary
    table": Customer ← IN_NATION, Order ← PLACED_BY, …).  Every typed
    object reference is then checked for a defining subject row — the
    KG analogue of a foreign-key sweep, catching extraction that emits
    edges to entities no stage ever materialized (the q175 shape pass
    checks the SUBJECT side; this is its inverse).  Dangling counts are
    per (pred, obj_type): distinct dangling entities AND raw dangling
    reference rows.

    Plan: one distinct defined-entity frame per type (union'd, still
    bounded by the entity universe), one left anti-ish join realized as
    left join + null flag so both covered and dangling tally in a
    single groupBy.
    """
    spark = triples.sparkSession
    type_pred = spark.createDataFrame(
        list(defining_preds.items()), "obj_type string, def_pred string"
    )
    defined = (
        triples.select("pred", F.col("subj").alias("entity"))
        .join(
            F.broadcast(
                type_pred.select(
                    F.col("def_pred").alias("pred"), "obj_type"
                )
            ),
            "pred",
        )
        .select("obj_type", "entity")
        .distinct()
    )
    refs = triples.select(
        "pred",
        F.col("obj").alias("entity"),
        entity_type("obj").alias("obj_type"),
    ).join(F.broadcast(type_pred.select("obj_type")), "obj_type")
    flagged = refs.join(
        defined.withColumn("_defined", F.lit(True)),
        ["obj_type", "entity"],
        "left",
    ).withColumn("_dangling", F.col("_defined").isNull())
    return flagged.groupBy("pred", "obj_type").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.countDistinct("entity").cast("long").alias("n_entities"),
        F.countDistinct(
            F.when(F.col("_dangling"), F.col("entity"))
        )
        .cast("long")
        .alias("n_dangling_entities"),
        F.sum(F.col("_dangling").cast("long"))
        .cast("long")
        .alias("n_dangling_refs"),
    )


def bgp_construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    optimize: bool = False,
) -> DataFrame:
    """SPARQL CONSTRUCT / single Datalog rule application → the
    DISTINCT set of new (subj, pred, obj) triples produced by
    instantiating ``template`` for every BGP binding.

    The forward-chaining step of KG enrichment (q111 MINES such rules;
    this MATERIALIZES one): each template term is a variable (``?x``,
    substituted from the binding) or a constant (copied through); the
    result is a triple frame union-able straight back into the store.
    CONSTRUCT's set semantics (a graph, not a bag) is the final
    ``distinct`` — one map-side-combinable dedup on the emitted
    triple, after a pure projection of the match output.
    """
    bound = bgp_match(triples, patterns, optimize=optimize)

    def term(t):
        if t.startswith("?"):
            var = t[1:]
            if var not in bound.columns:
                raise ValueError(
                    f"CONSTRUCT template variable ?{var} is not bound"
                )
            return F.col(var)
        return F.lit(t)

    frames = [
        bound.select(
            term(s).alias("subj"), term(p).alias("pred"), term(o).alias("obj")
        )
        for s, p, o in template
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def describe_entities(
    triples: DataFrame,
    max_objs: int = 5,
) -> DataFrame:
    """SPARQL DESCRIBE-style entity profiles → one row per
    (subj, pred): (subj, pred, n_objs, objs_preview).

    The materialized star view an explorer renders for an entity page
    (the reference's explorer.html fetches exactly this shape from its
    report CSVs, one hand-written query per panel): every predicate's
    fan-out with a deterministic bounded preview — the
    lexicographically-first ``max_objs`` objects, ';'-joined.
    ``sort_array(collect_set(...))`` is bounded per (subj, pred) by the
    schema's fan-out, NOT by corpus size, and the q110 cardinality
    profile is the guard that tells you which predicates are safe to
    preview (never materialize a preview for a pred whose max fan-out
    is unbounded — slice AFTER sort keeps the row small but the
    collect itself is the cost).  One map-side-combinable groupBy.
    """
    return triples.groupBy("subj", "pred").agg(
        F.countDistinct("obj").cast("long").alias("n_objs"),
        F.array_join(
            F.slice(
                F.sort_array(F.collect_set("obj")), 1, max_objs
            ),
            ";",
        ).alias("objs_preview"),
    )


def _path_closure(pairs: DataFrame, max_iters: int) -> DataFrame:
    """Transitive closure of an edge frame (a, b) by POINTER DOUBLING:
    R_1 = E, R_{2k} = R_k ∪ R_k∘R_k — after i rounds every path of
    length ≤ 2^i is covered, so the loop runs O(log diameter) joins,
    not O(diameter) (the reference explorer's client-side hop loop and
    a naive semi-naive evaluation are both linear in depth).  Each
    round is one hash equi-join + distinct, localCheckpoint (lineage
    cut), one scalar count for the fixpoint test."""
    # ONE action per round (r6): the fixpoint count also materializes the
    # lazy checkpoint, halving the loop's Spark job count.
    cur = pairs.distinct().localCheckpoint(eager=False)
    n = cur.count()
    for _ in range(max_iters):
        left = cur.select(F.col("a"), F.col("b").alias("_mid"))
        right = cur.select(F.col("a").alias("_mid"), F.col("b"))
        hop = left.join(right, "_mid").select("a", "b")
        nxt = cur.unionByName(hop).distinct().localCheckpoint(eager=False)
        m = nxt.count()
        if m == n:
            break
        cur, n = nxt, m
    return cur


def property_path_pairs(
    triples: DataFrame,
    path: str,
    max_iters: int = 30,
) -> DataFrame:
    """SPARQL 1.1 §9 property-path evaluation over a (subj, pred, obj)
    store → DISTINCT (subj, obj) — the piece of the SPARQL core left
    open after BGP/OPTIONAL/VALUES/FILTER/CONSTRUCT/DESCRIBE
    (triples.py history; reference explorer walks hierarchies with
    client-side hop loops, build_reports.py one lookup per level).

    Grammar (the W3C §9.1 operators minus grouping):

        path  :=  seq ('|' seq)*          alternation  — set union
        seq   :=  step ('/' step)*        sequence     — relation compose
        step  :=  ['^'] pred ['+' | '*']  inverse / closures

    Per the spec's arbitrary-length semantics, ``p+`` / ``p*`` are
    REACHABILITY (no duplicate solutions, W3C 1.1 §9.3 note on cyclic
    graphs), evaluated here by :func:`_path_closure`'s pointer
    doubling; ``p*`` adds the zero-length pairs (x, x) for EVERY term
    of the graph (subjects ∪ objects — the spec's nodes(G), not just
    p-incident terms).  Alternation is a distinct union; sequence is a
    hash equi-join composing the step relations left to right.

    Scale: each step relation is one predicate-pruned scan (partition
    pruning when the store is partitioned by pred); closures emit at
    most |reachable pairs| rows — quadratic in component size in the
    worst case, which is the OUTPUT's size, not overhead (callers at
    corpus scale bound the source set first, the standard reachability
    contract).
    """
    alts = [seq.strip() for seq in path.split("|") if seq.strip()]
    if not alts:
        raise ValueError("empty property path")
    out = None
    for seq in alts:
        seq_rel = None
        for raw in (s.strip() for s in seq.split("/")):
            inverse = raw.startswith("^")
            if inverse:
                raw = raw[1:]
            mod = None
            if raw and raw[-1] in "+*":
                mod = raw[-1]
                raw = raw[:-1]
            if not raw:
                raise ValueError(f"bad step in path: {seq!r}")
            step = triples.filter(F.col("pred") == raw).select(
                F.col("obj" if inverse else "subj").alias("a"),
                F.col("subj" if inverse else "obj").alias("b"),
            )
            if mod is not None:
                step = _path_closure(step, max_iters)
            if mod == "*":
                nodes = (
                    triples.select(F.col("subj").alias("a"))
                    .unionAll(triples.select(F.col("obj").alias("a")))
                    .distinct()
                )
                step = step.unionByName(
                    nodes.select("a", F.col("a").alias("b"))
                ).distinct()
            if seq_rel is None:
                seq_rel = step
            else:
                seq_rel = (
                    seq_rel.select("a", F.col("b").alias("_mid"))
                    .join(
                        step.select(
                            F.col("a").alias("_mid"), F.col("b")
                        ),
                        "_mid",
                    )
                    .select("a", "b")
                )
        out = seq_rel if out is None else out.unionByName(seq_rel)
    return out.distinct().select(
        F.col("a").alias("subj"), F.col("b").alias("obj")
    )


def bgp_aggregate(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_vars: list[str],
    aggs: list[tuple[str, str | None, str]],
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL 1.1 §11 aggregation (GROUP BY + COUNT / SUM / MIN / MAX /
    COUNT DISTINCT) over basic-graph-pattern solution bindings — the
    thin declarative layer over :func:`bgp_match` that replaces the
    reference explorer's fetch-all-then-count client loops
    (build_reports.py tallies per-entity rows in Python after one
    lookup per conjunction).

    ``aggs`` is a list of (fn, var, alias): fn ∈ {"count",
    "count_distinct", "sum", "min", "max"}; var None means COUNT(*)
    (SPARQL's COUNT(*) counts solutions, bag semantics — exactly the
    binding rows bgp_match emits).  ``sum`` try_casts the variable to
    long (the store keeps literals as strings; non-numeric values
    become NULL and drop out of the sum, mirroring SPARQL's
    error-ignoring aggregate semantics over mistyped literals — ANSI
    cast would instead fail the job on the first bad literal).

    One hash aggregate over the BGP join tree — partial map-side
    combine, no window; Catalyst pushes the grouping through the
    binding projection, and every optimization bgp_match makes
    (statistics-driven join order, broadcast VALUES) composes freely.
    """
    bindings = bgp_match(triples, patterns, **bgp_kwargs)
    exprs = []
    for fn, var, alias in aggs:
        if fn == "count":
            e = F.count("*") if var is None else F.count(var)
        elif fn == "count_distinct":
            e = F.countDistinct(var)
        elif fn == "sum":
            e = F.sum(F.col(var).try_cast("long"))
        elif fn == "min":
            e = F.min(var)
        elif fn == "max":
            e = F.max(var)
        else:
            raise ValueError(f"unsupported aggregate: {fn}")
        exprs.append(e.cast("long").alias(alias) if fn in (
            "count", "count_distinct", "sum"
        ) else e.alias(alias))
    return bindings.groupBy(*group_vars).agg(*exprs)
