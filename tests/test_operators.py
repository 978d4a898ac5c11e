"""Operator correctness tests (local Spark, deterministic inputs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from convei_abstract_relational_knowledge_explorer_spark.operators import (
    analytics,
    components,
    dedup,
    similarity,
    text_analysis,
)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (8, 9), (9, 10), (10, 8)],
        "src long, dst long",
    )
    got = {
        (r["node"], r["component"])
        for r in components.connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (5, 5), (6, 5),
        (8, 8), (9, 8), (10, 8),
    }


def test_connected_components_long_chain(spark):
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = components.connected_components(edges).collect()
    assert all(r["component"] == 0 for r in got)
    assert {r["node"] for r in got} == set(range(0, n + 1))


def test_components_with_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    got = {
        (r["node"], r["component"])
        for r in components.components_with_singletons(nodes, edges).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 2), (3, 2), (4, 4), (5, 5)}


# ---------------------------------------------------------------------------
# co-occurrence / year vectors / top-k
# ---------------------------------------------------------------------------


def test_cooccurrence_upper_triangular(spark):
    edges = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"), (3, "a")],
        "doc_id long, obj string",
    )
    got = {
        (r["ea"], r["eb"]): r["n_docs"]
        for r in analytics.cooccurrence_pairs(edges).collect()
    }
    assert got == {
        ("a", "a"): 3,
        ("a", "b"): 2,
        ("a", "c"): 1,
        ("b", "b"): 2,
        ("b", "c"): 1,
        ("c", "c"): 1,
    }


def test_year_vectors_power_normalize(spark):
    rows = [
        (1, 2020, "x", 1.0),
        (1, 2020, "y", 1.0),
        (2, 2020, "x", -0.5),  # all-clipped doc contributes zeros
        (3, 2021, "y", 2.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, year int, entity string, weight double")
    got = {
        (r["year"], r["entity"]): r["weight"]
        for r in analytics.year_entity_vectors(df).collect()
    }
    assert got[(2020, "x")] == pytest.approx(0.5)
    assert got[(2020, "y")] == pytest.approx(0.5)
    assert got[(2021, "y")] == pytest.approx(1.0)
    # doc 2: clipped to zero -> contributes 0 (reference zero-vector case)
    assert sum(v for (y, _), v in got.items() if y == 2020) == pytest.approx(1.0)


def test_top_k_per_group(spark):
    rows = [("g1", "a", 3.0), ("g1", "b", 2.0), ("g1", "c", 1.0), ("g2", "d", 9.0)]
    df = spark.createDataFrame(rows, "grp string, item string, score double")
    got = analytics.top_k_per_group(df, ["grp"], "score", 2, "item").collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append((r["rank"], r["item"]))
    assert sorted(by_grp["g1"]) == [(1, "a"), (2, "b")]
    assert sorted(by_grp["g2"]) == [(1, "d")]


def test_copublishing_outer_product_identity(spark):
    # doc 1: authors u (x:1), v (x:1, y:2)
    rows = [
        (1, "u", "x", 1.0),
        (1, "v", "x", 1.0),
        (1, "v", "y", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, author string, entity string, weight double"
    )
    got = {
        (r["ea"], r["eb"]): r["weight"]
        for r in analytics.copublishing_matrix(df).collect()
    }
    # S = [x:2, y:2]; SSt = [[4,4],[4,4]]; sum vvt = u:[[1,0],[0,0]] +
    # v:[[1,2],[2,4]] => M = [[2,2],[2,0]]
    assert got[("x", "x")] == pytest.approx(2.0)
    assert got[("x", "y")] == pytest.approx(2.0)
    assert got[("y", "x")] == pytest.approx(2.0)
    assert got[("y", "y")] == pytest.approx(0.0)


def test_cumulative_by_year(spark):
    df = spark.createDataFrame(
        [(2019, 5), (2020, 3), (2021, 2)], "year int, n int"
    )
    got = {r["year"]: r["cumulative"] for r in analytics.cumulative_by_year(df).collect()}
    assert got == {2019: 5, 2020: 8, 2021: 10}


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_duplicates(spark):
    docs = _doc_df(
        spark,
        ["Hello World!", "hello,   world", "different text", "HELLO WORLD"],
    )
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["keeper"] == 0 and got[0]["n_docs"] == 3
    assert "members" not in got[0].asDict()  # scale default: no group arrays
    # debug shape keeps the sorted member array (small groups only)
    dbg = dedup.exact_duplicates(docs, with_members=True).collect()
    assert dbg[0]["members"] == [0, 1, 3]
    # the scale default's PLAN must not contain a collect_list either
    plan = dedup.exact_duplicates(docs)._jdf.queryExecution().toString()
    assert "collect_list" not in plan


def test_exact_duplicate_losers_mega_group(spark):
    """r03 VERDICT #1: one fingerprint owning 50% of the corpus (the C4
    boilerplate-cluster regime) — loser derivation must be join-based and
    agree with the debug members shape, with NO array materialization."""
    n = 2000
    texts = ["boilerplate cookie banner page" for _ in range(n // 2)] + [
        f"unique document number {i} with its own words" for i in range(n // 2)
    ]
    docs = _doc_df(spark, texts)
    losers = {r["doc_id"] for r in dedup.exact_duplicate_losers(docs).collect()}
    assert losers == set(range(1, n // 2))  # keeper = min id of the mega group
    plan = dedup.exact_duplicate_losers(docs)._jdf.queryExecution().toString()
    assert "collect_list" not in plan and "sort_array" not in plan
    # curation capstone consumes the join form: survivors = keeper + uniques
    survivors = docs.join(
        dedup.exact_duplicate_losers(docs), "doc_id", "left_anti"
    )
    assert survivors.count() == n // 2 + 1


def test_minhash_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated content about spark dataframes and shuffles"
    docs = _doc_df(spark, [base, near, far])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_simhash_near_duplicates(spark):
    base = " ".join(f"token{i}" for i in range(60))
    near = base.replace("token5 ", "token5x ")
    far = " ".join(f"other{i}" for i in range(60))
    docs = _doc_df(spark, [base, near, far])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_duplicates(docs, max_hamming=6).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_embedding_near_duplicates(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_duplicates(df, threshold=0.99).collect()
    }
    assert got == {(0, 1)}


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def test_brute_force_top_k(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    got = similarity.brute_force_top_k(emb, q, k=2).collect()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == [0, 1]


def test_ivf_recall_vs_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, rows[17][1])], "query_id long, embedding array<float>"
    )
    exact = {r["vec_id"] for r in similarity.brute_force_top_k(emb, q, k=5).collect()}
    approx = {
        r["vec_id"]
        for r in similarity.ivf_top_k(emb, q, k=5, n_cells=8, n_probe=4).collect()
    }
    assert 17 in approx  # the identical vector must be found
    assert len(exact & approx) >= 2  # reasonable recall on a tiny set


def test_two_level_quantizer_recall(spark):
    """r03 next-round #5: the hierarchical quantizer must keep recall on
    a clustered fixture while bounding assignment work — and the flat
    path (the oracle-checked default) must be untouched."""
    import random

    rng = random.Random(11)
    # 6 well-separated gaussian clusters of 40 vectors each (c starts at
    # 1: a zero-vector center would make its cluster pure noise after
    # normalization, with arbitrary cosines)
    centers = [[10.0 * ((c >> j) & 1) for j in range(4)] for c in range(1, 7)]
    rows = [
        (c * 40 + i,
         [x + rng.gauss(0, 0.3) for x in centers[c]])
        for c in range(6)
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, rows[85][1])], "query_id long, embedding array<float>"
    )
    exact = {r["vec_id"] for r in similarity.brute_force_top_k(emb, q, k=5).collect()}
    two = {
        r["vec_id"]
        for r in similarity.ivf_top_k(
            emb, q, k=5, n_cells=16, n_probe=4, quantizer="two_level"
        ).collect()
    }
    assert 85 in two  # the identical vector must be found
    assert len(exact & two) >= 3  # clustered data: high overlap survives

    # knn_graph under the two-level quantizer: valid edge list, and the
    # edges stay within the separated clusters (no garbage routing)
    edges = similarity.knn_graph(
        emb, k=3, n_cells=16, quantizer="two_level"
    ).collect()
    assert len(edges) > 0
    assert all(r["src"] < r["dst"] for r in edges)
    strong = [r for r in edges if r["weight"] > 0.99]
    assert len(strong) > 0
    assert all(r["src"] // 40 == r["dst"] // 40 for r in strong)


def test_knn_graph_shape(spark):
    rows = [(i, [float((i >> j) & 1) for j in range(6)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    edges = similarity.knn_graph(emb, k=3, n_cells=4).collect()
    assert len(edges) > 0
    assert all(r["src"] < r["dst"] for r in edges)
    assert all(-1.0001 <= r["weight"] <= 1.0001 for r in edges)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_token_stats_and_quality(spark):
    docs = _doc_df(spark, ["The quick brown fox. It runs!", ""])
    stats = {r["doc_id"]: r for r in text_analysis.token_stats(docs).collect()}
    assert stats[0]["n_tokens"] == 6
    assert stats[1]["n_tokens"] == 0
    q = {r["doc_id"]: r for r in text_analysis.quality_scores(docs).collect()}
    assert 0.0 <= q[0]["quality"] <= 1.0
    assert q[0]["stopword_ratio"] > 0


def test_repetition_scores(spark):
    docs = _doc_df(
        spark,
        [
            "a b a b c",          # top 2-gram "a b" 2/4; one 5-gram, no dup
            "x y x y x y x y",    # "x y" 4/7; both 5-grams duplicated -> 1.0
            "hello",              # too short for any n-gram -> 0.0 / 0.0
        ],
    )
    got = {r["doc_id"]: r for r in text_analysis.repetition_scores(docs).collect()}
    assert got[0]["top2_frac"] == 0.5
    assert got[0]["dup5_frac"] == 0.0
    assert got[1]["top2_frac"] == round(4 / 7, 6)
    assert got[1]["dup5_frac"] == 1.0
    assert got[2]["top2_frac"] == 0.0 and got[2]["dup5_frac"] == 0.0


def test_language_scores(spark):
    docs = _doc_df(
        spark,
        [
            "the cat and the dog went to the park with a ball",
            "der Hund und die Katze sind nicht mit der Maus",
        ],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text_analysis.language_scores(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"


def test_rolling_fingerprints_stable(spark):
    docs = _doc_df(spark, ["alpha beta gamma delta " * 5, "alpha beta gamma delta " * 5])
    got = [r["fingerprint"] for r in text_analysis.rolling_fingerprints(docs).collect()]
    assert got[0] == got[1]


def test_winnow_fingerprints_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD'03): a shared
    token run of length >= window + k - 1 yields >= 1 shared selected
    fingerprint, at ~2/(w+1) density, whatever surrounds it."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    shared = " ".join(rng.choice(vocab) for _ in range(8))  # w+k-1 = 8
    noise = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    docs = _doc_df(spark, [
        noise(40) + " " + shared + " " + noise(40),
        noise(40) + " " + shared + " " + noise(40),
        noise(90),
    ])
    fp = text_analysis.winnow_fingerprints(docs, k=5, window=4)
    rows = fp.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert sets[0] & sets[1], "shared 8-token run must share a fingerprint"
    # density: ~2/(w+1) of grams selected, never more than all windows
    n_grams = 40 + 1 + 8 + 1 + 40 - 4  # tokens - k + 1
    assert len(sets[0]) < n_grams
    # positions are 1-based gram indices within the doc
    assert all(1 <= r["pos"] <= n_grams for r in rows if r["doc_id"] == 0)
    # portable=True selects the same POSITIONS (different hash values)
    fp_p = text_analysis.winnow_fingerprints(docs, k=5, window=4,
                                             portable=True)
    # both hash families are uniform, so selected densities agree loosely
    assert abs(fp_p.count() - fp.count()) < 0.5 * fp.count()


def test_fingerprint_overlap_detects_partial(spark):
    """Two documents sharing one boilerplate paragraph (and nothing else)
    are reported; unrelated docs are not — the partial-overlap case the
    whole-document rolling_fingerprints digest cannot detect."""
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(800)]
    para = " ".join(rng.choice(vocab) for _ in range(60))
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    docs = _doc_df(spark, [
        mk(120) + " " + para + " " + mk(120),
        para + " " + mk(250),
        mk(300),
    ])
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in text_analysis.fingerprint_overlap(
            docs, k=5, window=4, min_shared=3
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 3
    assert all(2 not in pair for pair in got)
    # whole-doc digest misses it: docs 0 and 1 get different min hashes
    digests = {
        r["doc_id"]: r["fingerprint"]
        for r in text_analysis.rolling_fingerprints(docs).collect()
    }
    assert digests[0] != digests[2]


def test_bm25_scores_and_top_k(spark):
    """BM25 hand-check on a 3-doc corpus: rarer term outranks common
    term; saturation (k1) keeps tf growth sublinear; top_k cut is
    deterministic with doc_id tie-break."""
    import math

    from convei_abstract_relational_knowledge_explorer_spark.operators.ranking import (
        bm25_scores,
        bm25_top_k,
    )

    docs = _doc_df(spark, [
        "apple banana apple apple",     # tf(apple)=3, dl=4
        "apple cherry",                 # dl=2
        "banana banana banana banana",  # dl=4
    ])
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, ["apple", "cherry"]).collect()}
    assert set(got) == {0, 1}
    # closed form: N=3, df(apple)=2, df(cherry)=1, avgdl=10/3
    k1, b = 1.2, 0.75

    def bm25(tf, dl, df, n=3, avg=10 / 3):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf / (tf + k1 * (1 - b + b * dl / avg))

    exp0 = bm25(3, 4, 2)
    exp1 = bm25(1, 2, 2) + bm25(1, 2, 1)
    assert got[0] == round(exp0, 6)
    assert got[1] == round(exp1, 6)
    # doc 1 matches a rare term (cherry) -> outscores doc 0's repeats
    assert got[1] > got[0]
    top = bm25_top_k(docs, ["apple", "cherry"], k=1).collect()
    assert [(r["rank"], r["doc_id"]) for r in top] == [(1, 1)]


def test_rrf_fuse_hand_check(spark):
    """RRF hand-check: integer-micro contributions sum exactly; a doc
    in both lists beats a higher single-list rank; n_lists counts the
    contributing rankers; top_k cut is (score DESC, id) deterministic."""
    import pytest as _pytest

    from convei_abstract_relational_knowledge_explorer_spark.operators.ranking import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(12, 1), (13, 2)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["rrf_micro"], r["n_lists"])
        for r in rrf_fuse([lex, sem], top_k=None).collect()
    }
    # doc 12: 1000000//63 + 1000000//61 = 15873 + 16393
    assert got[12] == (15873 + 16393, 2)
    assert got[10] == (1000000 // 61, 1)
    assert got[13] == (1000000 // 62, 1)
    # both-list doc 12 outranks the rank-1 single-list doc 10
    assert got[12][0] > got[10][0]
    top = rrf_fuse([lex, sem], top_k=2).collect()
    assert [r["doc_id"] for r in top] == [12, 10]
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_dedup_topics_within_doc(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.topics import (
        dedup_topics_within_doc,
    )

    rows = [
        (1, "land cover change", 5.0),
        (1, "cover change land", 4.0),   # permutation -> token_set 100, same len, dropped
        (1, "land cover", 3.0),           # subset -> 100, SHORTER: replaces keeper
        (1, "soil moisture", 2.0),
        (2, "urban heat island", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, topic string, score double")
    got = {(r["doc_id"], r["topic"]) for r in dedup_topics_within_doc(df).collect()}
    assert (1, "cover change land") not in got
    assert (1, "land cover") in got          # shorter form won
    assert (1, "land cover change") not in got
    assert (1, "soil moisture") in got
    assert (2, "urban heat island") in got


def test_sample_seeded_reproducible(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in sampling.sample_seeded(df, n=50, seed=7,
                                                           order_col="doc_id").collect())
    b = sorted(r["doc_id"] for r in sampling.sample_seeded(df, n=50, seed=7,
                                                           order_col="doc_id").collect())
    c = sorted(r["doc_id"] for r in sampling.sample_seeded(df, n=50, seed=8,
                                                           order_col="doc_id").collect())
    assert a == b and len(a) == 50
    assert a != c  # different seed, different sample

    frac = sampling.sample_seeded(df, fraction=0.1, seed=7).count()
    assert 100 <= frac <= 320  # Bernoulli around 200


def test_sample_by_hash_deterministic_and_unbiased(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators import sampling

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = sampling.sample_by_hash(df, "doc_id", percent=10)
    s2 = sampling.sample_by_hash(df.repartition(13), "doc_id", percent=10)
    got1 = sorted(r["doc_id"] for r in s1.collect())
    got2 = sorted(r["doc_id"] for r in s2.collect())
    assert got1 == got2  # partitioning-independent
    assert 350 <= len(got1) <= 650  # ~10%


def test_simhash_signature_frontier_exact(spark):
    """The distinct-signature frontier (blocked join over unique simhash
    values + group expansion) must emit each unordered doc pair exactly
    once and match brute-force hamming over per-doc signatures — including
    identical-text groups (hamming 0 intra pairs)."""
    texts = (
        ["alpha beta gamma delta epsilon zeta"] * 3
        + ["alpha beta gamma delta epsilon zet"]
        + ["a completely unrelated document about something else"]
    )
    docs = _doc_df(spark, texts)
    out = dedup.simhash_near_duplicates(docs, max_hamming=10).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in out]
    assert len(pairs) == len(set(pairs))  # exactly-once, no doc-level dup
    zero = {p for p, r in zip(pairs, out) if r["hamming"] == 0}
    assert {(0, 1), (0, 2), (1, 2)} <= zero  # identical-text group kept
    # brute-force ground truth from the per-doc signatures
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs).collect()
    }
    truth = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 10
    }
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in out}
    assert got == truth


def test_simhash_randomized_truth(spark):
    """Seeded random corpus, radii {0, 3, 10} (radius 0 = single 60-bit
    chunk, intra-group-only edge): blocked output == brute-force truth."""
    import random as _random

    rng = _random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for _ in range(40)
    ]
    docs = _doc_df(spark, texts)
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    for radius in (0, 3, 10):
        truth = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= radius
        }
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in dedup.simhash_near_duplicates(
                docs, max_hamming=radius
            ).collect()
        }
        assert got == truth, f"radius={radius}"


def test_simhash_blocking_regimes_identical(spark):
    """Single-chunk (max_hamming+1) and chunk-pair (max_hamming+2)
    pigeonhole blocking must return the IDENTICAL pair set — both are
    exact; they differ only in candidate-generation cost profile."""
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the sleepy dog today",
        "completely different text about spark shuffles and joins",
        "completely different text about spark shuffles and planning",
        "unrelated short snippet",
    ]
    docs = _doc_df(spark, texts)
    single = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_duplicates(
            docs, max_hamming=10, blocking="single"
        ).collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_duplicates(
            docs, max_hamming=10, blocking="pairs"
        ).collect()
    }
    assert single == pairs
    assert len(single) > 0


def test_choose_simhash_blocking_regimes(spark):
    """blocking='auto' (r03 next-round #6): duplicate density measured on
    a content-addressed porthash sample picks the regime — dup-saturated
    corpora get 'single', all-unique corpora get 'pairs'."""
    saturated = _doc_df(
        spark, ["same boilerplate page everywhere"] * 40
        + [f"fresh doc {i} words" for i in range(10)]
    )
    sparse = _doc_df(
        spark, [f"entirely unique document number {i} here" for i in range(50)]
    )
    # sample the whole corpus so the tiny fixtures are deterministic
    assert dedup.choose_simhash_blocking(saturated, sample_permille=1000) == "single"
    assert dedup.choose_simhash_blocking(sparse, sample_permille=1000) == "pairs"
    # empty input: default to the safe-at-scale profile
    assert dedup.choose_simhash_blocking(sparse.limit(0), sample_permille=1000) == "pairs"
    # auto wiring end-to-end: same pair set as an explicit regime
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the sleepy dog today",
        "unrelated short snippet",
    ]
    docs = _doc_df(spark, texts)
    auto = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_duplicates(
            docs, max_hamming=10, blocking="auto"
        ).collect()
    }
    explicit = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_duplicates(
            docs, max_hamming=10, blocking="single"
        ).collect()
    }
    assert auto == explicit


def test_simhash_pairs_infeasible_warns(spark):
    """r03 ADVICE (low): requesting blocking='pairs' when max_hamming+2
    chunks don't fit the signature must WARN about the cost-profile
    downgrade, not silently fall back (the result stays exact)."""
    import warnings

    docs = _doc_df(spark, ["alpha beta gamma", "alpha beta gamma delta"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = dedup.simhash_near_duplicates(
            docs, max_hamming=63, blocking="pairs"
        )
        out.collect()
    assert any("falling back" in str(w.message) for w in caught)


def test_dedup_topics_empty_token_set(spark):
    """Topics whose [a-z0-9] token set is EMPTY (non-ASCII phrases) score
    token_set_ratio 100 against anything — the short-circuit must treat
    them as duplicates, not skip them via the disjoint-token bound."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.topics import (
        dedup_topics_within_doc,
    )

    rows = [
        (1, "αβγ", 5.0),
        (1, "δεζ", 4.0),            # empty-vs-empty token sets: 100 -> dropped
        (1, "machine learning", 3.0),  # empty-vs-nonempty: 100 -> dropped too
        (2, "plain topic", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, topic string, score double")
    got = {(r["doc_id"], r["topic"]) for r in dedup_topics_within_doc(df).collect()}
    assert got == {(1, "αβγ"), (2, "plain topic")}


def test_remove_duplicate_lines(spark):
    """C4-style line dedup: one occurrence of each duplicated line kept
    (lowest (doc_id, pos)), within-doc duplicates collapse too, docs whose
    every line was removed keep an empty text."""
    rows = [
        (0, "unique one\nshared line\nunique two"),
        (1, "shared line\nother text"),
        (2, "shared line"),
        (3, "dup\ndup"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in dedup.remove_duplicate_lines(df).collect()}
    assert got == {
        0: "unique one\nshared line\nunique two",
        1: "other text",
        2: "",
        3: "dup",
    }


def test_quantize_embeddings_roundtrip(spark):
    """int8 quantization: max-|x| element maps to ±127, dequantized error
    is bounded by scale/254 per element, all-zero vectors stay zero."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.embedding import (
        quantize_embeddings,
    )

    rows = [(0, [0.5, -1.0, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["vec_id"], r["i"]): r for r in quantize_embeddings(df).collect()}
    assert got[(0, 1)]["qval"] == -127  # the max-|x| element
    assert got[(0, 0)]["qval"] == 64    # floor(0.5*127/1.0 + 0.5) = 64
    assert got[(0, 2)]["qval"] == 32
    assert got[(0, 3)]["qval"] == 0
    assert all(got[(1, i)]["qval"] == 0 for i in range(4))  # zero vector
    s = got[(0, 0)]["scale"]
    assert s == 1.0
    # dequantization error bound
    for i, x in enumerate([0.5, -1.0, 0.25, 0.0]):
        assert abs(got[(0, i)]["qval"] * s / 127.0 - x) <= s / 254 + 1e-9


def test_assign_shards_balanced(spark):
    """global_sort=True (the explicit single-sequence opt-in): shard
    sizes differ by at most one doc, largest docs spread across shards."""
    from convei_abstract_relational_knowledge_explorer_spark.operators import sampling

    rows = [(i, 1000 - i) for i in range(20)]  # sizes strictly decreasing
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    got = {
        r["doc_id"]: r["shard"]
        for r in sampling.assign_shards(
            df, n_shards=8, global_sort=True
        ).collect()
    }
    from collections import Counter

    counts = Counter(got.values())
    assert max(counts.values()) - min(counts.values()) <= 1
    # the 8 largest docs land on 8 distinct shards
    assert {got[i] for i in range(8)} == set(range(8))


def test_assign_shards_bucketed_default(spark):
    """r03 VERDICT #2: the DEFAULT ranks within porthash buckets — no
    single-partition window in the plan, partition-independent output,
    and shard byte totals still balanced (rotated stripe start kills the
    every-bucket's-largest-goes-to-shard-0 bias)."""
    from collections import Counter

    from convei_abstract_relational_knowledge_explorer_spark.operators import sampling

    n = 2000
    rows = [(i, 1000 + ((i * 37) % 2000)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = sampling.assign_shards(df, n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # the 100x-scale guarantee
    # the opt-in global form IS a single-partition window (labeled cost)
    gplan = (
        sampling.assign_shards(df, n_shards=8, global_sort=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in gplan

    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    assert set(got) == set(range(n)) and set(got.values()) <= set(range(8))
    # partition-independence: same assignment from any input layout
    regot = {
        r["doc_id"]: r["shard"]
        for r in sampling.assign_shards(df.repartition(13), n_shards=8).collect()
    }
    assert regot == got
    # balance: doc counts and byte totals within a few percent of even
    sizes = dict(rows)
    counts = Counter(got.values())
    byte_tot = Counter()
    for d, s in got.items():
        byte_tot[s] += sizes[d]
    assert len(counts) == 8
    assert max(counts.values()) / min(counts.values()) < 1.2
    assert max(byte_tot.values()) / min(byte_tot.values()) < 1.2


def test_q26_oracle_tie_margins(spark):
    """r03 ADVICE (low): q26's hash-exact oracle parity rests on Spark's
    sequential-fold cosine agreeing with DuckDB's list_cosine_similarity
    at every DECISION point.  This pins the claim to measured margins on
    the actual sf0.01 fixture: every rank boundary (probe-cell 2|3, kNN
    5|6) and the 0.2 weight threshold clears a 1e-9 gap — or is an EXACT
    tie (same double), which both engines break identically by id.  A
    last-ulp cross-engine difference therefore cannot flip the result."""
    import os

    from pyspark.sql.window import Window as W

    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        porthash64,
    )
    from convei_abstract_relational_knowledge_explorer_spark.operators.similarity import (
        _dot,
        _normed,
        adaptive_cells,
        ivf_assign,
    )

    sfdir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    emb = spark.read.parquet(f"{sfdir}/embeddings.parquet")
    vecs = _normed(emb, "vec_id", "embedding", "vec_id")
    n_cells = adaptive_cells(vecs.count())

    # (a) probe-cell assignment boundary: gap between the 2nd and 3rd
    # closest centroids per vector (q26 probes n_probe=2 cells)
    h = porthash64(F.col("vec_id").cast("string"))
    seeds = (
        vecs.withColumn("h", h)
        .orderBy("h")
        .limit(n_cells)
        .select(
            F.row_number().over(W.orderBy("h")).alias("cell"),
            F.col("vec").alias("cvec"),
            F.col("norm").alias("cnorm"),
        )
    )
    csim = vecs.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "cell",
        (_dot(F.col("vec"), F.col("cvec")) / (F.col("norm") * F.col("cnorm"))).alias("sim"),
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    ranked = csim.withColumn("r", F.row_number().over(wv)).filter(F.col("r") <= 3)
    gap23 = (
        ranked.groupBy("vec_id")
        .agg(
            (
                F.max(F.when(F.col("r") == 2, F.col("sim")))
                - F.max(F.when(F.col("r") == 3, F.col("sim")))
            ).alias("gap")
        )
        .agg(F.min("gap"))
        .collect()[0][0]
    )
    assert gap23 is not None and (gap23 == 0.0 or gap23 > 1e-9)

    # (b) directed kNN rank-5|6 boundary and (c) 0.2 threshold margin,
    # over the exact candidate set q26's plan scores
    _, assign = ivf_assign(emb, n_cells, n_probe=2, hash_fn="md5")
    idx = vecs.join(assign.filter(F.col("r") == 1).select("vec_id", "cell"), "vec_id")
    probe = vecs.join(assign.select("vec_id", "cell"), "vec_id")
    a, b = probe.alias("a"), idx.alias("b")
    cand = (
        a.join(b, "cell")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            (
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    thr_margin = (
        cand.agg(F.min(F.abs(F.col("weight") - F.lit(0.2)))).collect()[0][0]
    )
    assert thr_margin > 1e-9

    wk = W.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    kranked = cand.withColumn("r", F.row_number().over(wk)).filter(
        F.col("r").isin(5, 6)
    )
    gap56 = (
        kranked.groupBy("src")
        .agg(
            (
                F.max(F.when(F.col("r") == 5, F.col("weight")))
                - F.max(F.when(F.col("r") == 6, F.col("weight")))
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull())  # srcs with <6 candidates: no boundary
        .agg(F.min("gap"))
        .collect()[0][0]
    )
    assert gap56 is None or gap56 == 0.0 or gap56 > 1e-9


def test_canonicalize_url_cases(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        canonicalize_url,
    )

    cases = [
        # messy → canonical
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&z=1&a=2#frag",
         "https://ex.com/a/b?a=2&z=1"),
        ("http://EX.com:80/", "http://ex.com/"),
        ("http://ex.com", "http://ex.com/"),
        ("https://ex.com/path?fbclid=abc&gclid=d&ref=e",
         "https://ex.com/path"),
        ("https://ex.com/p//?b=2&a=1", "https://ex.com/p?a=1&b=2"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port kept
        ("https://ex.com/#only-frag", "https://ex.com/"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    ).select("i", canonicalize_url("url").alias("c"))
    got = {r["i"]: r["c"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_benchmark_contamination_run_length(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        benchmark_contamination,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            # verbatim 8-token run from the benchmark → flagged
            (1, "xx yy " + " ".join(bench_text.split()[:8]) + " zz"),
            # only a 7-token run → NOT flagged at n=8
            (2, "xx " + " ".join(bench_text.split()[:7]) + " qq rr"),
            # no overlap
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["n_bench_hits"])
        for r in benchmark_contamination(docs, bench, n=8).collect()
    }
    assert out == {1: (1, 1)}


def test_pagerank_matches_float_reference(spark):
    import numpy as np
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        pagerank,
    )

    # small directed graph WITH a dangling node (4 has no out-edges) and
    # weighted edges
    edges = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1), (3, 4, 1), (2, 4, 4)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight_col="weight", iterations=20).collect()
    }

    # float reference with the SAME integer quantization semantics relaxed
    # to exact rationals: r' = 0.15 + 0.85*(recv + D/n)
    nodes = [1, 2, 3, 4]
    outw = {1: 4, 2: 6, 3: 2}
    r = {u: 1.0 for u in nodes}
    for _ in range(200):
        recv = {u: 0.0 for u in nodes}
        for (u, v, w) in edges:
            recv[v] += r[u] * w / outw[u]
        d = r[4] / len(nodes)
        r = {u: 0.15 + 0.85 * (recv[u] + d) for u in nodes}
    for u in nodes:
        # integer quantization error ≤ a few ulp of 1e-9 per round
        assert abs(got[u] / 1e9 - r[u]) < 1e-5, (u, got[u], r[u])
    # total mass conserved up to quantization (sum r = n)
    assert abs(sum(got.values()) / 1e9 - len(nodes)) < 1e-4


def test_pagerank_partition_invariant(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        pagerank,
    )

    edges = [(i, (i * 7) % 23, 1 + i % 5) for i in range(100)]
    df1 = spark.createDataFrame(edges, "src long, dst long, weight long")
    df2 = df1.repartition(13)
    a = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(df1, weight_col="weight", iterations=5).collect()
    )
    b = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(df2, weight_col="weight", iterations=5).collect()
    )
    assert a == b


def test_asof_join_semantics(spark):
    from datetime import datetime
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        asof_join,
    )

    T = datetime
    left = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 1, 10, 0), 1.0),   # after two views → latest
            (2, 10, T(2024, 1, 1, 8, 30), 2.0),   # between views → first view
            (3, 10, T(2024, 1, 1, 7, 0), 3.0),    # before any view → NULL
            (4, 20, T(2024, 1, 1, 9, 0), 4.0),    # tie ts with view → sees it
            (5, 30, T(2024, 1, 1, 9, 0), 5.0),    # user with no views → NULL
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (10, T(2024, 1, 1, 8, 0), 100.0),
            (10, T(2024, 1, 1, 9, 0), 200.0),
            (20, T(2024, 1, 1, 9, 0), 300.0),
            (20, T(2024, 1, 1, 9, 0), 250.0),     # (user,ts) dup → max wins
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, key="user_id", ts="ts",
                           payload="value").collect()
    }
    assert out == {1: 200.0, 2: 100.0, 3: None, 4: 300.0, 5: None}


def test_triangle_stats_known_graph(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        triangle_stats,
    )

    # K4 on {1,2,3,4} plus a pendant 5-1: K4 has 4 triangles (3 per node);
    # node 1 has deg 4 → 6 wedges; node 5 has deg 1 → 0 wedges, 0 triangles
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["n_triangles"], r["n_wedges"])
        for r in triangle_stats(df).collect()
    }
    assert got == {
        1: (3, 6), 2: (3, 3), 3: (3, 3), 4: (3, 3), 5: (0, 0),
    }


def test_bfs_distances_chain_graph(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        bfs_distances,
    )

    # chain 1-2-3-4-5 plus isolated edge 10-11; seeds {1, 10}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (10,)], "node long")
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in bfs_distances(e, seeds, max_depth=3).collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3,  # 5 beyond max_depth
        (10, 10): 0, (10, 11): 1,
    }


def test_k_core_cascades(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        k_core,
    )

    # K4 {1,2,3,4} plus a chain 4-5-6: k=2 must peel 6 first, then 5
    # (cascade), leaving exactly the K4
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"] for r in k_core(df, k=2).collect()}
    assert got == {1, 2, 3, 4}
    # k=5: nothing survives
    assert k_core(df, k=5).count() == 0

# ---------------------------------------------------------------------------
# symmetric-deletion edit-distance join
# ---------------------------------------------------------------------------


def test_edit_distance_pairs_known_surfaces(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark"),
            (2, "spork"),
            (3, "spark plug"),
            (4, "sparks"),
            (5, "park"),
            (6, "zzz"),
            (7, "spark"),  # duplicate surface → multiplicity, never a pair
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["surface_a"], r["surface_b"], r["dist"], r["n_docs_a"],
         r["n_docs_b"])
        for r in dedup.edit_distance_pairs(docs).collect()
    }
    assert rows == {
        ("park", "spark", 1, 1, 2),     # deletion
        ("spark", "sparks", 1, 2, 1),   # insertion
        ("spark", "spork", 1, 2, 1),    # substitution
    }


def test_edit_distance_pairs_matches_brute_force(spark):
    """Exactness guarantee: the deletion-variant equi-join finds EVERY
    pair within Levenshtein distance 1 — compared against the O(n²)
    definition on a seeded random corpus."""
    import itertools
    import random

    rng = random.Random(49)
    alphabet = "abc"
    surfaces = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(80)
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(surfaces), 2)
        if lev(a, b) <= 1
    }
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sorted(surfaces))],
        "doc_id long, text string",
    )
    got = {
        (r["surface_a"], r["surface_b"])
        for r in dedup.edit_distance_pairs(docs).collect()
    }
    assert got == want and len(want) > 0


def test_edit_distance_pairs_rejects_deeper_radius(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.edit_distance_pairs(docs, max_edits=2)


# ---------------------------------------------------------------------------
# cross-document exact-substring repetition profile
# ---------------------------------------------------------------------------


def test_repeated_substring_stats_known_windows(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y z x y z x y"),  # 6 windows at n=3, all repeated
            (2, "x y z q q q"),      # shares "x y z" with doc 1
            (3, "a b"),              # shorter than n → emits nothing
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_repeated"], r["n_cross_doc"])
        for r in dedup.repeated_substring_stats(docs, n=3).collect()
    }
    assert got == {1: (6, 6, 2), 2: (4, 1, 1)}


def test_repeated_substring_stats_portable_parity(spark):
    """The md5 porthash family and the xxhash64 default count the same
    windows — the hash is an implementation detail, not a semantic."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} a b c d e f g h w{i % 2}") for i in range(12)],
        "doc_id long, text string",
    )
    fast = {
        tuple(r) for r in dedup.repeated_substring_stats(docs, n=4).collect()
    }
    portable = {
        tuple(r)
        for r in dedup.repeated_substring_stats(
            docs, n=4, portable=True
        ).collect()
    }
    assert fast == portable and len(fast) == 12

# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------


def test_pii_detect_and_redact(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.pii import (
        detect_pii,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org or x@y.io now"),
            (2, "server at 192.168.001.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 or 555.987.6543"),
            (4, "clean text with no pii at all"),
            # no \b between 'v' and '1' → version strings are NOT IPs
            (5, "v1.2.3.4 release"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in detect_pii(docs).collect()
    }
    assert got == {
        1: (2, 0, 0),
        2: (0, 2, 0),
        3: (0, 0, 2),
        4: (0, 0, 0),
        5: (0, 0, 0),
    }
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert red[1] == "mail <EMAIL> or <EMAIL> now"
    assert red[2] == "server at <IP> and <IP> up"
    assert red[3] == "call <PHONE> or <PHONE>"
    assert red[4] == "clean text with no pii at all"


def test_pii_order_no_double_count(spark):
    """A dotted quad is consumed by the IP pass and must NOT also count
    as a phone; an email's digits must not leak into later patterns."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.pii import (
        detect_pii,
    )

    docs = spark.createDataFrame(
        [(1, "u123.456@h.co then 123.456.7.8 then 123.456.7890")],
        "doc_id long, text string",
    )
    r = detect_pii(docs).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_documents_placement_invariants(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.packing import (
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(3 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    rows = pack_documents(docs, block_tokens=10).collect()
    assert len(rows) == 40
    # placements tile the concatenated token stream exactly: sort by
    # (start_block, start_offset) and check contiguity from zero
    placed = sorted(
        (r["start_block"] * 10 + r["start_offset"], r["n_tokens"],
         r["end_block"])
        for r in rows
    )
    cursor = 0
    for start, n, end_block in placed:
        assert start == cursor
        assert end_block == (start + n - 1) // 10
        cursor += n
    assert cursor == sum(3 + i % 7 for i in range(40))


def test_pack_documents_partition_invariant(spark):
    """The two-phase prefix sum must give the same placement regardless
    of input partitioning (the property that makes it cluster-safe)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.packing import (
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, " ".join("tok" for _ in range(1 + i % 5))) for i in range(60)],
        "doc_id long, text string",
    )
    one = {tuple(r) for r in pack_documents(docs.coalesce(1)).collect()}
    many = {tuple(r) for r in pack_documents(docs.repartition(16)).collect()}
    assert one == many


def test_pack_documents_drops_empty(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.packing import (
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in pack_documents(docs, block_tokens=2).collect()}
    assert got == {1}
    with pytest.raises(ValueError):
        pack_documents(docs, block_tokens=0)


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_sample_rebalances(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        temperature_sample,
    )

    # 1600 docs in 'big', 100 in 'small': alpha=0.5 keeps small whole
    # and downsamples big toward sqrt ratio (expected keep prob 0.25)
    rows = [(i, "big") for i in range(1600)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = temperature_sample(docs, domain_col="domain", alpha=0.5)
    by_dom = {
        r["domain"]: r["n"]
        for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom["small"] == 100  # smallest domain survives whole
    # hash-threshold keep of p=0.25 over 1600 docs: binomial, generous
    # bounds (±5 sigma ≈ ±87)
    assert 300 < by_dom["big"] < 500
    # alpha=1 keeps everything
    assert temperature_sample(docs, "domain", alpha=1.0).count() == 1700


def test_temperature_sample_deterministic(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string")
    one = {r["doc_id"] for r in temperature_sample(docs, "domain").collect()}
    two = {
        r["doc_id"]
        for r in temperature_sample(docs.repartition(13), "domain").collect()
    }
    assert one == two and len(one) > 0


def test_scrub_pii_equals_detect_plus_redact(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.pii import (
        detect_pii,
        redact_pii,
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "u123.456@h.co then 123.456.7.8 then 123.456.7890"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    fused = {tuple(r) for r in scrub_pii(docs).collect()}
    joined = {
        tuple(r)
        for r in detect_pii(docs)
        .join(
            redact_pii(docs).select(
                "doc_id", F.col("text").alias("text_redacted")
            ),
            "doc_id",
        )
        .collect()
    }
    assert fused == joined


# ---------------------------------------------------------------------------
# bounded-state sketches
# ---------------------------------------------------------------------------


def test_kmv_distinct_exact_below_k(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_distinct,
    )

    df = spark.createDataFrame(
        [(i % 10, f"key{i % 37}") for i in range(500)], "g int, k string"
    )
    got = {
        r["g"]: (r["n_kept"], r["n_distinct_est"])
        for r in kmv_distinct(df, "k", k=64, by=["g"]).collect()
    }
    # every group sees fewer than 64 distinct keys → sketch is exact
    for g, (n_kept, est) in got.items():
        truth = len({i % 37 for i in range(500) if i % 10 == g})
        assert n_kept == truth and est == truth


def test_kmv_distinct_estimate_accuracy(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_distinct,
    )

    n = 20_000
    df = spark.createDataFrame(
        [(f"key{i}",) for i in range(n)], "k string"
    )
    r = kmv_distinct(df, "k", k=256).collect()[0]
    assert r["n_kept"] == 256
    # KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
    assert abs(r["n_distinct_est"] - n) / n < 0.25
    with pytest.raises(ValueError):
        kmv_distinct(df, "k", k=1)


def test_count_min_upper_bound_and_exactness(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        count_min_build,
        count_min_query,
    )

    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    keys = spark.createDataFrame(
        [("hot",), ("cold0",), ("absent",)], "k string"
    )
    # wide grid: collisions vanish, estimates are exact
    wide = count_min_build(df, "k", depth=4, width=4096)
    assert wide.count() <= 4 * 4096
    got = {
        r["k"]: r["est"]
        for r in count_min_query(wide, keys, "k", width=4096).collect()
    }
    assert got == {"hot": 500, "cold0": 1, "absent": 0}
    # narrow grid: still an UPPER bound on every true count
    narrow = count_min_build(df, "k", depth=4, width=8)
    got_n = {
        r["k"]: r["est"]
        for r in count_min_query(narrow, keys, "k", width=8).collect()
    }
    assert got_n["hot"] >= 500 and got_n["cold0"] >= 1 and got_n["absent"] >= 0


def test_count_min_weighted(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        count_min_build,
        count_min_query,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "k string, w int"
    )
    sketch = count_min_build(df, "k", depth=4, width=1024, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {
        r["k"]: r["est"]
        for r in count_min_query(sketch, keys, "k", width=1024).collect()
    }
    assert got == {"a": 15, "b": 7}


def _hist_quantile_ref(values, percents):
    """Python reference for the log2-histogram integer estimator."""
    from collections import Counter

    bins = Counter(len(format(v, "b")) for v in values)
    out = {}
    n = len(values)
    for p in percents:
        rank = (n - 1) * p // 100
        cum = 0
        for b in sorted(bins):
            c = bins[b]
            if cum <= rank < cum + c:
                lower = 0 if b == 1 else 1 << (b - 1)
                width = 2 if b == 1 else 1 << (b - 1)
                out[p] = lower + ((rank - cum) * width) // c
                break
            cum += c
    return out


def test_histogram_quantiles_matches_reference(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        histogram_quantiles,
    )

    values = [0, 1, 3, 7, 9, 100, 1000, 1001, 5000, 65536, 2**40]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = {
        r["percent"]: (r["n"], r["est"])
        for r in histogram_quantiles(df, "v", percents=[0, 50, 90, 100]).collect()
    }
    ref = _hist_quantile_ref(values, [0, 50, 90, 100])
    assert {p: e for p, (_, e) in got.items()} == ref
    assert all(n == len(values) for n, _ in got.values())
    # estimate brackets the true quantile's bin: p0 -> 0, p100 within top bin
    assert got[0][1] == 0 and 2**40 <= got[100][1] < 2**41


def test_histogram_quantiles_grouped_and_negative(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("a", i) for i in range(1, 101)] + [("b", 1 << i) for i in range(20)],
        "g string, v long",
    )
    rows = histogram_quantiles(df, "v", percents=[50], by=["g"]).collect()
    got = {r["g"]: r["est"] for r in rows}
    ref_a = _hist_quantile_ref(list(range(1, 101)), [50])[50]
    ref_b = _hist_quantile_ref([1 << i for i in range(20)], [50])[50]
    assert got == {"a": ref_a, "b": ref_b}
    neg = spark.createDataFrame([(-1,)], "v long")
    with pytest.raises(Exception, match="negative"):
        histogram_quantiles(neg, "v").collect()
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", percents=[101])


def test_bloom_prune_no_false_negatives(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(1000)], "k string"
    )
    pos = bloom_build(keys, "k", num_bits=4096, depth=4)
    assert pos.count() <= 40
    survivors = {
        r["k"] for r in bloom_prune(probe, "k", pos, 4096, 4).collect()
    }
    member = {f"k{i}" for i in range(10)}
    assert member <= survivors          # no false negatives, ever
    assert len(survivors) < 1000        # pruning actually happened
    # deterministic: a second run returns the identical survivor set
    again = {
        r["k"] for r in bloom_prune(probe, "k", pos, 4096, 4).collect()
    }
    assert survivors == again


def test_bloom_prune_is_narrow(spark):
    """The probe is a shuffle-free filter: no Exchange, no Join."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.createDataFrame([("x",)], "k string")
    probe = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    pos = bloom_build(keys, "k", num_bits=64, depth=2)
    pruned = bloom_prune(probe, "k", pos, 64, 2)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan and "Join" not in plan


def _bigram_ref(texts, scale=10**9):
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")
    doc_toks = {i: tok.findall(t.lower()) for i, t in enumerate(texts)}
    grams, unis = Counter(), Counter()
    per_doc = {}
    for i, ts in doc_toks.items():
        per_doc[i] = [(ts[j], f"{ts[j]} {ts[j+1]}") for j in range(len(ts) - 1)]
        for a, g in per_doc[i]:
            grams[g] += 1
            unis[a] += 1
    out = {}
    for i in doc_toks:
        pairs = per_doc[i]
        if not pairs:
            out[i] = (0, 0)
            continue
        s = sum((scale * grams[g]) // unis[a] for a, g in pairs)
        out[i] = (len(pairs), s // len(pairs))
    return out


def test_bigram_coherence_matches_reference(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        bigram_coherence,
    )

    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "completely unrelated words here",
        "x",            # single token -> 0 bigrams, kept
        "",             # empty -> kept
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["coherence"])
        for r in bigram_coherence(docs).collect()
    }
    assert got == _bigram_ref(texts)
    # sub-2-token docs are kept with zero scores, not dropped
    assert got[3] == (0, 0) and got[4] == (0, 0)
    # "the cat"/"the mat" split the mass after "the" -> doc 0 scores
    # below the deterministic "sat on"-style certainty bigrams alone
    assert 0 < got[0][1] < 10**9


def test_sketches_ignore_null_keys(spark):
    """NULL keys/values must be ignored by every sketch: a NULL hash
    sorts first in Spark but last in ANSI SQL (cross-engine skew), and
    a NULL position would crash the bloom word packer."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        bloom_build,
        bloom_prune,
        count_min_build,
        count_min_query,
        histogram_quantiles,
        kmv_distinct,
    )

    with_nulls = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "k string"
    )
    clean = spark.createDataFrame([("a",), ("b",)], "k string")

    r = kmv_distinct(with_nulls, "k", k=8).collect()[0]
    assert (r["n_kept"], r["n_distinct_est"]) == (2, 2)

    probe = spark.createDataFrame([("a",), (None,), ("c",)], "k string")
    pos = bloom_build(with_nulls, "k", num_bits=256, depth=3)
    survivors = {
        r["k"] for r in bloom_prune(probe, "k", pos, 256, 3).collect()
    }
    assert "a" in survivors and None not in survivors

    sk = count_min_build(with_nulls, "k", depth=2, width=64)
    sk_clean = count_min_build(clean, "k", depth=2, width=64)
    assert {tuple(r) for r in sk.collect()} == {
        tuple(r) for r in sk_clean.collect()
    }
    est = {
        r["k"]: r["est"]
        for r in count_min_query(sk, clean, "k", width=64).collect()
    }
    assert est == {"a": 1, "b": 1}

    vals = spark.createDataFrame([(5,), (None,), (9,)], "v long")
    rows = histogram_quantiles(vals, "v", percents=[50]).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_kmv_plan_shapes(spark):
    """Grouped path: WindowGroupLimit (per-map-task top-k before the
    exchange).  Global path: TakeOrderedAndProject (bounded heap merge),
    never a single-partition window."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_distinct,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    df = spark.createDataFrame(
        [(i % 5, f"k{i}") for i in range(100)], "g int, k string"
    )
    assert "WindowGroupLimit" in plan(kmv_distinct(df, "k", k=8, by=["g"]))
    gplan = plan(kmv_distinct(df, "k", k=8))
    assert "TakeOrderedAndProject" in gplan and "Window" not in gplan


def test_fs_score_and_blocking(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        block_candidates,
        fs_score,
    )

    recs = spark.createDataFrame(
        [
            (1, "b1", "555", "A"),
            (2, "b1", "555", "A"),   # agrees with 1 on both fields
            (3, "b1", "999", "B"),   # disagrees with both
            (4, "b2", "555", "A"),   # other block: never paired with 1-3
        ],
        "rid long, blk string, phone string, seg string",
    )
    pairs = block_candidates(recs, "rid", ["blk"])
    got_pairs = {(r["rid_l"], r["rid_r"]) for r in pairs.collect()}
    assert got_pairs == {(1, 2), (1, 3), (2, 3)}  # upper-triangular, in-block

    ag = pairs.select(
        "rid_l", "rid_r",
        (F.col("phone_l") == F.col("phone_r")).alias("a_phone"),
        (F.col("seg_l") == F.col("seg_r")).alias("a_seg"),
    )
    scored = fs_score(ag, [("a_phone", 100, -50), ("a_seg", 30, -70)])
    got = {
        (r["rid_l"], r["rid_r"]): (r["score"], r["is_match"])
        for r in scored.collect()
    }
    assert got == {
        (1, 2): (130, True),
        (1, 3): (-120, False),
        (2, 3): (-120, False),
    }
    # NULL agreement contributes zero (FS missingness treatment)
    nullpair = spark.createDataFrame(
        [(1, 2, None, True)], "rid_l long, rid_r long, a_phone boolean, a_seg boolean"
    )
    r = fs_score(nullpair, [("a_phone", 100, -50), ("a_seg", 30, -70)]).collect()[0]
    assert r["score"] == 30
    with pytest.raises(ValueError):
        fs_score(nullpair, [])
    with pytest.raises(ValueError):
        block_candidates(recs, "rid", [])


def test_fs_scoring_is_narrow(spark):
    """fs_score adds no shuffle: one projection over the pairs."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        fs_score,
    )

    pairs = spark.createDataFrame(
        [(1, 2, True)], "rid_l long, rid_r long, a boolean"
    )
    df = fs_score(pairs, [("a", 10, -10)])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_scc_decomposition(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        strongly_connected_components,
    )

    def run(edge_list):
        e = spark.createDataFrame(edge_list, "src string, dst string")
        out = strongly_connected_components(e)
        sccs = {}
        for r in out.collect():
            sccs.setdefault(r["scc_id"], set()).add(r["node"])
        return sccs

    # cycle a->b->c->a with a tail d->a: one 3-SCC plus singleton d
    sccs = run([("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")])
    assert sccs == {"a": {"a", "b", "c"}, "d": {"d"}}

    # two 2-cycles joined by a ONE-WAY bridge stay separate SCCs
    sccs = run(
        [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"), ("b", "x")]
    )
    assert sccs == {"a": {"a", "b"}, "x": {"x", "y"}}

    # pure DAG: every node its own SCC
    sccs = run([("1", "2"), ("2", "3"), ("1", "3")])
    assert sccs == {"1": {"1"}, "2": {"2"}, "3": {"3"}}

    # nested: outer cycle traversing an inner cycle, all mutually
    # reachable -> single SCC
    sccs = run(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "b")]
    )
    assert sccs == {"a": {"a", "b", "c", "d"}}


def test_scc_partition_invariance(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        strongly_connected_components,
    )

    edges = [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)] + [
        (f"m{i}", f"m{i + 1}") for i in range(6)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    one = {tuple(r) for r in strongly_connected_components(e).collect()}
    two = {
        tuple(r)
        for r in strongly_connected_components(e.repartition(13)).collect()
    }
    assert one == two
    # the 7-cycle collapses, the m-path stays singletons
    assert ("n3", "n0") in one and ("m3", "m3") in one


def test_scc_random_digraph_vs_tarjan(spark):
    """Seeded random digraph vs an iterative Tarjan reference — the
    FW-BW peeling must reproduce the exact canonical decomposition."""
    import random

    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        strongly_connected_components,
    )

    rng = random.Random(20260818)
    n = 40
    edges = sorted({
        (f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
        for _ in range(120)
    })
    edges = [(a, b) for a, b in edges if a != b]

    # iterative Tarjan (no recursion-depth issues)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    nodes_with_edges = sorted({x for e in edges for x in e})
    index, low, onstack, st = {}, {}, set(), []
    comps, counter = [], [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                st.append(v)
                onstack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi >= 0 and low[v] == index[v]:
                comp = []
                while True:
                    w = st.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                comps.append(comp)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in nodes_with_edges:
        if v not in index:
            strongconnect(v)
    ref = {}
    for comp in comps:
        m = min(comp)
        for v in comp:
            ref[v] = m

    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(e).collect()
    }
    assert got == ref


def test_collocations_lift_ranking_and_min_count(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        collocations,
    )

    # "new york" always collocates; "the cat/dog/car/sun/hat" spreads
    # "the" across many successors (low lift); "rare pair" appears once
    # (killed by min_count)
    docs = spark.createDataFrame(
        [
            (i, "new york " + "the " + w + " ")
            for i, w in enumerate(["cat", "dog", "car", "sun", "hat"] * 2)
        ]
        + [(100, "rare pair")],
        ["doc_id", "text"],
    )
    out = collocations(docs, min_count=2, top_k=10).collect()
    assert [r.a for r in out][0] == "new"  # perfect collocation ranks first
    got = {(r.a, r.b): (r.n_ab, r.lift_micro) for r in out}
    assert ("rare", "pair") not in got  # min_count guard
    # exact integer lift: N=31 bigrams (the rare doc counts in the
    # marginals even though min_count kills its pair), c(new *)=10,
    # c(* york)=10, n(new york)=10 -> 1e6*31*10 // 100 = 3_100_000
    assert got[("new", "york")] == (10, 3_100_000)
    # "the X": n=2, c(the *)=10, c(* X)=2 -> 1e6*31*2 // 20 = 3.1e6
    # ("york the": n=10, c(york *)=10, c(* the)=10 -> same) — all
    # surviving pairs tie at 3.1e6; ordering falls through to (a, b)
    assert all(r.lift_micro == 3_100_000 for r in out)
    assert [(r.a, r.b) for r in out] == sorted((r.a, r.b) for r in out)
    # deterministic rerun
    assert collocations(docs, min_count=2, top_k=10).collect() == out


def test_pareto_frontier_dominance_and_duplicates(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        pareto_frontier,
    )

    pts = [
        ("a", 5, 1), ("h", 5, 1),          # duplicate corner: both kept
        ("b", 4, 3), ("c", 4, 3),          # duplicate interior: both kept
        ("d", 4, 2),                       # dominated by b (same x, y 3>2)
        ("e", 3, 4),
        ("f", 2, 4),                       # dominated by e (x 3>2, y ties)
        ("g", 1, 5),
    ]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {r.id for r in pareto_frontier(df, "x", "y").collect()}
    assert got == {"a", "h", "b", "c", "e", "g"}


def test_pareto_frontier_matches_brute_force_random(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        pareto_frontier,
    )
    import random

    rng = random.Random(2026)
    pts = [(i, rng.randrange(200), rng.randrange(200)) for i in range(300)]
    want = {
        i
        for i, x, y in pts
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for _, bx, by in pts
        )
    }
    df = spark.createDataFrame(pts, ["id", "x", "y"]).repartition(7)
    # multi-bucket path (width 8 -> ~25 buckets) and the degenerate
    # single-bucket path must both equal brute force
    for width in (8, 1 << 20):
        got = {r.id for r in pareto_frontier(df, "x", "y", width).collect()}
        assert got == want, width


def test_dsir_importance_matches_integer_replay(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        dsir_importance,
    )
    import re
    from collections import Counter

    # target domain talks about proteins; raw corpus is mixed
    docs = [
        (i, f"protein folding kinase pathway sample {i % 3}")
        for i in range(6)
    ] + [
        (i, f"football match referee goal crowd {i % 4}")
        for i in range(6, 14)
    ] + [
        (14, "protein football shared vocabulary text"),
        (15, ""),  # zero tokens: must not be ranked
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(5)
    target = df.filter(F.col("doc_id") < 6)
    got = dsir_importance(df, target, top_k=10).collect()

    # exact integer replay of the operator's own definition
    def ml2(x):
        p = x.bit_length() - 1
        return 1000 * p + ((x * 1024) // (1 << p) - 1024) * 1000 // 1024

    tok = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")
    per = {i: Counter(tok.findall(t.lower())) for i, t in docs}
    raw = Counter()
    for c in per.values():
        raw.update(c)
    tgt = Counter()
    for i in range(6):
        tgt.update(per[i])
    v = len(raw)
    len_milli = ml2(sum(tgt.values()) + v) - ml2(sum(raw.values()) + v)
    want = []
    for i, c in per.items():
        n_tok = sum(c.values())
        if n_tok == 0:
            continue
        s = sum(
            n * (ml2(tgt.get(t, 0) + 1) - ml2(raw[t] + 1))
            for t, n in c.items()
        )
        want.append((i, n_tok, s - n_tok * len_milli))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert [(r.doc_id, r.n_tokens, r.score_milli) for r in got] == want[:10]
    # semantics: every pure-target doc outranks every pure-football doc,
    # with the mixed doc strictly between the two blocks
    rank = {doc_id: k for k, (doc_id, _, _) in enumerate(want)}
    assert max(rank[i] for i in range(6)) < rank[14]
    assert rank[14] < min(rank[i] for i in range(6, 14))


def test_token_entropy_matches_integer_replay(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        token_entropy,
    )
    import re
    from collections import Counter

    docs = [
        (0, "spam spam spam spam spam"),            # zero entropy
        (1, "all tokens here are fully distinct"),  # max entropy = ml2(n)
        (2, "a a b b c c d d"),
        (3, "one token"),
        (4, ""),                                    # unscored
        (5, "x"),                                   # n=1 -> entropy 0
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
    got = {r.doc_id: (r.n_tokens, r.entropy_milli)
           for r in token_entropy(df).collect()}

    def ml2(x):
        p = x.bit_length() - 1
        return 1000 * p + ((x * 1024) // (1 << p) - 1024) * 1000 // 1024

    tok = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")
    want = {}
    for i, t in docs:
        c = Counter(tok.findall(t.lower()))
        n = sum(c.values())
        if n == 0:
            continue
        want[i] = (n, ml2(n) - sum(v * ml2(v) for v in c.values()) // n)
    assert got == want
    assert got[0][1] == 0 and got[5][1] == 0          # uniform repeat
    assert got[1][1] == ml2(6)                        # all distinct
    assert 0 < got[2][1] <= ml2(8)                    # in between


def test_skipgram_pairs_matches_brute_force(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        skipgram_pairs,
    )
    import re
    from collections import Counter

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat the cat the cat"),
        (2, "solo"),
        (3, ""),
        (4, "alpha beta gamma delta epsilon zeta eta"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
    for window in (1, 3):
        got = [
            (r.a, r.b, r.n_pairs)
            for r in skipgram_pairs(
                df, window=window, min_count=1, top_k=1000
            ).collect()
        ]
        tok = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")
        want = Counter()
        for _, t in docs:
            ts = tok.findall(t.lower())
            for i in range(len(ts) - 1):
                for j in range(i + 1, min(i + window, len(ts) - 1) + 1):
                    want[(ts[i], ts[j])] += 1
        want_rows = sorted(
            ((a, b, n) for (a, b), n in want.items()),
            key=lambda r: (-r[2], r[0], r[1]),
        )
        assert got == want_rows, window


def test_zipf_fit_matches_integer_replay(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        zipf_fit,
    )
    from collections import Counter

    # synthetic Zipf corpus: token k appears ~ 1024 // rank times
    words = []
    for rank in range(1, 65):
        words.extend([f"w{rank:03d}"] * (1024 // rank))
    text = " ".join(words)
    df = spark.createDataFrame([(0, text), (1, "w001 w002")], ["doc_id", "text"])
    row = zipf_fit(df, top_v=32).collect()[0]

    def ml2(x):
        p = x.bit_length() - 1
        return 1000 * p + ((x * 1024) // (1 << p) - 1024) * 1000 // 1024

    def tdiv(a, b):  # truncate toward zero, like Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    c = Counter(words)
    c["w001"] += 1
    c["w002"] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
    pts = [(ml2(r), ml2(f)) for r, (_, f) in enumerate(top, start=1)]
    v = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = tdiv((v * sxy - sx * sy) * 1000, v * sxx - sx * sx)
    intercept = tdiv(sy * 1000 - slope * sx, v * 1000)
    assert (row.n_vocab, row.slope_milli, row.intercept_milli) == (
        v, slope, intercept,
    )
    # a 1/rank corpus must fit slope near -1000 milli (exponent ~1)
    assert -1100 < row.slope_milli < -900


def test_quality_keeper_clusters_picks_longest(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        quality_keeper_clusters,
    )

    base = "alpha beta gamma delta epsilon"
    docs = [
        (1, base),                       # cluster A
        (2, base + " zeta"),             # cluster A, longest -> keeper
        (3, base),                       # cluster A
        (10, "one two three four five six seven"),   # cluster B
        (11, "one two three four five six seven"),   # cluster B (tie:
                                                     #  keeper = min id)
        (20, "totally unrelated content about other things"),  # isolated
        (21, ""),                                              # empty
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
    got = {
        r.component: (r.n_members, r.keeper_doc_id, r.keeper_tokens)
        for r in quality_keeper_clusters(df, threshold_milli=500).collect()
    }
    # component id = min member id; keeper = longest, ties -> min id
    assert got == {1: (3, 2, 6), 10: (2, 10, 7)}


def test_source_overlap_matrix_exact(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = [
        (1, "s1", "alpha beta gamma"),      # s1: {ab, bg}
        (2, "s1", "alpha beta"),            # dup shingle, set unchanged
        (3, "s2", "alpha beta delta"),      # s2: {ab, bd}
        (4, "s3", "zeta eta"),              # s3: {ze} — disjoint
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.n_common, r.jaccard_milli)
        for r in source_overlap_matrix(df, k=2).collect()
    }
    assert got == {
        ("s1", "s2"): (2, 2, 1, 333),   # {ab} / {ab, bg, bd}
        ("s1", "s3"): (2, 1, 0, 0),     # zero-overlap pair still emitted
        ("s2", "s3"): (2, 1, 0, 0),
    }


def test_funnel_counts_strict_ordering(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        funnel_counts,
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    ev = [
        # user 1: full ordered chain
        (1, t0, "view"), (1, t0 + s, "click"), (1, t0 + 2 * s, "purchase"),
        # user 2: purchase BEFORE click -> stops at click
        (2, t0, "view"), (2, t0 + 2 * s, "click"), (2, t0 + s, "purchase"),
        # user 3: click before any view -> stops at view
        (3, t0 + s, "view"), (3, t0, "click"),
        # user 4: never viewed -> not in funnel at all
        (4, t0, "click"), (4, t0 + s, "purchase"),
        # user 5: click at SAME ts as view -> strict ordering drops it
        (5, t0, "view"), (5, t0, "click"),
    ]
    df = spark.createDataFrame(ev, ["user_id", "ts", "event_type"])
    got = {
        r.stage: (r.name, r.n_users, r.conv_milli)
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        1: ("view", 4, 1000),
        2: ("click", 2, 500),
        3: ("purchase", 1, 250),
    }


# ---------------------------------------------------------------------------
# CDC changelog apply + mergeable aggregate states
# ---------------------------------------------------------------------------


def test_apply_changelog_reinsert_after_delete(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        apply_changelog,
    )

    log = spark.createDataFrame(
        [
            # key 1: insert → update → delete → REINSERT: latest wins
            (1, 1, "U", 10),
            (1, 2, "U", 20),
            (1, 3, "D", None),
            (1, 4, "U", 40),
            # key 2: insert → delete: tombstone removes it
            (2, 1, "U", 11),
            (2, 2, "D", None),
            # key 3: single insert survives
            (3, 1, "U", 33),
        ],
        "k long, seq long, op string, v long",
    )
    got = {
        (r["k"], r["seq"], r["v"])
        for r in apply_changelog(log, ["k"], "seq", "op").collect()
    }
    assert got == {(1, 4, 40), (3, 1, 33)}


def test_merge_agg_states_equals_full_recompute(spark):
    rows = [(i % 3, (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, v long")
    spec = {
        "n": ("count", "v"),
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    # adversarial split: uneven thirds, one slice empty for g=2
    parts = [
        df.filter(F.col("v") < 5),
        df.filter((F.col("v") >= 5) & (F.col("v") < 6)),
        df.filter(F.col("v") >= 6),
    ]
    states = [analytics.agg_state(p, ["g"], spec) for p in parts]
    merged = {
        (r["g"], r["n"], r["s"], r["lo"], r["hi"])
        for r in analytics.merge_agg_states(states, ["g"], spec).collect()
    }
    direct = {
        (r["g"], r["n"], r["s"], r["lo"], r["hi"])
        for r in analytics.agg_state(df, ["g"], spec).collect()
    }
    assert merged == direct


def test_single_linkage_clusters_threshold_and_noise(spark):
    msf = spark.createDataFrame(
        [
            ("a", "b", 1),
            ("b", "c", 2),
            ("c", "d", 5),   # cut at threshold 2 → splits the chain
            ("d", "e", 1),
            ("f", "g", 9),   # cut → BOTH endpoints become noise
        ],
        "src string, dst string, weight long",
    )
    got = {
        (r["node"], r["cluster"], r["cluster_size"], r["is_noise"])
        for r in components.single_linkage_clusters(
            msf, threshold=2
        ).collect()
    }
    assert got == {
        ("a", "a", 3, False),
        ("b", "a", 3, False),
        ("c", "a", 3, False),
        ("d", "d", 2, False),
        ("e", "d", 2, False),
        ("f", "f", 1, True),
        ("g", "g", 1, True),
    }


def test_rendezvous_shards_reshard_stability(spark):
    """The rendezvous contract: growing 4→6 shards moves keys ONLY onto
    the new shards (never between old ones), moved fraction ≈ 2/6, and
    placement is independent of row order/partitioning."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        rendezvous_shards,
    )

    keys = spark.range(0, 3000).withColumnRenamed("id", "k")
    old = [f"s{i}" for i in range(4)]
    new = old + ["s4", "s5"]
    both = rendezvous_shards(
        rendezvous_shards(keys, "k", old, out="a"), "k", new, out="b"
    )
    rows = both.collect()
    moved = [r for r in rows if r["a"] != r["b"]]
    # never between old shards
    assert all(r["b"] in ("s4", "s5") for r in moved)
    # expected 2/6 of keys move; loose 3-sigma-ish band
    assert 0.25 < len(moved) / len(rows) < 0.42
    # partitioning-independence: same assignment from a repartitioned df
    again = {
        r["k"]: r["b"]
        for r in rendezvous_shards(
            keys.repartition(7), "k", new, out="b"
        ).collect()
    }
    assert again == {r["k"]: r["b"] for r in rows}


def test_rendezvous_shards_portable_matches_duckdb(spark):
    """portable=True replays verbatim in DuckDB (same md5 porthash,
    same wt-desc/shard-desc argmax)."""
    import duckdb

    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        rendezvous_shards,
    )

    shards = [f"s{i}" for i in range(5)]
    got = {
        (r["k"], r["shard"])
        for r in rendezvous_shards(
            spark.range(0, 500).withColumnRenamed("id", "k"),
            "k",
            shards,
            portable=True,
        ).collect()
    }
    vals = ", ".join(f"('{s}')" for s in shards)
    want = set(
        duckdb.sql(
            f"""
            SELECT k, shard FROM (
                SELECT k, shard, row_number() OVER (
                    PARTITION BY k ORDER BY
                    CAST('0x' || substr(md5(
                        CAST(k AS VARCHAR) || chr(31) || shard
                    ), 1, 15) AS BIGINT) DESC, shard DESC) AS rn
                FROM range(500) t(k) CROSS JOIN (VALUES {vals}) s(shard)
            ) WHERE rn = 1
            """
        ).fetchall()
    )
    assert got == want


def test_nucleus_mask_integer_cut(spark):
    """Hand-checked cut: freqs 5,3,2 at p=4/5 keep {5,3} (cum_before
    8 !< 8 drops the tail); the boundary-crossing row is kept; a
    singleton group is always its own nucleus; ties break on the
    tiebreak column ascending."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        nucleus_mask,
    )

    df = spark.createDataFrame(
        [
            ("d1", "a", 5),
            ("d1", "b", 3),
            ("d1", "c", 2),
            ("d2", "x", 7),
            ("d3", "m", 2),   # tie on freq: 'm' < 'n' so m is the head
            ("d3", "n", 2),
            ("d3", "o", 1),
        ],
        "g string, tok string, freq long",
    )
    got = {
        (r["g"], r["tok"]): r["is_nucleus"]
        for r in nucleus_mask(
            df, ["g"], "freq", ["tok"], 4, 5
        ).collect()
    }
    assert got == {
        ("d1", "a"): True,
        ("d1", "b"): True,
        ("d1", "c"): False,
        ("d2", "x"): True,
        # d3 total 5, p·total=4: cb(m)=0<4 keep, cb(n)=2<4 keep
        # (crossing row), cb(o)=4 !<4 drop
        ("d3", "m"): True,
        ("d3", "n"): True,
        ("d3", "o"): False,
    }


# ---------------------------------------------------------------------------
# containment join (q103)
# ---------------------------------------------------------------------------


def test_containment_join_directed_and_identical(spark):
    """Asymmetry: the subset doc points at the superset at C=1.0 while the
    reverse direction is filtered; identical token sets pair BOTH ways via
    the signature frontier."""
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana cherry"),
            ("d2", "apple banana cherry date egg fig grape huck iris jack"),
            ("d3", "zebra yak"),
            ("d4", "cherry apple banana"),  # same unigram set as d1
        ],
        "doc_id string, text string",
    )
    got = {
        (r["doc_sub"], r["doc_sup"], r["n_sub"], r["n_inter"],
         r["cont_millis"])
        for r in dedup.containment_join(
            docs, threshold_millis=800, shingle_k=1
        ).collect()
    }
    assert got == {
        ("d1", "d2", 3, 3, 1000),
        ("d4", "d2", 3, 3, 1000),
        ("d1", "d4", 3, 3, 1000),
        ("d4", "d1", 3, 3, 1000),
    }


def test_containment_join_matches_brute_force_random(spark):
    """Prefix-probe completeness on a random corpus: every qualifying
    ordered pair the brute force finds must come out of the blocked plan."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (f"d{i}", " ".join(rng.choices(vocab, k=rng.randint(3, 25))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    t = 600

    def uni(text):
        return set(text.split())

    sets = {d: uni(t_) for d, t_ in rows}
    expect = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if 1000 * inter >= t * len(sa):
                expect.add((a, b, len(sa), inter, (1000 * inter) // len(sa)))
    got = {
        (r["doc_sub"], r["doc_sup"], r["n_sub"], r["n_inter"],
         r["cont_millis"])
        for r in dedup.containment_join(
            docs, threshold_millis=t, shingle_k=1
        ).collect()
    }
    assert got == expect
    assert len(expect) > 5  # fixture actually exercises the join


# ---------------------------------------------------------------------------
# mutual best match (q104)
# ---------------------------------------------------------------------------


def test_mutual_best_match_reciprocity(spark):
    """Only reciprocal argmax pairs survive: L2's best is R1, but R1's
    best (tie broken to the smaller left_id) is L0 — so L2 is unmatched."""
    left = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.9, 0.1]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["left_id"], r["right_id"], r["qdot"])
        for r in similarity.mutual_best_match(left, right).collect()
    }
    assert got == {(0, 1, 127 * 127), (4, 3, 127 * 127)}


def test_mutual_best_match_quantization_scale(spark):
    """max|x| scale is per-vector: [0.5, 0.25] quantizes to [127, 64]
    (floor(+0.5) rounding), not to the global scale."""
    left = spark.createDataFrame(
        [(0, [0.5, 0.25])], "vec_id long, embedding array<float>"
    )
    right = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    [row] = similarity.mutual_best_match(left, right).collect()
    # q(left) = [127, floor(0.25*127/0.5 + .5)=64]; q(right) = [127, 127]
    assert (row["left_id"], row["right_id"]) == (0, 1)
    assert row["qdot"] == 127 * 127 + 64 * 127


# ---------------------------------------------------------------------------
# label propagation (q105)
# ---------------------------------------------------------------------------


def test_propagate_labels_majority_ties_and_rounds(spark):
    """Weighted majority with smallest-label ties, seeds clamped, the
    synchronous schedule reaching one hop per round, unreachable nodes
    absent."""
    edges = spark.createDataFrame(
        [
            ("a", "c", 2), ("b", "c", 1),   # c: X=2 > Y=1 → X
            ("a", "d", 1), ("b", "d", 1),   # d: tie → smallest label X
            ("c", "e", 1),                  # e labeled only in round 2
            ("b", "a", 100),                # seed a must NOT flip to Y
            ("f", "g", 5),                  # no seeded neighbor → absent
        ],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame(
        [("a", "X"), ("b", "Y")], "node string, label string"
    )

    r1 = {
        (r["node"], r["label"], r["is_seed"])
        for r in components.propagate_labels(
            edges, seeds, weight_col="w", rounds=1
        ).collect()
    }
    assert r1 == {
        ("a", "X", True), ("b", "Y", True),
        ("c", "X", False), ("d", "X", False),
    }

    r2 = {
        (r["node"], r["label"], r["is_seed"])
        for r in components.propagate_labels(
            edges, seeds, weight_col="w", rounds=2
        ).collect()
    }
    assert r2 == r1 | {("e", "X", False)}


def test_propagate_labels_default_weight_multiplicity(spark):
    """Default weight is 1 per input row and the symmetrize+groupBy SUMS
    multiplicity — a reversed duplicate of an edge doubles its vote."""
    edges = spark.createDataFrame(
        [("s1", "n", None), ("n", "s1", None), ("s2", "n", None)],
        "src string, dst string, w long",
    ).select("src", "dst")
    seeds = spark.createDataFrame(
        [("s1", "B"), ("s2", "A")], "node string, label string"
    )
    got = {
        (r["node"], r["label"])
        for r in components.propagate_labels(edges, seeds, rounds=1).collect()
    }
    # s1 edge appears twice in the input but sums to w=2 vs s2's w=1 → B wins
    assert got == {("s1", "B"), ("s2", "A"), ("n", "B")}


def test_greedy_max_coverage_greedy_not_largest(spark):
    """Classic instance where greedy order matters: after A={1,2,3,4}
    is taken, B={1,2,5} has residual gain 1 while C={5,6,7} has 3 —
    greedy picks C second; B's residual is then 0 so the run stops at
    two rows even with k=5 (no positive-gain round emits)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        greedy_max_coverage,
    )

    items = spark.createDataFrame(
        [("A", e) for e in [1, 2, 3, 4]]
        + [("B", e) for e in [1, 2, 5]]
        + [("C", e) for e in [5, 6, 7]],
        "set_id string, element long",
    )
    got = [
        (r["round"], r["set_id"], r["gain"], r["covered_total"])
        for r in greedy_max_coverage(items, k=5)
        .orderBy("round")
        .collect()
    ]
    assert got == [(1, "A", 4, 4), (2, "C", 3, 7)]


def test_greedy_max_coverage_ties_and_dups(spark):
    """Gain ties break to the smallest set id, and duplicate
    (set, element) rows count once."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        greedy_max_coverage,
    )

    items = spark.createDataFrame(
        [("Z", 1), ("Z", 2), ("Z", 2), ("A", 3), ("A", 4), ("A", 4)],
        "set_id string, element long",
    )
    got = [
        (r["round"], r["set_id"], r["gain"])
        for r in greedy_max_coverage(items, k=2).orderBy("round").collect()
    ]
    assert got == [(1, "A", 2), (2, "Z", 2)]


def test_transition_topk_order_and_probs(spark):
    """One user's stream a→b→a→b→c (ts ties broken by event_id) gives
    a: {b:2}, b: {a:1, c:1}; prob_milli is exact integer DIV over the
    pair universe (terminal event c contributes no mass)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        transition_topk,
    )

    events = spark.createDataFrame(
        [
            ("u1", 1, 10, "a"),
            ("u1", 2, 20, "b"),
            # ts tie at 30: event_id orders a(3) before b(4)
            ("u1", 3, 30, "a"),
            ("u1", 4, 30, "b"),
            ("u1", 5, 40, "c"),
        ],
        "user_id string, event_id long, ts long, event_type string",
    )
    got = {
        (r["src_event"], r["next_event"]): (
            r["n_pairs"],
            r["prob_milli"],
            r["rk"],
        )
        for r in transition_topk(events, top_k=3).collect()
    }
    assert got == {
        ("a", "b"): (2, 1000, 1),
        ("b", "a"): (1, 500, 1),
        ("b", "c"): (1, 500, 2),
    }


def test_transition_topk_cut_and_tiebreak(spark):
    """top_k=1 keeps only each source's best successor; count ties
    break alphabetically on next_event."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        transition_topk,
    )

    events = spark.createDataFrame(
        [
            ("u1", 1, 1, "s"), ("u1", 2, 2, "x"),
            ("u2", 3, 1, "s"), ("u2", 4, 2, "m"),
        ],
        "user_id string, event_id long, ts long, event_type string",
    )
    got = [
        (r["src_event"], r["next_event"])
        for r in transition_topk(events, top_k=1).collect()
    ]
    assert got == [("s", "m")]


def test_degree_mixing_star_graph(spark):
    """Star c-{l1,l2,l3}: the degree-3 class sees mean neighbor degree
    1, the degree-1 class sees 3.  Self-loops and reversed/duplicate
    input rows collapse before degrees are counted."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        degree_mixing,
    )

    edges = spark.createDataFrame(
        [
            ("c", "l1"), ("l1", "c"),  # reversed duplicate
            ("c", "l2"), ("c", "l2"),  # duplicate
            ("c", "l3"),
            ("c", "c"),                # self-loop dropped
        ],
        "src string, dst string",
    )
    got = {
        r["degree"]: (r["n_ends"], r["sum_nbr_deg"], r["mean_nbr_deg_milli"])
        for r in degree_mixing(edges).collect()
    }
    assert got == {3: (3, 3, 1000), 1: (3, 9, 3000)}


def test_snapshot_diff_statuses_and_null_sentinel(spark):
    """added/removed/changed classified; unchanged rows dropped; NULL
    vs empty string compare as DIFFERENT (the \\x00 sentinel)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [
            ("u1", "same", 1),
            ("u2", "before", 2),
            ("u3", "gone", 3),
            ("u5", None, 5),
        ],
        "url string, body string, n long",
    )
    new = spark.createDataFrame(
        [
            ("u1", "same", 1),
            ("u2", "after", 2),
            ("u4", "fresh", 4),
            ("u5", "", 5),
        ],
        "url string, body string, n long",
    )
    got = {
        r["url"]: r["status"] for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
        "u5": "changed",
    }


def test_relation_cardinality_classes(spark):
    """One relation per class; duplicate triples collapse before any
    counting; functionality is exact integer milli."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        relation_cardinality,
    )

    t = spark.createDataFrame(
        [
            # 1:1 — bijection a↔x, b↔y
            ("a", "ONE", "x"), ("b", "ONE", "y"), ("b", "ONE", "y"),
            # 1:N — a fans out, objects have one subject each
            ("a", "FAN", "x"), ("a", "FAN", "y"), ("b", "FAN", "z"),
            # N:1 — many subjects, one object
            ("a", "IN", "x"), ("b", "IN", "x"),
            # N:M
            ("a", "MM", "x"), ("a", "MM", "y"), ("b", "MM", "x"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        r["pred"]: (
            r["n_triples"], r["n_subj"], r["n_obj"],
            r["max_out"], r["max_in"],
            r["functionality_milli"], r["card_class"],
        )
        for r in relation_cardinality(t).collect()
    }
    assert got == {
        "ONE": (2, 2, 2, 1, 1, 1000, "1:1"),
        "FAN": (3, 2, 3, 2, 1, 666, "1:N"),
        "IN": (2, 2, 1, 1, 2, 1000, "N:1"),
        "MM": (3, 2, 2, 2, 2, 666, "N:M"),
    }


def test_mine_path_rules_confidence_and_reflexive(spark):
    """R1(x,y) ∧ R2(y,z) ⇒ H(x,z): 2 of 3 body pairs carry the head →
    conf 666; the reflexive body pair (a,R1,m),(m,R2,a) is excluded
    from both body and head universes."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        mine_path_rules,
    )

    t = spark.createDataFrame(
        [
            ("a", "R1", "m"), ("b", "R1", "m"), ("c", "R1", "n"),
            ("m", "R2", "x"), ("n", "R2", "y"),
            ("m", "R2", "a"),          # would make reflexive body (a,a)
            ("a", "H", "x"), ("c", "H", "y"),
            ("d", "H", "d"),           # reflexive head excluded
        ],
        "subj string, pred string, obj string",
    )
    rows = {
        (r["r1"], r["r2"], r["r3"]): (
            r["support"], r["n_body"], r["n_head"],
            r["conf_milli"], r["hc_milli"],
        )
        for r in mine_path_rules(t, min_support=1).collect()
    }
    # body R1∘R2 pairs: (a,x),(b,x),(c,y),(b,a) — (a,a) reflexive dropped
    assert rows[("R1", "R2", "H")] == (2, 4, 2, 500, 1000)


def test_mine_path_rules_hub_cap(spark):
    """max_mid_degree drops hub middles BEFORE the body join: with the
    hub h (degree 4) capped out, no body pairs survive."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        mine_path_rules,
    )

    t = spark.createDataFrame(
        [
            ("a", "R1", "h"), ("b", "R1", "h"),
            ("h", "R2", "x"), ("h", "R2", "y"),
            ("a", "H", "x"),
        ],
        "subj string, pred string, obj string",
    )
    assert mine_path_rules(t, min_support=1).count() == 1
    assert mine_path_rules(t, min_support=1, max_mid_degree=3).count() == 0


def test_ranking_eval_filtered_ranks_and_ties(spark):
    """Hand-checked filtered protocol: for (s, o1) the higher-scored o2
    is ANOTHER truth → filtered out → rank 1; for (s2, p1) the tie with
    p0 breaks on obj ascending → p0 better → rank 2."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        ranking_eval,
    )

    scored = spark.createDataFrame(
        [
            ("s", "o1", 5), ("s", "o2", 9), ("s", "o3", 1),
            ("s2", "p0", 7), ("s2", "p1", 7), ("s2", "p2", 2),
        ],
        "subj string, obj string, score long",
    )
    truths = spark.createDataFrame(
        [("s", "o1"), ("s", "o2"), ("s2", "p1")],
        "subj string, obj string",
    )
    test = spark.createDataFrame(
        [("s", "o1"), ("s2", "p1")], "subj string, obj string"
    )
    row = ranking_eval(scored, test, truths, ks=(1, 3)).collect()[0]
    # ranks: (s,o1)=1 (o2 filtered), (s2,p1)=2 (p0 ties, p0<p1)
    assert (
        row["n_test"], row["hits1"], row["hits3"],
        row["mrr_micro"], row["mean_rank_milli"],
    ) == (2, 1, 2, 750000, 1500)


def test_sorted_neighborhood_blocks_and_window(spark):
    """Pairs stay inside blocks, reach exactly `window` successors in
    (sort, id) order, and dist records the rank gap."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        sorted_neighborhood,
    )

    recs = spark.createDataFrame(
        [
            ("A", 1, 10), ("A", 2, 20), ("A", 3, 20), ("A", 4, 30),
            ("B", 5, 10), ("B", 6, 40),
        ],
        "blk string, rid long, k long",
    )
    got = {
        (r["blk"], r["rid_l"], r["rid_r"], r["dist"])
        for r in sorted_neighborhood(
            recs, id_col="rid", sort_cols=["k"], block_cols=["blk"], window=2
        ).collect()
    }
    assert got == {
        ("A", 1, 2, 1), ("A", 1, 3, 2),
        ("A", 2, 3, 1), ("A", 2, 4, 2),
        ("A", 3, 4, 1),
        ("B", 5, 6, 1),
    }


def test_sorted_neighborhood_validates(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        sorted_neighborhood,
    )
    import pytest as _pt

    recs = spark.createDataFrame([("A", 1)], "blk string, rid long")
    with _pt.raises(ValueError):
        sorted_neighborhood(recs, "rid", ["rid"], ["blk"], window=0)
    with _pt.raises(ValueError):
        sorted_neighborhood(recs, "rid", ["rid"], [], window=1)


def test_hearst_pairs_patterns_and_direction(spark):
    """All three patterns extract with the right hyper/hypo direction
    ('Y and other X' reverses); two instances in one doc both emit;
    uppercase folds."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.extract import (
        hearst_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "Engines such as spark are fast"),
            (2, "scans and other operators run"),
            (3, "systems including duckdb work"),
            (4, "formats such as parquet including arrow"),
            (5, "no pattern here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["pattern"], r["hyper"], r["hypo"])
        for r in hearst_pairs(docs).collect()
    }
    assert got == {
        (1, "such_as", "engines", "spark"),
        (2, "and_other", "operators", "scans"),
        (3, "including", "systems", "duckdb"),
        (4, "such_as", "formats", "parquet"),
        (4, "including", "parquet", "arrow"),
    }


def test_truth_discovery_converges_on_majority(spark):
    """Two honest sources vs one liar over two objects: round 1 already
    crowns the majority values, honest sources reach trust 1000, the
    liar 0; a source repeating a claim gains no weight."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        truth_discovery,
    )

    claims = spark.createDataFrame(
        [
            ("s1", 1, "en"), ("s2", 1, "en"), ("s3", 1, "de"),
            ("s1", 2, "fr"), ("s2", 2, "fr"), ("s3", 2, "es"),
            ("s3", 2, "es"),  # duplicate claim — deduped
        ],
        "source string, obj long, val string",
    )
    got = {
        r["source"]: (r["n_claims"], r["trust_milli"])
        for r in truth_discovery(claims, rounds=2).collect()
    }
    assert got == {
        "s1": (2, 1000), "s2": (2, 1000), "s3": (2, 0),
    }


def test_truth_discovery_tie_breaks_to_smallest_value(spark):
    """Equal-confidence candidates: the winner is the smallest value,
    so the run is a pure function of the data."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
        truth_discovery,
    )

    claims = spark.createDataFrame(
        [("a", 1, "zz"), ("b", 1, "aa")],
        "source string, obj long, val string",
    )
    got = {
        r["source"]: r["trust_milli"]
        for r in truth_discovery(claims, rounds=1).collect()
    }
    assert got == {"a": 0, "b": 1000}


def test_label_votes_majority_and_summary(spark):
    """Votes emit only where LFs fire; majority breaks count ties to
    the smallest label with margin 0; lf_summary counts overlap and
    conflict exactly."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        label_votes,
        lf_summary,
        majority_label,
    )

    docs = spark.createDataFrame(
        [
            (1, "fast slow"),   # pos + neg → conflict, tie
            (2, "fast big"),    # pos + pos → overlap, no conflict
            (3, "slow"),        # single vote
            (4, "nothing"),     # abstain everywhere
        ],
        "doc_id long, text string",
    )
    lfs = [
        ("f", F.col("text").contains("fast"), "pos"),
        ("s", F.col("text").contains("slow"), "neg"),
        ("b", F.col("text").contains("big"), "pos"),
    ]
    votes = label_votes(docs, lfs)
    assert votes.count() == 5  # doc4 absent

    maj = {
        r["doc_id"]: (r["n_votes"], r["label"], r["margin"])
        for r in majority_label(votes).collect()
    }
    assert maj == {
        1: (2, "neg", 0),   # tie pos/neg → smallest label 'neg'
        2: (2, "pos", 2),   # both votes pos → one label group, margin 2-0
        3: (1, "neg", 1),
    }

    summ = {
        r["lf"]: (r["n_fired"], r["n_overlap"], r["n_conflict"])
        for r in lf_summary(votes).collect()
    }
    assert summ == {
        "f": (2, 2, 1),
        "s": (2, 1, 1),
        "b": (1, 1, 0),
    }


def test_weighted_sample_wor_exact_k_and_partition_invariance(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        weighted_sample_wor,
    )

    d = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 1).alias("w"),
    )
    got = weighted_sample_wor(d, "w", 7, by=["g"], id_col="doc_id")
    rows = got.collect()
    per_g = {}
    for r in rows:
        per_g.setdefault(r["g"], []).append((r["rk"], r["doc_id"]))
    assert set(per_g) == {"0", "1", "2"}
    for g, picks in per_g.items():
        assert sorted(rk for rk, _ in picks) == list(range(1, 8))
    # identical winner set under a different physical partitioning
    again = weighted_sample_wor(
        d.repartition(7, "doc_id"), "w", 7, by=["g"], id_col="doc_id"
    ).collect()
    assert sorted((r["g"], r["rk"], r["doc_id"]) for r in again) == sorted(
        (r["g"], r["rk"], r["doc_id"]) for r in rows
    )


def test_weighted_sample_wor_small_group_and_nonpositive_weights(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        weighted_sample_wor,
    )

    d = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 0), ("a", 3, -4), ("a", 4, 2)],
        ["g", "doc_id", "w"],
    )
    rows = weighted_sample_wor(d, "w", 10, by=["g"], id_col="doc_id").collect()
    # weight<=0 rows are excluded by contract; k beyond group size keeps all
    assert sorted(r["doc_id"] for r in rows) == [1, 4]
    assert sorted(r["rk"] for r in rows) == [1, 2]


def test_weighted_sample_wor_inclusion_tracks_weight(spark):
    """Distributional check of the E-S key: across 400 independent
    4-item groups where one item has weight 3 and three have weight 1,
    the heavy item should rank first in ≈ 3/6 of groups (binomial
    sd ≈ 2.5%; assert within 5 sd)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        weighted_sample_wor,
    )

    n_groups = 400
    d = spark.range(n_groups * 4).select(
        (F.col("id") % n_groups).alias("g"),
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_groups, 3).otherwise(1).alias("w"),
    )
    first = weighted_sample_wor(d, "w", 1, by=["g"], id_col="doc_id")
    heavy_wins = first.filter(F.col("doc_id") < n_groups).count()
    assert abs(heavy_wins / n_groups - 0.5) < 0.125


def test_frequent_itemsets_small_lattice(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        frequent_itemsets,
    )

    # 6 baskets; {m, b} in 4, {m, b, d} in 2, singles m:5 b:4 d:3 c:1
    data = [
        (1, "m"), (1, "b"), (1, "d"),
        (2, "m"), (2, "b"), (2, "d"),
        (3, "m"), (3, "b"),
        (4, "m"), (4, "b"),
        (5, "m"), (5, "d"),
        (6, "c"),
    ]
    b = spark.createDataFrame(data, ["basket_id", "item"])
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): (
            r["size"], r["support"], r["lift_num"], r["lift_den"]
        )
        for r in frequent_itemsets(b, min_support=2, max_size=3).collect()
    }
    assert got[("m", None, None)] == (1, 5, 5, 5)
    assert got[("b", None, None)] == (1, 4, 4, 4)
    assert got[("d", None, None)] == (1, 3, 3, 3)
    assert ("c", None, None) not in got  # below support
    assert got[("b", "m", None)] == (2, 4, 4 * 6, 4 * 5)
    assert got[("d", "m", None)] == (2, 3, 3 * 6, 3 * 5)
    assert got[("b", "d", None)] == (2, 2, 2 * 6, 4 * 3)
    assert got[("b", "d", "m")] == (3, 2, 2 * 36, 4 * 3 * 5)
    assert len(got) == 7


def test_frequent_itemsets_apriori_prune_blocks_candidate(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        frequent_itemsets,
    )

    # (a,b) and (a,c) frequent but (b,c) never co-occurs -> no triple
    data = (
        [(i, "a") for i in range(1, 7)]
        + [(i, "b") for i in range(1, 4)]
        + [(i, "c") for i in range(4, 7)]
    )
    b = spark.createDataFrame(data, ["basket_id", "item"])
    got = frequent_itemsets(b, min_support=2, max_size=3)
    assert got.filter(F.col("size") == 3).count() == 0
    pairs = {
        (r["item_a"], r["item_b"])
        for r in got.filter(F.col("size") == 2).collect()
    }
    assert pairs == {("a", "b"), ("a", "c")}


def test_frequent_itemsets_duplicate_rows_and_max_size(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        frequent_itemsets,
    )

    b = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (1, "y"), (2, "y")],
        ["basket_id", "item"],
    )
    got = frequent_itemsets(b, min_support=2, max_size=1).collect()
    # duplicates collapse; support counts baskets, not rows
    assert {(r["item_a"], r["support"]) for r in got} == {("x", 2), ("y", 2)}
    assert all(r["size"] == 1 for r in got)


def test_remove_repeated_substrings_cuts_all_copies(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    boiler = "one two three four"  # 4-token window repeated across docs
    docs = spark.createDataFrame(
        [
            (1, f"alpha {boiler} beta"),
            (2, f"gamma delta {boiler}"),
            (3, "unique words only here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in remove_repeated_substrings(docs, n=4).collect()
    }
    # repeated window removed from BOTH docs, no keeper
    assert got[1]["text_clean"] == "alpha beta"
    assert got[2]["text_clean"] == "gamma delta"
    assert got[3]["text_clean"] == "unique words only here"
    assert got[1]["n_tokens"] == 6 and got[1]["n_kept"] == 2
    assert got[3]["n_kept"] == 4


def test_remove_repeated_substrings_within_doc_and_overlap(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    # "a b a b a b" with n=2: windows (a b),(b a),(a b),(b a),(a b)
    # every window repeats -> whole doc removed
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in remove_repeated_substrings(docs, n=2).collect()
    }
    assert got[1]["n_kept"] == 0 and got[1]["text_clean"] == ""
    # doc shorter than n emits no windows and keeps everything
    assert got[2]["n_kept"] == 2 and got[2]["text_clean"] == "x y"


def test_remove_repeated_substrings_portable_matches_default(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    docs = spark.createDataFrame(
        [(i, f"shared prefix tokens here tail{i} more w{i % 2}")
         for i in range(6)],
        ["doc_id", "text"],
    )
    a = sorted(
        (r["doc_id"], r["n_kept"], r["text_clean"])
        for r in remove_repeated_substrings(docs, n=4).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_kept"], r["text_clean"])
        for r in remove_repeated_substrings(docs, n=4, portable=True).collect()
    )
    assert a == b


def test_k_anonymity_picks_minimal_qualifying_level(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.pii import (
        k_anonymity_generalize,
    )

    # values 0..19: level0 buckets of 2 (size 2 < k), level1 buckets of
    # 10 (size 10 >= k) -> chosen level must be 1, not 2
    df = spark.range(20).select(
        F.lit("g").alias("seg"),
        F.col("id").alias("v"),
        (F.col("id") % 3).alias("sens"),
    )
    ladder = [
        F.floor(F.col("v") / 2),
        F.floor(F.col("v") / 10),
        F.lit(0),
    ]
    got = k_anonymity_generalize(
        df, ["seg"], ladder, k=10, sensitive_col="sens", l_diversity=3
    ).collect()
    assert {r["level"] for r in got} == {1}
    assert sorted((r["bucket"], r["group_size"]) for r in got) == [
        (0, 10), (1, 10)
    ]
    assert all(r["l_ok"] for r in got)


def test_k_anonymity_falls_back_to_coarsest_with_violations_visible(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.pii import (
        k_anonymity_generalize,
    )

    # one static slice has 3 rows: no level can reach k=5 -> coarsest
    # level returned, the undersized group still present
    df = spark.createDataFrame(
        [("a", i, i % 2) for i in range(12)]
        + [("b", i, 0) for i in range(3)],
        ["seg", "v", "sens"],
    )
    ladder = [F.floor(F.col("v") / 4), F.lit(0)]
    got = k_anonymity_generalize(
        df, ["seg"], ladder, k=5, sensitive_col="sens", l_diversity=2
    ).collect()
    assert {r["level"] for r in got} == {1}
    by_seg = {r["seg"]: r for r in got}
    assert by_seg["b"]["group_size"] == 3
    assert not by_seg["b"]["l_ok"]  # homogeneous sensitive
    assert by_seg["a"]["group_size"] == 12 and by_seg["a"]["l_ok"]


def test_neyman_allocation_favors_variable_strata(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        neyman_allocation,
    )

    # stratum a: 100 rows constant (S=0); b: 100 rows spread wide
    rows = [("a", 50) for _ in range(100)] + [
        ("b", v) for v in range(0, 1000, 10)
    ]
    df = spark.createDataFrame(rows, ["s", "v"])
    got = {r["s"]: r for r in neyman_allocation(
        df, ["s"], "v", total_n=40).collect()}
    assert got["a"]["sse"] == 0 and got["a"]["s_h"] == 0
    assert got["a"]["alloc"] == 0
    assert got["b"]["alloc"] == 40
    assert got["a"]["n_rows"] == got["b"]["n_rows"] == 100


def test_neyman_allocation_sums_to_budget_and_caps(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = (
        [("a", v) for v in (0, 100)] * 3        # 6 rows, some spread
        + [("b", v) for v in range(50)]          # 50 rows, spread
        + [("c", v * 7) for v in range(20)]      # 20 rows, spread
    )
    df = spark.createDataFrame(rows, ["s", "v"])
    got = neyman_allocation(df, ["s"], "v", total_n=30).collect()
    assert sum(r["alloc"] for r in got) == 30
    for r in got:
        assert 0 <= r["alloc"] <= r["n_rows"]
    # cap regime: budget larger than a small stratum's size
    got2 = {r["s"]: r for r in neyman_allocation(
        df, ["s"], "v", total_n=70).collect()}
    assert got2["a"]["alloc"] <= 6


def test_leakage_safe_split_group_invariant(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        leakage_safe_split,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 40}") for i in range(400)], ["doc_id", "grp_in"]
    )
    got = leakage_safe_split(df, "grp_in").collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # every group entirely on one side
    assert all(len(s) == 1 for s in by_grp.values())
    splits = {r["split"] for r in got}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # bucket drives split consistently
    for r in got:
        want = (
            "train" if r["bucket"] < 800
            else "val" if r["bucket"] < 900 else "test"
        )
        assert r["split"] == want


def test_cusum_changepoints_matches_recurrence(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        cusum_changepoints,
    )

    xs = [5, 5, 5, 9, 9, 9, 9, 1, 1, 5]
    ser = spark.createDataFrame(
        [("a", t, x) for t, x in enumerate(xs)], ["s", "t", "x"]
    )
    got = {
        r["t"]: r
        for r in cusum_changepoints(
            ser, ["s"], "t", "x", k_milli=5000, h_milli=7000
        ).collect()
    }
    sp = sn = 0
    for t, x in enumerate(xs):
        sp = max(0, sp + x * 1000 - 5000)
        sn = max(0, sn + 5000 - x * 1000)
        assert got[t]["s_pos"] == sp, t
        assert got[t]["s_neg"] == sn, t
        assert got[t]["alarm"] == (sp >= 7000 or sn >= 7000)
    assert got[5]["alarm"] and not got[3]["alarm"]


def test_cusum_default_reference_is_series_mean(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        cusum_changepoints,
    )

    # two series, different levels: each uses its own integer mean, so a
    # flat series never alarms regardless of its absolute level
    rows = [("lo", t, 2) for t in range(10)] + [
        ("hi", t, 50) for t in range(10)
    ]
    ser = spark.createDataFrame(rows, ["s", "t", "x"])
    got = cusum_changepoints(ser, ["s"], "t", "x", h_milli=1000).collect()
    assert all(r["s_pos"] == 0 and r["s_neg"] == 0 for r in got)
    assert not any(r["alarm"] for r in got)


def test_covisitation_similarity_normalization(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        covisitation_similarity,
    )

    # items 1,2 fully co-visited by 6 users (cos=1); item 3 visited by
    # 12 users, 6 shared with item 1 (cos = 6/sqrt(6*12) ~ 0.707)
    rows = (
        [(u, 1) for u in range(6)]
        + [(u, 2) for u in range(6)]
        + [(u, 3) for u in range(12)]
        + [(5, 1), (5, 2)]  # duplicates must collapse
    )
    df = spark.createDataFrame(rows, ["u", "item"])
    strict = {
        (r["item_a"], r["item_b"]): r
        for r in covisitation_similarity(
            df, "u", "item", min_count=5, tau_millis=800
        ).collect()
    }
    assert set(strict) == {(1, 2)}
    assert strict[(1, 2)]["c"] == 6
    assert strict[(1, 2)]["n_a"] == 6 and strict[(1, 2)]["n_b"] == 6
    loose = {
        (r["item_a"], r["item_b"])
        for r in covisitation_similarity(
            df, "u", "item", min_count=5, tau_millis=700
        ).collect()
    }
    assert loose == {(1, 2), (1, 3), (2, 3)}


def test_bh_fdr_step_up_walk_exact(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        bh_fdr_select,
    )

    # m=10, alpha=0.2: thresholds alpha*k/m = 20,40,60,... millis.
    # p = [10, 30, 70, 500x7]: k=1: 10<=20 ok; k=2: 30<=40 ok;
    # k=3: 70<=60 no; k>3 no. k*=2 -> select p<=30.
    ps = [10, 30, 70] + [500] * 7
    df = spark.createDataFrame(
        [("f", i, p) for i, p in enumerate(ps)], ["fam", "uid", "p_milli"]
    )
    got = {r["uid"]: r for r in bh_fdr_select(
        df, ["fam"], "uid", alpha_milli=200).collect()}
    assert [got[i]["selected"] for i in range(3)] == [True, True, False]
    assert not any(got[i]["selected"] for i in range(3, 10))
    # step-up beats step-down: p=[19,39,59] all qualify at their own k
    df2 = spark.createDataFrame(
        [("f", i, p) for i, p in enumerate([19, 39, 59] + [900] * 7)],
        ["fam", "uid", "p_milli"],
    )
    got2 = {r["uid"]: r["selected"] for r in bh_fdr_select(
        df2, ["fam"], "uid", alpha_milli=200).collect()}
    assert got2[0] and got2[1] and got2[2] and not got2[5]


def test_bh_fdr_ties_select_together_and_empty(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        bh_fdr_select,
    )

    # two equal p at the boundary: if either position qualifies, BOTH
    # select (selection by value, not position). m=4, alpha=0.5:
    # thresholds 125,250,375,500; p=[250,250,900,900]: k=2: 250<=250 ok
    df = spark.createDataFrame(
        [("f", 1, 250), ("f", 2, 250), ("f", 3, 900), ("f", 4, 900)],
        ["fam", "uid", "p_milli"],
    )
    got = {r["uid"]: r["selected"] for r in bh_fdr_select(
        df, ["fam"], "uid", alpha_milli=500).collect()}
    assert got[1] and got[2] and not got[3] and not got[4]
    # all-null family: nothing qualifies, nothing selected
    df2 = spark.createDataFrame(
        [("g", i, 800 + i) for i in range(5)], ["fam", "uid", "p_milli"]
    )
    assert not any(
        r["selected"]
        for r in bh_fdr_select(df2, ["fam"], "uid", alpha_milli=200).collect()
    )


def test_katz_centrality_path_graph_exact(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        katz_centrality,
    )

    # path 1-2-3: deg = [1,2,1]; walks2 = [2,2,2]; walks3 = [2,4,2]
    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {
        r["node"]: r["katz_q20"]
        for r in katz_centrality(e, levels=3, beta_log2=3).collect()
    }
    w1, w2, w3 = 1 << 17, 1 << 14, 1 << 11
    assert got[1] == 1 * w1 + 2 * w2 + 2 * w3
    assert got[2] == 2 * w1 + 2 * w2 + 4 * w3
    assert got[3] == 1 * w1 + 2 * w2 + 2 * w3


def test_katz_centrality_rewards_walks_not_degree_share(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        katz_centrality,
    )

    # hub with 4 leaves: hub walks dominate; each leaf reaches the other
    # 3 leaves in 2 steps through the hub
    e = spark.createDataFrame([(0, i) for i in range(1, 5)], ["src", "dst"])
    got = {
        r["node"]: r["katz_q20"]
        for r in katz_centrality(e, levels=2, beta_log2=3).collect()
    }
    w1, w2 = 1 << 17, 1 << 14
    assert got[0] == 4 * w1 + 4 * w2
    for leaf in range(1, 5):
        assert got[leaf] == 1 * w1 + 4 * w2


def test_sprt_decisions_walk_and_first_crossing(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        sprt_decisions,
    )

    # +3 per success, -2 per failure, accept H1 at +7, H0 at -7
    seq_h1 = [1, 1, 0, 1, 1]      # 3,6,4,7 -> crosses at n=4
    seq_h0 = [0, 0, 0, 0, 1]      # -2,-4,-6,-8 -> crosses at n=4
    seq_un = [1, 0, 1, 0]         # 3,1,4,2 -> never
    rows = (
        [("a", i, bool(s)) for i, s in enumerate(seq_h1)]
        + [("b", i, bool(s)) for i, s in enumerate(seq_h0)]
        + [("c", i, bool(s)) for i, s in enumerate(seq_un)]
    )
    df = spark.createDataFrame(rows, ["u", "t", "success"])
    got = {r["u"]: r for r in sprt_decisions(
        df, ["u"], "t", "success", 3, -2, 7, -7).collect()}
    assert got["a"]["decision"] == "h1"
    assert got["a"]["n_at_decision"] == 4
    assert got["a"]["llr_q20_at_decision"] == 7
    assert got["a"]["n_trials"] == 5
    assert got["b"]["decision"] == "h0"
    assert got["b"]["n_at_decision"] == 4
    assert got["b"]["llr_q20_at_decision"] == -8
    assert got["c"]["decision"] == "undecided"
    assert got["c"]["n_at_decision"] == 4
    assert got["c"]["llr_q20_at_decision"] == 2
    # exactly one row per series
    assert len(got) == 3


def test_sprt_stops_at_first_not_deepest_crossing(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        sprt_decisions,
    )

    # crosses H1 at n=3 (llr 9), keeps rising after; decision must
    # report the n=3 state
    df = spark.createDataFrame(
        [("u", i, True) for i in range(6)], ["k", "t", "success"]
    )
    got = sprt_decisions(df, ["k"], "t", "success", 3, -2, 8, -8).collect()
    assert len(got) == 1
    assert got[0]["n_at_decision"] == 3 and got[0]["llr_q20_at_decision"] == 9


def test_ams_f2_unbiased_scale_and_merge_linearity(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        ams_f2,
    )

    # skewed stream: one hot item (f=60) among 40 singletons
    rows = [("g", "hot")] * 60 + [("g", f"t{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "item"])
    got = ams_f2(df, "item", by=["g"], lanes=32).collect()[0]
    assert got["f2_exact"] == 60 * 60 + 40
    # tug-of-war with 32 lanes: within 3/sqrt(32) relative of exact w.h.p.
    assert abs(got["f2_est"] - got["f2_exact"]) < got["f2_exact"] * 0.8
    assert got["n_lanes"] == 32


def test_ams_f2_exact_join_size_meaning(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        ams_f2,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", "b")], ["g", "item"]
    )
    got = ams_f2(df, "item", by=["g"], lanes=4).collect()[0]
    # F2 = 2^2 + 1 = 5 == self-equi-join row count
    assert got["f2_exact"] == 5


def test_edit_distance_join_qgram_exact_vs_bruteforce(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        edit_distance_join_qgram,
    )

    surfaces = [
        "analysis", "analysi", "analys", "anxlysis",  # 1-2 edit chain
        "climate", "climbte", "climat",
        "data", "date", "dat", "cat",                 # short stratum
        "completely-different-token",
    ]
    df = spark.createDataFrame([(s,) for s in surfaces], ["surface"])
    got = sorted(
        (r["surface_a"], r["surface_b"], r["dist"])
        for r in edit_distance_join_qgram(df, k=2, q=2).collect()
    )
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = sorted(
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(surfaces), 2)
        if lev(a, b) <= 2
    )
    assert got == want
    assert ("analys", "analysis", 2) in got     # long stratum k=2
    assert ("cat", "dat", 1) in got             # short stratum
    assert ("dat", "date", 1) in got            # short-long boundary


def test_edit_distance_join_qgram_multiset_counting(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        edit_distance_join_qgram,
    )

    # repeated grams: 'aaaaaaaa' vs 'aaaaaaab' share gram 'aa' many
    # times — the multiset count must see 6 shared copies, distinct
    # grams would see only 1 and wrongly prune
    df = spark.createDataFrame(
        [("aaaaaaaa",), ("aaaaaaab",), ("bbbbbbbb",)], ["surface"]
    )
    got = {
        (r["surface_a"], r["surface_b"]): r["dist"]
        for r in edit_distance_join_qgram(df, k=2, q=2).collect()
    }
    assert got == {("aaaaaaaa", "aaaaaaab"): 1}


def test_consensus_clusters_bridge_different_evidence(spark):
    """A doc chain connected only ACROSS families must merge: doc 1-2
    are exact duplicates, doc 2-3 are high-Jaccard near-dups, so
    {1,2,3} is one consensus cluster even though no single family links
    1 to 3."""
    import __spark_entry__ as entry

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = [
        (1, base),
        (2, base),                       # exact dup of 1
        (3, base + " extra"),            # near-dup of 1/2 (jaccard)
        (4, "completely different text about other things entirely "
            "with many unrelated words in a long enough sequence"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.write.mode("overwrite").parquet("/tmp/q158_docs/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in entry.queries()["q158_consensus_clusters"](
            spark, "/tmp/q158_docs"
        ).collect()
    }
    assert set(got) == {1, 2, 3}  # 4 is a singleton, not emitted
    assert got[1]["component"] == got[2]["component"] == got[3]["component"]
    assert all(r["n_members"] == 3 for r in got.values())


def test_profile_table_nulls_mode_and_counts(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b"), (None, "a")],
        ["k", "v"],
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    kv = got["v"]
    assert kv["n_rows"] == 5 and kv["n_null"] == 1
    assert kv["n_distinct"] == 2
    assert kv["top_value"] == "a" and kv["top_count"] == 3
    assert kv["min_value"] == "a" and kv["max_value"] == "b"
    kk = got["k"]
    assert kk["n_null"] == 1 and kk["n_distinct"] == 4
    # all-singleton column: mode is the lexicographically smallest value
    assert kk["top_value"] == "1" and kk["top_count"] == 1


def test_profile_table_all_null_column(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        profile_table,
    )

    df = spark.createDataFrame([(1, None), (2, None)], "a int, b string")
    got = {r["column"]: r for r in profile_table(df, ["b"]).collect()}
    b = got["b"]
    assert b["n_null"] == 2 and b["n_distinct"] == 0
    assert b["top_value"] == "<NULL>" and b["top_count"] == 2
    assert b["min_value"] is None and b["max_value"] is None


def test_dq_checks_mixed_outcomes(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        dq_checks,
    )

    child = spark.createDataFrame(
        [(1, 10, 5), (1, 11, 50), (2, 99, 500), (3, None, -1)],
        ["k", "ref", "val"],
    )
    parent = spark.createDataFrame([(10,), (11,)], ["pk"])
    got = {
        r["check"]: r
        for r in dq_checks(
            child,
            unique_cols=["k"],
            not_null_cols=["ref"],
            fk=[("ref->parent", "ref", parent, "pk")],
            ranges=[("val", 0, 100)],
        ).collect()
    }
    assert got["unique:k"]["n_violations"] == 1  # k=1 twice -> 1 extra
    assert not got["unique:k"]["passed"]
    assert got["not_null:ref"]["n_violations"] == 1
    assert got["fk:ref->parent"]["n_violations"] == 1  # 99 orphan; NULL skipped
    assert got["range:val"]["n_violations"] == 2  # 500 and -1
    assert not any(r["passed"] for r in got.values())


def test_dq_checks_all_pass_and_empty_suite(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.analytics import (
        dq_checks,
    )

    df = spark.createDataFrame([(1, 5), (2, 6)], ["k", "v"])
    got = dq_checks(df, unique_cols=["k"], ranges=[("v", 0, 10)]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in got)
    assert dq_checks(df).count() == 0


def test_remove_repeated_substrings_saturated_doc_span_merge(spark):
    """Repeat-saturated doc (every window repeated): the span-merge path
    must collapse all starts into one span and delete everything."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    body = " ".join(f"w{i % 9}" for i in range(60))  # 9-periodic stream
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "unique tail piece only")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in remove_repeated_substrings(
        docs, n=4).collect()}
    assert got[1]["n_kept"] == 0 and got[2]["n_kept"] == 0
    assert got[3]["n_kept"] == 4


def test_poisson_bootstrap_determinism_and_moments(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        poisson_bootstrap,
    )

    d = spark.range(500).select(
        F.lit("g").alias("grp"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 + 1).alias("v"),
    )
    got = poisson_bootstrap(d, ["grp"], "v", n_resamples=16).collect()
    assert len(got) == 16
    assert sorted(r["b"] for r in got) == list(range(1, 17))
    # E[n_eff] = n = 500, sd = sqrt(500) ~ 22; all resamples within 6 sd
    for r in got:
        assert abs(r["n_eff"] - 500) < 140
        # weighted mean tracks the population mean 5.5 loosely
        assert 4.0 < r["sum_wx"] / r["n_eff"] < 7.0
    # identical under different physical partitioning
    again = poisson_bootstrap(
        d.repartition(7, "doc_id"), ["grp"], "v", n_resamples=16
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_poisson_bootstrap_resamples_differ_and_weights_bounded(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        poisson_bootstrap,
        POISSON1_TAIL_Q20,
    )

    assert len(POISSON1_TAIL_Q20) == 8  # weight capped at 8
    d = spark.range(50).select(
        F.lit("g").alias("grp"),
        F.col("id").alias("doc_id"),
        F.lit(1).alias("v"),
    )
    got = poisson_bootstrap(d, ["grp"], "v", n_resamples=8).collect()
    # with v=1, sum_wx == n_eff, and the resamples are not all equal
    assert all(r["sum_wx"] == r["n_eff"] for r in got)
    assert len({r["n_eff"] for r in got}) > 1


def test_clustering_pair_metrics_exact_counts(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        clustering_pair_metrics,
    )

    # gold: {1,2,3}, {4,5}; pred merges everything: {1..5}
    pred = spark.createDataFrame(
        [(i, "P") for i in range(1, 6)], ["doc_id", "pred"]
    )
    gold = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")],
        ["doc_id", "gold"],
    )
    r = clustering_pair_metrics(pred, gold).collect()[0]
    assert r["n_items"] == 5
    assert r["gold_pairs"] == 3 + 1
    assert r["pred_pairs"] == 10
    assert r["tp_pairs"] == 4
    assert r["r_micro"] == 1000000          # over-merge: perfect recall
    assert r["p_micro"] == 400000           # 4/10
    assert r["f1_micro"] == (2000000 * 8) // (20 + 8)


def test_clustering_pair_metrics_restricts_to_common_ids_and_zero(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        clustering_pair_metrics,
    )

    pred = spark.createDataFrame(
        [(1, "x"), (2, "y"), (9, "z")], ["doc_id", "pred"]
    )
    gold = spark.createDataFrame(
        [(1, "g"), (2, "g")], ["doc_id", "gold"]
    )
    r = clustering_pair_metrics(pred, gold).collect()[0]
    # id 9 excluded; pred has no co-clustered pair among common ids
    assert r["n_items"] == 2
    assert r["pred_pairs"] == 0 and r["gold_pairs"] == 1
    assert r["tp_pairs"] == 0
    assert r["p_micro"] == 0 and r["r_micro"] == 0
