"""KG-completion / embedding-training operators: Resource-Allocation link
prediction, filtered negative sampling, deterministic random walks."""

from __future__ import annotations

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
    random_walks,
    resource_allocation,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.triples import (
    negative_triples,
)

SCALE = 1 << 40


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_resource_allocation_hand_graph(spark):
    # a-b, a-c, b-c, c-d: the only non-adjacent pairs with a common
    # neighbor are (a,d) and (b,d), both through c (deg 3).
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")])
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["ra_score"])
        for r in resource_allocation(e).collect()
    }
    assert got == {
        ("a", "d"): (1, SCALE // 3),
        ("b", "d"): (1, SCALE // 3),
    }


def test_resource_allocation_ignores_direction_and_dups(spark):
    e1 = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")])
    e2 = _edges(
        spark,
        [("b", "a"), ("c", "a"), ("b", "c"), ("c", "b"), ("d", "c"), ("c", "d")],
    )
    r1 = sorted(map(tuple, resource_allocation(e1).collect()))
    r2 = sorted(map(tuple, resource_allocation(e2).collect()))
    assert r1 == r2


def test_resource_allocation_max_degree_excludes_hub(spark):
    # With max_degree=2 the only shared neighbor c (deg 3) is no longer
    # an eligible middle node: no predicted links survive.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")])
    assert resource_allocation(e, max_degree=2).count() == 0


def test_random_walks_valid_and_deterministic(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    e = _edges(spark, pairs)
    out = random_walks(e, walk_len=5, walks_per_node=2)
    rows = [tuple(r) for r in out.collect()]
    nodes = {"a", "b", "c", "d"}
    # every (start, walk) chain is complete: steps 0..5, start at start
    chains = {}
    for start, walk, step, node in rows:
        chains.setdefault((start, walk), {})[step] = node
    assert set(chains) == {(n, w) for n in nodes for w in (0, 1)}
    und = set()
    for u, v in pairs:
        und.add((u, v))
        und.add((v, u))
    for (start, _), steps in chains.items():
        assert sorted(steps) == [0, 1, 2, 3, 4, 5]
        assert steps[0] == start
        for t in range(5):
            assert (steps[t], steps[t + 1]) in und
    # deterministic: identical on re-run
    again = sorted(tuple(r) for r in random_walks(
        e, walk_len=5, walks_per_node=2
    ).collect())
    assert sorted(rows) == again


def test_negative_triples_filtered_and_bounded(spark):
    true_rows = [
        ("s1", "P", "o1"),
        ("s1", "P", "o2"),
        ("s2", "P", "o1"),
        ("s2", "Q", "o3"),
    ]
    triples = spark.createDataFrame(true_rows, ["subj", "pred", "obj"])
    ents = spark.createDataFrame(
        [(f"o{i}",) for i in range(1, 9)], ["entity"]
    )
    neg = negative_triples(triples, ents, k=4)
    rows = [tuple(r) for r in neg.collect()]
    true_set = set(true_rows)
    ent_set = {f"o{i}" for i in range(1, 9)}
    assert rows, "expected at least one surviving negative"
    assert len(rows) <= 4 * len(true_rows)
    for subj, pred, obj_neg, neg_idx in rows:
        assert (subj, pred, obj_neg) not in true_set
        assert obj_neg in ent_set
        assert 0 <= neg_idx < 4
    # deterministic across invocations
    again = sorted(
        tuple(r) for r in negative_triples(triples, ents, k=4).collect()
    )
    assert sorted(rows) == again


def test_negative_triples_empty_entities_raises(spark):
    triples = spark.createDataFrame([("s", "P", "o")], ["subj", "pred", "obj"])
    empty = spark.createDataFrame([], "entity string")
    import pytest

    with pytest.raises(ValueError, match="empty"):
        negative_triples(triples, empty)


def test_stratified_split_exact_proportions(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        stratified_split,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_split(
        df, ["lang"], {"train": 800, "val": 100, "test": 100}
    )
    got = out.groupBy("lang", "split").count().collect()
    counts = {(r["lang"], r["split"]): r["count"] for r in got}
    # de stratum: 67 rows -> train (800*67)//1000 = 53, val 60-53=7, rest 7
    assert counts[("de", "train")] == 53
    assert counts[("de", "val")] == (900 * 67) // 1000 - 53
    assert counts[("de", "test")] == 67 - (900 * 67) // 1000
    # en stratum: 133 rows
    assert counts[("en", "train")] == (800 * 133) // 1000
    # every row assigned exactly once, deterministically
    assert out.count() == 200
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(
        tuple(r)
        for r in stratified_split(
            df, ["lang"], {"train": 800, "val": 100, "test": 100}
        ).collect()
    )
    assert a == b


def test_stratified_split_validates_weights(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sampling import (
        stratified_split,
    )
    import pytest

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError, match="sum"):
        stratified_split(df, ["lang"], {"train": 900, "val": 50})
    with pytest.raises(ValueError, match="positive"):
        stratified_split(df, ["lang"], {"train": 1100, "val": -100})


def test_edge_intervals_islands(spark):
    from datetime import datetime

    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        edge_intervals,
    )

    t = lambda m: datetime(2026, 1, 1, 0, m)
    rows = [
        # key (1, "p"): A,A,B,A -> three intervals (A revisits = new run)
        (1, "p", t(0), "A"),
        (1, "p", t(1), "A"),
        (1, "p", t(2), "B"),
        (1, "p", t(3), "A"),
        # key (2, "p"): single run
        (2, "p", t(0), "X"),
        (2, "p", t(5), "X"),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "ts", "obj"])
    out = edge_intervals(df, ["subj", "pred"], "obj")
    got = sorted(
        (r["subj"], r["pred"], r["value"], r["valid_from"].minute,
         r["valid_to"].minute, r["n_obs"], r["revision"])
        for r in out.collect()
    )
    assert got == [
        (1, "p", "A", 0, 1, 2, 1),
        (1, "p", "A", 3, 3, 1, 3),
        (1, "p", "B", 2, 2, 1, 2),
        (2, "p", "X", 0, 5, 2, 1),
    ]


def test_k_truss_hand_graph(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        k_truss,
    )
    import pytest

    # K4 on {1,2,3,4} (each edge in 2 triangles) + pendant edge (4,5)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    def edges(k):
        return sorted(
            (r["u"], r["v"]) for r in k_truss(df, k=k).collect()
        )
    assert edges(3) == sorted(k4)      # pendant dies, triangles stay
    assert edges(4) == sorted(k4)      # K4 is a 4-truss
    assert edges(5) == []              # support 2 < 3 -> full cascade
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(df, k=2)


def test_personalized_pagerank_dangling_to_seeds(spark):
    """Directed chain with a dangling sink; restart AND dangling mass
    must flow only to the seed. Verified against a Python replay of the
    integer recurrence."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        pagerank,
    )
    import pytest

    edges = [(1, 2, 1), (2, 3, 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(
            df, weight_col="w", iterations=4, seeds=seeds
        ).collect()
    }

    scale, d = 10**9, 85
    nodes, out_w = [1, 2, 3], {1: 1, 2: 1}
    base_each = ((100 - d) * scale // 100) * len(nodes) // 1
    r = {n: scale for n in nodes}
    for _ in range(4):
        recv = {n: 0 for n in nodes}
        for u, v, w in edges:
            recv[v] += (r[u] * w) // out_w[u]
        d_share = sum(r[n] for n in nodes if n not in out_w) // 1
        r = {
            n: (base_each if n == 1 else 0)
            + (d * (recv[n] + (d_share if n == 1 else 0))) // 100
            for n in nodes
        }
    assert got == r

    with pytest.raises(ValueError, match="seed"):
        pagerank(
            df,
            weight_col="w",
            seeds=spark.createDataFrame([(99,)], ["node"]),
        ).collect()


def test_chunk_documents_windows(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.packing import (
        chunk_documents,
    )
    import pytest

    long_doc = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, long_doc), (2, "a b c"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["n_tok"],
                                        r["chunk_text"])
        for r in out.collect()
    }
    # doc 1: 100 tokens, stride 48 -> chunks at 0 (64), 48 (52)
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    assert rows[(1, 0)][0:2] == (0, 64)
    assert rows[(1, 1)][0:2] == (48, 52)
    assert rows[(1, 1)][2].split(" ")[0] == "t48"
    assert rows[(1, 1)][2].split(" ")[-1] == "t99"
    assert rows[(2, 0)] == (0, 3, "a b c")
    # overlap: last 16 tokens of chunk 0 are the first 16 of chunk 1
    assert rows[(1, 0)][2].split(" ")[48:] == rows[(1, 1)][2].split(" ")[:16]
    # narrow plan: no shuffle anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=16, overlap=16)


def _ref_hits(edge_list, iterations, scale):
    """Pure-python replay of the integer HITS recurrence."""
    agg = {}
    for u, v, w in edge_list:
        if u != v:
            agg[(u, v)] = agg.get((u, v), 0) + w
    nodes = sorted({u for u, _ in agg} | {v for _, v in agg})
    hub = {n: scale for n in nodes}

    def half(scores, forward):
        raw = {n: 0 for n in nodes}
        for (u, v), w in agg.items():
            if forward:
                raw[v] += scores[u] * w
            else:
                raw[u] += scores[v] * w
        mx = max(max(raw.values()), 1)
        return {n: (raw[n] * scale) // mx for n in nodes}

    for _ in range(iterations):
        auth = half(hub, True)
        hub = half(auth, False)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_integer_reference(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        hits,
    )

    edge_list = [
        (1, 3, 2), (2, 3, 1), (1, 4, 1), (2, 4, 3), (3, 5, 1),
        (5, 1, 2), (4, 2, 1), (2, 3, 4),  # dup edge: weights sum
        (3, 3, 9),  # self loop: dropped
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst", "w"])
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df, weight_col="w", iterations=5).collect()
    }
    assert got == _ref_hits(edge_list, 5, 10**6)


def test_hits_star_structure(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        hits,
    )

    # a,b -> c : c is the authority, a,b are the (equal) hubs
    df = spark.createDataFrame(
        [("a", "c"), ("b", "c")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df, iterations=3).collect()
    }
    assert got["c"][1] == 10**6 and got["c"][0] == 0
    assert got["a"] == got["b"] == (10**6, 0)


def _ref_sssp(edge_list, seeds, rounds):
    """Bounded-round Bellman-Ford with full relaxation per round."""
    adj = {}
    for u, v, w in edge_list:
        if u == v:
            continue
        for a, b in ((u, v), (v, u)):
            adj[(a, b)] = min(adj.get((a, b), w), w)
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for (u, v), w in adj.items():
            if u in dist and dist[u] + w < new.get(v, float("inf")):
                new[v] = dist[u] + w
        dist = new
    return dist


def test_shortest_paths_weighted_vs_hops(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        shortest_paths,
    )

    # s-x direct costs 10; s-a-b-x costs 3: weighted picks the long way
    edge_list = [("s", "x", 10), ("s", "a", 1), ("a", "b", 1), ("b", "x", 1)]
    df = spark.createDataFrame(edge_list, ["src", "dst", "w"])
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(df, seeds, weight_col="w").collect()
    }
    assert got == {"s": 0, "a": 1, "b": 2, "x": 3}
    # bounded rounds: with 1 round only the direct edges relax
    got1 = {
        r["node"]: r["dist"]
        for r in shortest_paths(
            df, seeds, weight_col="w", max_rounds=1
        ).collect()
    }
    assert got1 == {"s": 0, "a": 1, "x": 10}


def test_shortest_paths_matches_reference(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        shortest_paths,
    )

    # deterministic pseudo-random graph, multi-source, parallel edges
    edge_list = [
        (i % 7, (i * 3 + 1) % 7, (i * 5) % 9 + 1) for i in range(25)
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,), (3,)], ["node"])
    for rounds in (1, 2, 4):
        got = {
            r["node"]: r["dist"]
            for r in shortest_paths(
                df, seeds, weight_col="w", max_rounds=rounds
            ).collect()
        }
        assert got == _ref_sssp(edge_list, {0, 3}, rounds), rounds


def _port_md5(s, seed):
    import hashlib

    return int(hashlib.md5(f"{s}\x1f{seed}".encode()).hexdigest()[:15], 16)


def test_neighborhood_function_exact_below_k(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        neighborhood_function,
    )

    # path a-b-c-d-e: ball sizes at radius 2 are 3,4,5,4,3
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(path, ["src", "dst"])
    got = {
        r["node"]: (r["n_kept"], r["est_reach"])
        for r in neighborhood_function(df, radius=2, k=16).collect()
    }
    # |ball| < k  =>  exact counts
    assert {n: e for n, (nk, e) in got.items()} == {
        "a": 3, "b": 4, "c": 5, "d": 4, "e": 3
    }
    assert all(nk == e for nk, e in got.values())


def test_neighborhood_function_saturated(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        neighborhood_function,
    )

    # star: hub reaches all 20 leaves at radius 1; k=8 saturates
    leaves = [("hub", f"l{i:02d}") for i in range(20)]
    df = spark.createDataFrame(leaves, ["src", "dst"])
    got = {
        r["node"]: (r["n_kept"], r["est_reach"])
        for r in neighborhood_function(df, radius=1, k=8).collect()
    }
    # leaves see {self, hub}: exact 2
    assert got["l00"] == (2, 2)
    # hub saturates: replay the estimator on the same md5 hashes
    hashes = sorted(
        _port_md5(n, "anf") for n in ["hub"] + [f"l{i:02d}" for i in range(20)]
    )
    import math

    want = math.floor(7.0 * float(1 << 60) / hashes[7])
    assert got["hub"] == (8, want)
    # estimate is in the right ballpark of the true 21
    assert 5 <= got["hub"][1] <= 80


def test_sample_neighbors_fanout_and_determinism(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        sample_neighbors,
    )
    import pytest

    # hub with 10 leaves + a 3-cycle
    edge_list = [("hub", f"l{i}") for i in range(10)] + [
        ("x", "y"), ("y", "z"), ("z", "x"), ("x", "hub")
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    out = sample_neighbors(df, fanouts=[3, 2]).collect()
    rows = {(r.root, r.hop, r.u, r.v) for r in out}
    assert len(rows) == len(out)  # edge-set semantics: no dup rows
    # hop-1 fanout bound: every root samples <= 3 neighbors
    from collections import Counter

    h1 = Counter(r.root for r in out if r.hop == 1)
    assert max(h1.values()) <= 3
    # hub has 11 neighbors but contributes only 3 — degree never leaks
    assert h1["hub"] == 3
    # hop-2 expands only hop-1 children, <= 2 each
    h1_children = {(r.root, r.v) for r in out if r.hop == 1}
    h2_parents = Counter((r.root, r.u) for r in out if r.hop == 2)
    assert set(h2_parents) <= h1_children
    assert max(h2_parents.values()) <= 2
    # deterministic: a rerun samples the identical edge set
    again = {
        (r.root, r.hop, r.u, r.v)
        for r in sample_neighbors(df, fanouts=[3, 2]).collect()
    }
    assert again == rows
    # a leaf's sample is hash-addressed: independent of list order
    shuffled = spark.createDataFrame(edge_list[::-1], ["src", "dst"])
    assert {
        (r.root, r.hop, r.u, r.v)
        for r in sample_neighbors(shuffled, fanouts=[3, 2]).collect()
    } == rows
    with pytest.raises(ValueError):
        sample_neighbors(df, fanouts=[])


def _kruskal(n_edges):
    """Reference MSF under the total order (w, a, b): union-find Kruskal."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted(n_edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_minimum_spanning_forest_ties_and_forest(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        minimum_spanning_forest,
    )

    # square + diagonal with a weight tie: (w=2, a, b) order must pick
    # ("a","c") over ("b","c"); plus a disconnected 2-node island
    edges = [
        ("a", "b", 1), ("b", "c", 2), ("c", "d", 1), ("d", "a", 3),
        ("a", "c", 2), ("x", "y", 7),
        ("b", "a", 9),  # parallel reversed edge collapses to min w=1
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {
        (r.src, r.dst, r.weight)
        for r in minimum_spanning_forest(df).collect()
    }
    assert got == {("a", "b", 1), ("c", "d", 1), ("a", "c", 2), ("x", "y", 7)}


def test_minimum_spanning_forest_matches_kruskal_random(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        minimum_spanning_forest,
    )
    import random

    rng = random.Random(81)
    nodes = [f"n{i:02d}" for i in range(40)]
    seen = set()
    for _ in range(160):
        a, b = rng.sample(nodes, 2)
        a, b = min(a, b), max(a, b)
        if (a, b) not in seen:
            seen.add((a, b))
    # small weight range forces many ties -> exercises the total order
    edges = [(a, b, rng.randrange(1, 6)) for a, b in sorted(seen)]
    want = _kruskal([(w, a, b) for a, b, w in edges])
    df = spark.createDataFrame(edges, ["src", "dst", "weight"]).repartition(5)
    got = {
        (r.src, r.dst, r.weight)
        for r in minimum_spanning_forest(df).collect()
    }
    assert got == want


def test_random_project_matches_numpy(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.embedding import (
        random_project,
    )
    import math

    vecs = [
        (1, [0.5, -1.0, 0.25]),
        (2, [0.0, 0.0, 0.0]),
        (3, [2.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        r.vec_id: list(r.proj) for r in random_project(df, out_dim=4).collect()
    }

    def sign(j, i):
        return 1 - 2 * (((1103515245 * (j * 131 + i) + 12345) // 65536) % 2)

    for vid, v in vecs:
        sc = max(max((abs(x) for x in v), default=0.0), 1e-30)
        q = [math.floor(x * 127.0 / sc + 0.5) for x in v]
        want = [sum(q[i] * sign(j, i) for i in range(len(v))) for j in range(4)]
        assert got[vid] == want, vid

    import pytest as _pytest
    with _pytest.raises(ValueError):
        random_project(df, out_dim=0)


def test_kmv_set_ops_exact_when_unsaturated(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_set_ops,
    )

    # |A|=6, |B|=5, |A∩B|=3, |A∪B|=8 — all below k, so every estimate
    # must degenerate to the exact count
    rows = [("A", f"k{i}") for i in range(6)] + [
        ("B", f"k{i}") for i in range(3, 8)
    ]
    df = spark.createDataFrame(rows, ["s", "key"])
    out = kmv_set_ops(df, key_col="key", set_col="s", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.set_a, r.set_b) == ("A", "B")
    assert r.n_merged == 8 and r.matches == 3
    assert r.union_est == 8 and r.inter_est == 3
    assert r.jaccard_milli == (1000 * 3) // 8

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kmv_set_ops(df, key_col="key", set_col="s", k=1)


def test_kmv_set_ops_saturated_estimates_close(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_set_ops,
    )

    # two 1500-key sets sharing 750 keys: true |A∪B| = 2250, J = 0.333.
    # md5 is deterministic, so the sketch values are fixture constants —
    # verified against a pure-Python replay of the theta rule (the
    # merged top-128 REALLY contains 60 intersection hashes here; this
    # draw sits ~3σ high, which is exactly what the sketch must report)
    rows = [("A", f"s{i}") for i in range(1500)] + [
        ("B", f"s{i}") for i in range(750, 2250)
    ]
    df = spark.createDataFrame(rows, ["s", "key"]).repartition(5)
    r = kmv_set_ops(df, key_col="key", set_col="s", k=128).collect()[0]
    assert r.n_merged == 128 and r.matches == 60
    assert abs(r.union_est - 2250) / 2250.0 < 0.10
    assert r.jaccard_milli == (1000 * 60) // 128


def test_positional_postings_small(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        positional_postings,
    )

    docs = [
        (1, ["a", "b", "a", "c", "a"]),
        (2, ["b", "b"]),
        (3, []),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "tokens"])
    got = {
        (r.token, r.doc_id): (r.tf, r.positions_csv)
        for r in positional_postings(df).collect()
    }
    assert got == {
        ("a", 1): (3, "0,2,4"),
        ("b", 1): (1, "1"),
        ("c", 1): (1, "3"),
        ("b", 2): (2, "0,1"),
    }


def _mll2(x):
    msb = x.bit_length() - 1
    return 1000 * msb + ((x * 1024) // (1 << msb) - 1024) * 1000 // 1024


def test_lm_perplexity_score_hand_check(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.text_analysis import (
        lm_perplexity_score,
    )

    docs = [
        (1, ["a", "b", "a", "b"]),
        (2, ["a", "x"]),
        (3, ["only"]),  # no bigram -> no output row
    ]
    df = spark.createDataFrame(docs, ["doc_id", "tokens"])
    got = {
        r.doc_id: (r.n_bigrams, r.mll2_total, r.ppl_milli)
        for r in lm_perplexity_score(df).collect()
    }
    # contexts: c(a)=3, c(b)=1; bigrams: (a,b)=2, (b,a)=1, (a,x)=1; V=4
    s_ab = _mll2(2 + 1) - _mll2(3 + 4)
    s_ba = _mll2(1 + 1) - _mll2(1 + 4)
    s_ax = _mll2(1 + 1) - _mll2(3 + 4)
    t1 = 2 * s_ab + s_ba
    t2 = s_ax
    # scores are negative (log-probs), so -total is positive and DIV
    # truncation == Python floor division
    assert got == {1: (3, t1, (-t1) // 3), 2: (1, t2, -t2)}
    assert 3 not in got


def test_scd2_intervals_collapse_delete_reopen(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        scd2_intervals,
    )

    ch = [
        # key 1: v1 @1, no-op v1 @2 (collapsed), v2 @3, delete @4,
        # reopen v2 @5 (current)
        (1, 1, "v1", "U"), (1, 2, "v1", "U"), (1, 3, "v2", "U"),
        (1, 4, "x", "D"), (1, 5, "v2", "U"),
        # key 2: consecutive tombstones collapse; single open version
        (2, 1, "a", "U"), (2, 2, "t", "D"), (2, 3, "t", "D"),
    ]
    df = spark.createDataFrame(ch, ["key", "seq", "val", "op"])
    got = sorted(
        (r.key, r.val, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_intervals(df).collect()
    )
    assert got == [
        (1, "v1", 1, 3, False),
        (1, "v2", 3, 4, False),
        (1, "v2", 5, None, True),
        (2, "a", 1, 2, False),
    ]


def test_supernode_compress_star(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        supernode_compress,
    )

    # star: a,b,c all attach only to h -> one supernode of 3 leaves;
    # plus a 2-clique island x-y where x,y have DIFFERENT neighborhoods
    # ({y} vs {x}) -> two singleton supernodes
    edges = [("h", "a"), ("h", "b"), ("c", "h"), ("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = sorted(
        (r.supernode, r.n_members, r.degree)
        for r in supernode_compress(df).collect()
    )
    assert got == [
        ("a", 3, 1), ("h", 1, 3), ("x", 1, 1), ("y", 1, 1),
    ]


def test_meta_blocking_weights_and_purge(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.recordlinkage import (
        meta_blocking,
    )

    rows = (
        # block b1 size 2: (1,2) weight 500000
        [("b1", 1), ("b1", 2)]
        # block b2 size 3: pairs (1,2),(1,3),(2,3) weight 333333 each
        + [("b2", 1), ("b2", 2), ("b2", 3)]
        # oversized block purged entirely (size 5 > max_block 4)
        + [("big", i) for i in range(10, 15)]
        # singleton block dropped
        + [("solo", 9)]
    )
    df = spark.createDataFrame(rows, ["block_key", "rec_id"])
    unpruned = {
        (r.rec_a, r.rec_b): (r.weight_micro, r.n_blocks)
        for r in meta_blocking(df, max_block=4, prune=False).collect()
    }
    assert unpruned == {
        (1, 2): (833333, 2), (1, 3): (333333, 1), (2, 3): (333333, 1),
    }
    # mean = (833333+333333+333333) DIV 3 = 499999 -> only (1,2) survives
    pruned = [
        (r.rec_a, r.rec_b)
        for r in meta_blocking(df, max_block=4, prune=True).collect()
    ]
    assert pruned == [(1, 2)]


def test_politeness_schedule_ranks_slots_waves(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        politeness_schedule,
    )

    rows = [
        ("u/a", "h1", 10, 500),
        ("u/b", "h1", 30, 500),
        ("u/c", "h1", 30, 500),  # priority tie -> url order b before c
        ("u/d", "h2", 5, 250),
    ]
    df = spark.createDataFrame(rows, ["url", "host", "priority", "delay_ms"])
    got = {
        r.url: (r.host, r.fetch_rank, r.slot_ms, r.wave)
        for r in politeness_schedule(
            df, delay_col="delay_ms", wave_ms=600
        ).collect()
    }
    assert got == {
        "u/b": ("h1", 1, 0, 0),
        "u/c": ("h1", 2, 500, 0),
        "u/a": ("h1", 3, 1000, 1),
        "u/d": ("h2", 1, 0, 0),
    }


def test_butterfly_counts_hand_graph(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        butterfly_counts,
    )

    rows = [
        # docs 1,2 share tokens a,b -> C(2,2)=1 butterfly each
        (1, "a"), (1, "b"), (2, "a"), (2, "b"),
        # doc 3 shares only token a with 1 and 2 -> partner counts rise
        # but butterflies need >= 2 shared tokens
        (3, "a"),
        # token z has degree 1 -> dropped; token big exceeds max degree
        (1, "z"),
        (1, "big"), (2, "big"), (3, "big"), (4, "big"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "token"])
    got = {
        r.doc_id: (r.n_partners, r.n_butterflies)
        for r in butterfly_counts(df, max_right_degree=3).collect()
    }
    # with "big" purged (degree 4 > 3): pairs via a: (1,2) c=2, (1,3) c=1,
    # (2,3) c=1
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 0)}


def test_temporal_reachability_respects_time(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.temporal import (
        temporal_reachability,
    )

    edges = [
        ("a", "b", 5),
        ("b", "c", 3),   # stale: arrives at b at 5, edge left at 3
        ("b", "c", 9),
        ("a", "c", 20),  # direct but late
        ("c", "d", 9),   # NOT usable from arrival 9 (strict increase)
        ("c", "d", 10),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "tus"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        (r.seed, r.node): r.arrival
        for r in temporal_reachability(df, seeds, max_hops=4).collect()
    }
    assert got == {("a", "b"): 5, ("a", "c"): 9, ("a", "d"): 10}
    # hop cap: 2 hops cannot reach d (needs 3)
    capped = {
        (r.seed, r.node): r.arrival
        for r in temporal_reachability(df, seeds, max_hops=2).collect()
    }
    assert capped == {("a", "b"): 5, ("a", "c"): 9}


def test_kmv_sliding_distinct_exact_unsaturated(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        kmv_sliding_distinct,
    )

    rows = [
        (1, 100), (2, 100), (2, 101), (3, 101), (9, 104),
    ]
    df = spark.createDataFrame(rows, ["user_id", "day"])
    got = {
        r.win_end: (r.n_days_merged, r.n_kept, r.n_distinct_est)
        for r in kmv_sliding_distinct(
            df, key_col="user_id", day_col="day", window_days=2, k=64
        ).collect()
    }
    # windows end at days present: 100 -> day 100 only; 101 -> days
    # 100+101 merged (users 1,2,3); 104 -> day 104 only
    assert got == {100: (1, 2, 2), 101: (2, 3, 3), 104: (1, 1, 1)}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kmv_sliding_distinct(df, key_col="user_id", day_col="day", k=1)
