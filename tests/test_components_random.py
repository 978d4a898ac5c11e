"""Randomized connected-components verification vs a union-find oracle."""

from __future__ import annotations

import random

from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
    connected_components,
)


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(20260816)
    for trial in range(3):
        n_nodes = 200
        n_edges = rng.randint(50, 400)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        uf = _UnionFind()
        for a, b in edges:
            if a != b:
                uf.union(a, b)
        # oracle: node -> min member of its component
        touched = {x for e in edges if e[0] != e[1] for x in e}
        comp_members: dict[int, list[int]] = {}
        for x in touched:
            comp_members.setdefault(uf.find(x), []).append(x)
        expected = {
            x: min(members)
            for root, members in comp_members.items()
            for x in members
        }

        df = spark.createDataFrame(
            [e for e in edges if e[0] != e[1]], "src long, dst long"
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == expected, f"trial {trial}: CC mismatch"


def test_modularity_refine_two_cliques(spark):
    """Two K5 cliques joined by ONE bridge edge: CC merges them into one
    component; modularity local moves recover the two cliques."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        connected_components,
        modularity_refine,
    )

    edges = [
        (a, b) for grp in (range(0, 5), range(5, 10))
        for a in grp for b in grp if a < b
    ] + [(4, 5)]  # the bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    assert connected_components(df).select("component").distinct().count() == 1
    got = {
        r["node"]: r["community"] for r in modularity_refine(df).collect()
    }
    assert set(got) == set(range(10))
    comms = {}
    for n, c in got.items():
        comms.setdefault(c, set()).add(n)
    assert sorted(map(sorted, comms.values())) == [
        list(range(0, 5)), list(range(5, 10))
    ]


def test_guarded_components_splits_chain(spark):
    """r03 'done' criterion: a chain graph that CC merges into ONE
    component must be SPLIT by the guarded pass, while components under
    max_size keep their exact CC labels."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        connected_components,
        guarded_components,
    )

    chain = [(i, i + 1) for i in range(40)]          # 41-node chain
    triangle = [(100, 101), (101, 102), (100, 102)]  # small comp, kept
    df = spark.createDataFrame(chain + triangle, "src long, dst long")
    cc = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert len({c for n, c in cc.items() if n <= 40}) == 1  # chain merged

    got = {
        r["node"]: r["component"]
        for r in guarded_components(df, max_size=10).collect()
    }
    assert set(got) == set(range(41)) | {100, 101, 102}
    chain_comms = {got[n] for n in range(41)}
    assert len(chain_comms) > 1          # the hairball is split
    # small component untouched: identical to the CC labeling
    assert {got[n] for n in (100, 101, 102)} == {100}
    # each refined community is an id owned by its own min member
    for n in range(41):
        assert got[n] <= n or got[n] in range(41)


def test_guarded_components_no_oversized(spark):
    """When nothing exceeds max_size the guarded pass IS connected
    components (byte-identical labels, refine path runs on empty input)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        connected_components,
        guarded_components,
    )

    edges = [(0, 1), (1, 2), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    got = {(r["node"], r["component"])
           for r in guarded_components(df, max_size=100).collect()}
    assert got == cc


def test_incremental_cc_equals_full_recompute(spark):
    """Contract-and-merge on a random edge split must equal CC on the
    union — including new nodes, merged old components, and untouched
    components — with identical canonical min-member ids."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(20260818)
    for trial in range(3):
        n = rng.randint(12, 40)
        edges = list(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(8, 60))
                for a, b in [(rng.randrange(n), rng.randrange(n))]
                if a != b
            }
        )
        rng.shuffle(edges)
        cut = rng.randint(1, max(1, len(edges) - 1))
        base, incr = edges[:cut], edges[cut:]
        if not base or not incr:
            continue
        bdf = spark.createDataFrame(base, ["src", "dst"])
        idf = spark.createDataFrame(incr, ["src", "dst"])
        full = spark.createDataFrame(edges, ["src", "dst"])
        labels = connected_components(bdf)
        got = {
            (r["node"], r["component"])
            for r in connected_components_incremental(labels, idf).collect()
        }
        want = {
            (r["node"], r["component"])
            for r in connected_components(full).collect()
        }
        assert got == want, f"trial {trial}: {sorted(got ^ want)[:10]}"


def test_louvain_multilevel_merges_bundled_cliques(spark):
    """r4 VERDICT #1 'done' fixture: nested communities where phase-1-only
    local moves and full multi-level Louvain DISAGREE.

    Ring of 22 weighted triangles (intra weight 3, single bridges): no
    single node can profitably leave its triangle, so one-level
    refinement stops at 24 communities (the 22 triangles, 2 still
    settling) — but after contraction each triangle is ONE super-node
    and adjacent super-nodes merge pairwise (the resolution-limit merge
    Louvain's aggregation phase exists for; Blondel et al. 2008 §2).
    Multi-level must produce strictly fewer communities, strictly
    higher modularity, and at least one community that is a union of
    >= 2 COMPLETE triangles."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        louvain_multilevel,
        modularity_refine,
    )

    NC = 22
    edges = []
    for k in range(NC):
        b = 3 * k
        edges += [
            (b, b + 1, 3.0),
            (b, b + 2, 3.0),
            (b + 1, b + 2, 3.0),
            (b + 2, (3 * (k + 1)) % (3 * NC), 1.0),
        ]
    e = spark.createDataFrame(edges, "src long, dst long, w double")

    single = {
        r.node: r.community
        for r in modularity_refine(
            e, weight_col="w", max_rounds=5, parity_fn="md5"
        ).collect()
    }
    multi = {
        r.node: r.community
        for r in louvain_multilevel(
            e, weight_col="w", rounds_per_level=5, max_levels=2,
            parity_fn="md5",
        ).collect()
    }
    assert set(single) == set(multi) == set(range(3 * NC))
    n_single = len(set(single.values()))
    n_multi = len(set(multi.values()))
    assert n_single == 24  # deterministic md5 schedule, pinned
    assert n_multi == 14
    assert n_multi < n_single

    # at least one multi community unions >= 2 complete triangles
    from collections import Counter

    sizes = Counter(multi.values())
    assert max(sizes.values()) >= 6
    merged_pairs = sum(1 for c, n in sizes.items() if n >= 6)
    assert merged_pairs >= 5

    def modularity(membership):
        m = sum(w for _, _, w in edges)
        intra = sum(
            w for u, v, w in edges if membership[u] == membership[v]
        )
        deg = {}
        for u, v, w in edges:
            deg[u] = deg.get(u, 0.0) + w
            deg[v] = deg.get(v, 0.0) + w
        tot = {}
        for n, c in membership.items():
            tot[c] = tot.get(c, 0.0) + deg[n]
        return intra / m - sum((t / (2 * m)) ** 2 for t in tot.values())

    assert modularity(multi) > modularity(single)


def test_louvain_refinement_guarantees_connected_communities(spark):
    """The Leiden §2.2 pathology pinned: hub node 0 bridges leaf pairs
    (1,2) and (3,4) and is heavily tied to a 5-clique; during local
    moves the hub departs for the clique and strands {1,4} as ONE
    community with NO edge between them (found by deterministic search
    over the md5 schedule).  refine=True must return only communities
    whose induced subgraph is connected — Louvain lacks exactly this
    guarantee (Traag et al. 2019)."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        louvain_multilevel,
        modularity_refine,
    )

    edges = [
        (10, 11, 2.0), (10, 12, 2.0), (10, 13, 2.0), (10, 14, 2.0),
        (11, 12, 2.0), (11, 13, 2.0), (11, 14, 3.0), (12, 13, 3.0),
        (12, 14, 2.0), (13, 14, 2.0),
        (0, 1, 1.0), (0, 2, 2.0), (0, 3, 2.0), (0, 4, 1.0),
        (1, 2, 1.0), (3, 4, 1.0),
        (0, 10, 3.0), (0, 11, 3.0), (0, 12, 3.0),
    ]
    adj = {}
    for u, v, _ in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def disconnected(membership):
        comms = {}
        for n, c in membership.items():
            comms.setdefault(c, set()).add(n)
        bad = []
        for c, m in comms.items():
            seen, stack = set(), [min(m)]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                stack += [y for y in adj.get(x, ()) if y in m]
            if seen != m:
                bad.append(c)
        return bad

    e = spark.createDataFrame(edges, "src long, dst long, w double")
    plain = {
        r.node: r.community
        for r in modularity_refine(
            e, weight_col="w", max_rounds=6, parity_fn="md5"
        ).collect()
    }
    assert disconnected(plain), "fixture must exhibit the pathology"
    assert plain[1] == plain[4] and 4 not in adj[1]

    refined = {
        r.node: r.community
        for r in louvain_multilevel(
            e, weight_col="w", rounds_per_level=6, max_levels=2,
            parity_fn="md5", refine=True,
        ).collect()
    }
    assert set(refined) == set(plain)
    assert disconnected(refined) == []


def test_node2vec_walks_validity_and_bias(spark):
    """node2vec second-order bias observable end-to-end: on a 60-cycle
    every step-2 candidate set is {return-to-prev, move-on}; with
    p_milli=1 (return weight 10^6 vs 500) nearly every walker
    oscillates back to its start, with p_milli=10^6 (weight 1 vs 500)
    most walk on.  Also: every hop follows an edge, every walker emits
    steps 0..walk_len, and the corpus is bit-stable across runs."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        node2vec_walks,
    )

    N = 60
    edges = [(i, (i + 1) % N) for i in range(N)]
    e = spark.createDataFrame(edges, "src long, dst long")
    eset = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}

    def run(p_milli):
        rows = node2vec_walks(
            e, walk_len=2, p_milli=p_milli, q_milli=2000, seed="t"
        ).collect()
        walks = {}
        for r in rows:
            walks.setdefault((r.start, r.walk), {})[r.step] = r.node
        return walks

    ret = run(1)
    for (s, _w), steps in ret.items():
        assert set(steps) == {0, 1, 2}
        assert steps[0] == s
        assert (steps[0], steps[1]) in eset
        assert (steps[1], steps[2]) in eset
    n_return = sum(1 for (s, _), st in ret.items() if st[2] == s)
    assert n_return >= 55  # w_ret = 10^6 vs w_far = 500

    fwd = run(1_000_000)
    n_return_fwd = sum(1 for (s, _), st in fwd.items() if st[2] == s)
    assert n_return_fwd <= 30  # w_ret = 1 vs w_far = 500

    again = run(1)
    assert again == ret  # seeded-hash determinism
