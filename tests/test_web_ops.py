"""Web-graph / site-curation operators: redirect resolution, prefix
rules, MIS merge scheduling, WL refinement, template-line removal,
cross-snapshot label alignment."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
    align_labels,
    maximal_independent_set,
    wl_refinement,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
    template_line_removal,
)
from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
    match_prefix_rules,
    resolve_redirects,
)


def _porthash(value: str, seed: str) -> int:
    return int(hashlib.md5(f"{value}\x1f{seed}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- redirects


def test_resolve_redirects_chain_and_cycle(spark):
    # chain a->b->c->d (d terminal), cycle x->y->x, fan e->d
    r = spark.createDataFrame(
        [
            ("a", "b"),
            ("b", "c"),
            ("c", "d"),
            ("x", "y"),
            ("y", "x"),
            ("e", "d"),
        ],
        ["src", "dst"],
    )
    got = {
        row["node"]: (row["terminal"], row["hops"], row["resolved"])
        for row in resolve_redirects(r).collect()
    }
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
        "e": ("d", 1, True),
        "x": (None, None, False),
        "y": (None, None, False),
    }


def test_resolve_redirects_long_chain_and_round_cap(spark):
    # 0->1->...->9 (9 terminal): resolved with max_rounds=4 (2^4=16 >= 9)
    # but NOT with max_rounds=2 (2^2=4 < 9 hops for node 0).
    r = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(9)], ["src", "dst"]
    )
    full = {
        row["node"]: (row["terminal"], row["hops"], row["resolved"])
        for row in resolve_redirects(r, max_rounds=4).collect()
    }
    assert full["0"] == ("9", 9, True)
    assert full["8"] == ("9", 1, True)
    capped = {
        row["node"]: row["resolved"]
        for row in resolve_redirects(r, max_rounds=2).collect()
    }
    assert capped["0"] is False  # chain longer than 2^2
    assert capped["5"] is True  # 4 hops from terminal


def test_resolve_redirects_duplicate_source_takes_min(spark):
    r = spark.createDataFrame(
        [("a", "c"), ("a", "b")], ["src", "dst"]
    )
    got = resolve_redirects(r).collect()
    assert len(got) == 1 and got[0]["terminal"] == "b"


# --------------------------------------------------------------- prefix rules


def test_match_prefix_rules_longest_wins(spark):
    urls = spark.createDataFrame(
        [
            ("u1", "h", "/cat/sub/page1"),
            ("u2", "h", "/cat/other"),
            ("u3", "h", "/free/page"),
            ("u4", "h", "/"),
            ("u5", "g", "/cat/sub/page1"),  # no rules for host g
        ],
        ["url", "host", "path"],
    )
    rules = spark.createDataFrame(
        [
            ("h", "/", True),
            ("h", "/cat", False),
            ("h", "/cat/sub", True),
        ],
        ["host", "prefix", "allow"],
    )
    got = {
        r["url"]: (r["matched_prefix"], r["allowed"])
        for r in match_prefix_rules(urls, rules).collect()
    }
    assert got == {
        "u1": ("/cat/sub", True),
        "u2": ("/cat", False),
        "u3": ("/", True),
        "u4": ("/", True),
        "u5": (None, True),
    }


def test_match_prefix_rules_segment_aligned_not_substring(spark):
    # '/cat' must NOT match '/category' — segment alignment.
    urls = spark.createDataFrame(
        [("u1", "h", "/category/x")], ["url", "host", "path"]
    )
    rules = spark.createDataFrame(
        [("h", "/cat", False)], ["host", "prefix", "allow"]
    )
    row = match_prefix_rules(urls, rules).collect()[0]
    assert row["matched_prefix"] is None and row["allowed"] is True


def test_match_prefix_rules_default_deny(spark):
    urls = spark.createDataFrame([("u1", "h", "/x")], ["url", "host", "path"])
    rules = spark.createDataFrame(
        [("h", "/y", True)], ["host", "prefix", "allow"]
    )
    row = match_prefix_rules(urls, rules, default_allow=False).collect()[0]
    assert row["allowed"] is False


# ------------------------------------------------------------------------ MIS


def test_mis_path_graph_matches_python_replay(spark):
    # path 1-2-3-4-5 plus an isolated edge 6-7
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["status"]
        for r in maximal_independent_set(e, rounds=4).collect()
    }
    # pure-python replay of the same recurrence
    pri = {n: (_porthash(str(n), "mis"), n) for n in range(1, 8)}
    adj: dict[int, set[int]] = {n: set() for n in range(1, 8)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    status = {}
    undecided = set(adj)
    live = {frozenset((u, v)) for u, v in edges}
    for _ in range(4):
        nbrs = {n: set() for n in undecided}
        for ed in live:
            u, v = tuple(ed)
            nbrs[u].add(v)
            nbrs[v].add(u)
        winners = {
            n
            for n in undecided
            if all(pri[n] < pri[p] for p in nbrs.get(n, ()))
        }
        losers = {
            p for n in winners for p in nbrs.get(n, ())
        } - winners
        for n in winners:
            status[n] = "mis"
        for n in losers:
            status[n] = "excluded"
        undecided -= winners | losers
        live = {ed for ed in live if not (ed & (winners | losers))}
    for n in undecided:
        status[n] = "undecided"
    assert got == status
    # MIS invariants: independent + maximal
    mis = {n for n, s in got.items() if s == "mis"}
    assert not any(u in mis and v in mis for u, v in edges)
    for n, s in got.items():
        if s == "excluded":
            assert any(
                (n, m) in edges or (m, n) in edges for m in mis
            )


def test_mis_freed_node_wins_later_round(spark):
    # star: center c with hash-losing leaves -> if c wins round 1 the
    # leaves are excluded; a 2-path hanging off a leaf frees its end.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["status"], r["round"])
        for r in maximal_independent_set(e, rounds=4).collect()
    }
    mis = {n for n, (s, _) in got.items() if s == "mis"}
    # path of 4 nodes: MIS is maximal, so 2 nodes in the set
    assert len(mis) == 2
    assert all(s in ("mis", "excluded") for s, _ in got.values())


# ------------------------------------------------------------------------- WL


def test_wl_distinguishes_path_ends_from_middle(spark):
    # path a-b-c-d-e: after 2 rounds ends {a,e}, near-ends {b,d},
    # middle {c} — symmetric positions share colors.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["wl_color"], r["class_size"])
        for r in wl_refinement(e, rounds=2).collect()
    }
    assert got["a"] == got["e"]
    assert got["b"] == got["d"]
    assert got["a"][0] != got["b"][0] != got["c"][0]
    assert got["a"][1] == 2 and got["b"][1] == 2 and got["c"][1] == 1
    # colors refine with more rounds but never merge classes
    got3 = {
        r["node"]: r["wl_color"]
        for r in wl_refinement(e, rounds=3).collect()
    }
    assert got3["a"] == got3["e"] and got3["b"] == got3["d"]


def test_wl_regular_graph_stays_uniform(spark):
    # a 4-cycle is 2-regular and vertex-transitive: one color class
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    rows = wl_refinement(e, rounds=3).collect()
    assert len({r["wl_color"] for r in rows}) == 1
    assert all(r["class_size"] == 4 for r in rows)


# ------------------------------------------------------------- template lines


def test_template_line_removal_strips_per_host_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "h1", "COOKIE BANNER\nreal prose one"),
            (2, "h1", "COOKIE BANNER\nreal prose two"),
            (3, "h1", "COOKIE BANNER\nreal prose three"),
            (4, "h2", "COOKIE BANNER\nother site text"),
        ],
        ["doc_id", "host", "text"],
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_template"], r["text"])
        for r in template_line_removal(
            docs, min_frac_millis=500, min_docs=3
        ).collect()
    }
    # h1: banner in 3/3 docs -> template; h2: only 1 doc, min_docs=3
    assert got[1] == (2, 1, "real prose one")
    assert got[2] == (2, 1, "real prose two")
    assert got[3] == (2, 1, "real prose three")
    assert got[4] == (2, 0, "COOKIE BANNER\nother site text")


def test_template_line_removal_all_template_keeps_row(spark):
    docs = spark.createDataFrame(
        [(1, "h", "x"), (2, "h", "x"), (3, "h", "x")],
        ["doc_id", "host", "text"],
    )
    rows = template_line_removal(docs, min_docs=2).collect()
    assert len(rows) == 3
    assert all(r["text"] == "" and r["n_template"] == 1 for r in rows)


# ------------------------------------------------------------ label alignment


def test_align_labels_reciprocal_match_and_fresh(spark):
    old = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200)],
        ["node", "label_old"],
    )
    # cluster 100 persists (nodes 1,2 + new 6); 200 splits into two
    # singletons 4 and 5; 7 is brand new.
    new = spark.createDataFrame(
        [(1, 1), (2, 1), (6, 1), (4, 4), (5, 5), (7, 7)],
        ["node", "label_new"],
    )
    got = {
        r["label_new"]: (r["stable_id"], r["matched"], r["overlap"])
        for r in align_labels(old, new).collect()
    }
    assert got[1] == (100, True, 2)
    # split: only ONE side can inherit 200 (reciprocal: smallest label)
    assert got[4] == (200, True, 1)
    assert got[5] == (5, False, 0)  # lost the reciprocity vote
    assert got[7] == (7, False, 0)
    stable = [v[0] for v in got.values()]
    assert len(stable) == len(set(stable))  # injective


def test_align_labels_identity_is_fixpoint(spark):
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30)], ["node", "label_old"]
    )
    new = labels.select("node", F.col("label_old").alias("label_new"))
    got = {
        r["label_new"]: (r["stable_id"], r["matched"])
        for r in align_labels(labels, new).collect()
    }
    assert got == {10: (10, True), 30: (30, True)}


# ------------------------------------------------------------ topo layers


def test_topo_layers_dag_depth_and_cycle_quarantine(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        topo_layers,
    )

    # diamond a->b, a->c, b->d, c->d  (d's layer = LONGEST path = 2)
    # plus a 2-cycle x<->y feeding z: all three unresolved.
    e = spark.createDataFrame(
        [
            ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
            ("x", "y"), ("y", "x"), ("y", "z"),
        ],
        ["src", "dst"],
    )
    got = {
        r["node"]: (r["layer"], r["status"])
        for r in topo_layers(e, max_rounds=6).collect()
    }
    assert got["a"] == (0, "layered")
    assert got["b"] == (1, "layered")
    assert got["c"] == (1, "layered")
    assert got["d"] == (2, "layered")
    for n in ("x", "y", "z"):
        assert got[n] == (None, "unresolved")


def test_topo_layers_round_cap_is_part_of_contract(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        topo_layers,
    )

    # chain of 5 edges, cap 3 peels layers 0-2 only
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["src", "dst"]
    )
    got = {
        r["node"]: (r["layer"], r["status"])
        for r in topo_layers(e, max_rounds=3).collect()
    }
    assert got[0] == (0, "layered")
    assert got[2] == (2, "layered")
    assert got[4] == (None, "unresolved")
    assert got[5] == (None, "unresolved")


# ----------------------------------------------------------------- LCA


def test_taxonomy_lca_binary_tree(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        taxonomy_lca,
    )

    # heap-shaped tree: parent(k) = (k-1)//2, nodes 0..6
    parents = spark.createDataFrame(
        [(k, (k - 1) // 2) for k in range(1, 7)], ["node", "parent"]
    )
    pairs = spark.createDataFrame(
        [(3, 4), (3, 5), (3, 3), (6, 2), (3, 0)], ["a", "b"]
    )
    got = {
        (r["a"], r["b"]): (r["lca"], r["lca_depth"], r["dist"])
        for r in taxonomy_lca(parents, pairs).collect()
    }
    assert got[(3, 4)] == (1, 1, 2)      # siblings under 1
    assert got[(3, 5)] == (0, 0, 4)      # across the root
    assert got[(3, 3)] == (3, 2, 0)      # self pair
    assert got[(6, 2)] == (2, 1, 1)      # ancestor pair -> ancestor
    assert got[(3, 0)] == (0, 0, 2)      # pair with the root itself


def test_taxonomy_lca_cross_tree_is_null(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        taxonomy_lca,
    )

    parents = spark.createDataFrame(
        [(1, 0), (11, 10)], ["node", "parent"]
    )
    got = taxonomy_lca(
        parents, spark.createDataFrame([(1, 11)], ["a", "b"])
    ).collect()
    assert len(got) == 1
    assert got[0]["lca"] is None and got[0]["dist"] is None


def test_ancestor_closure_deep_chain_log_rounds(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        ancestor_closure,
    )

    # chain 0<-1<-...<-20: closure of node 20 has all 20 ancestors with
    # exact hop counts after 5 doubling rounds (2^5 = 32 >= 20)
    parents = spark.createDataFrame(
        [(k, k - 1) for k in range(1, 21)], ["node", "parent"]
    )
    rows = ancestor_closure(parents, doubling_rounds=5).collect()
    anc20 = sorted(
        (r["anc"], r["up"]) for r in rows if r["node"] == 20
    )
    assert anc20 == [(a, 20 - a) for a in range(20)]


# ------------------------------------------------------- stress centrality


def test_stress_centrality_path_interior(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        stress_centrality,
    )

    # path a-b-c-d, source a: paths a..c and a..d pass through b (2),
    # a..d passes through c (1); endpoints never interior.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(e, seeds, max_depth=5).collect()
    }
    assert got == {"a": 0, "b": 2, "c": 1, "d": 0}


def test_stress_centrality_counts_multiplicity(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        stress_centrality,
    )

    # diamond s-{m1,m2}-t plus tail t-u, source s: sigma(t)=2, so both
    # m1 and m2 carry (paths s->t and s->u) = 2 each; t carries the two
    # s->u paths = 2.
    e = spark.createDataFrame(
        [("s", "m1"), ("s", "m2"), ("m1", "t"), ("m2", "t"), ("t", "u")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(e, seeds, max_depth=5).collect()
    }
    assert got["m1"] == 2 and got["m2"] == 2
    assert got["t"] == 2
    assert got["s"] == 0 and got["u"] == 0


def test_stress_centrality_hop_cap_truncates(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        stress_centrality,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(e, seeds, max_depth=2).collect()
    }
    # only paths a..b (interior none) and a..c (interior b) exist now
    assert got == {"a": 0, "b": 1, "c": 0, "d": 0}


# -------------------------------------------- anchor names / host graph


def test_anchor_entity_names_majority_vote_and_dead_flag(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        anchor_entity_names,
    )

    links = spark.createDataFrame(
        [
            # three in-links to the same canonical target (www/utm
            # variants collapse), two anchors -> majority "acme corp"
            ("http://a.com/x", "http://www.t.com/p?utm_src=z", "acme corp"),
            ("http://b.com/y", "http://t.com/p", "acme corp"),
            ("http://c.com/z", "http://t.com/p/", "acme"),
            # dead target: not in the page set
            ("http://a.com/x", "http://gone.com/404", "old page"),
        ],
        ["src_url", "dst_url", "anchor"],
    )
    pages = spark.createDataFrame(
        [("https://www.t.com/p",), ("http://a.com/x",)], ["url"]
    )
    got = {r["canonical_url"]: r for r in anchor_entity_names(links, pages).collect()}
    t = got["http://t.com/p"]
    assert t["n_links"] == 3
    assert t["n_src_hosts"] == 3
    assert t["top_anchor"] == "acme corp"
    assert t["top_anchor_links"] == 2
    # NOTE scheme is part of the canonical key: the https page entry
    # does NOT vouch for the http target; both schemes of t.com/p would
    # need crawling for is_dead=False.  The generator in q138 keeps
    # scheme deterministic per id, so this never fires there.
    d = got["http://gone.com/404"]
    assert d["is_dead"] is True
    assert d["top_anchor"] == "old page"


def test_anchor_entity_names_tiebreak_is_bytewise(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        anchor_entity_names,
    )

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://t.com/p", "zz"),
            ("http://a.com/2", "http://t.com/p", "aa"),
        ],
        ["src_url", "dst_url", "anchor"],
    )
    pages = spark.createDataFrame([("http://t.com/p",)], ["url"])
    row = anchor_entity_names(links, pages).collect()[0]
    assert row["top_anchor"] == "aa" and row["top_anchor_links"] == 1
    assert row["n_src_hosts"] == 1  # both pages on host a.com


def test_host_graph_weights_reciprocity_and_intra_host_drop(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        host_graph,
    )

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/1", "http://b.com/y"),   # same page, 2 links
            ("http://www.a.com/2", "http://b.com/x"),
            ("http://b.com/x", "http://a.com/1"),   # reciprocal edge
            ("http://a.com/1", "http://www.a.com/9"),  # intra-host: drop
            ("http://c.com/1", "http://b.com/x"),   # one-way only
        ],
        ["src_url", "dst_url"],
    )
    got = {(r["src_host"], r["dst_host"]): r for r in host_graph(links).collect()}
    assert set(got) == {("a.com", "b.com"), ("b.com", "a.com"), ("c.com", "b.com")}
    ab = got[("a.com", "b.com")]
    assert ab["weight"] == 3
    assert ab["n_src_pages"] == 2  # /1 counted once despite 2 links
    assert ab["reciprocal"] is True
    assert got[("b.com", "a.com")]["reciprocal"] is True
    assert got[("c.com", "b.com")]["reciprocal"] is False


# ------------------------------------------------------------------ HLL


def test_hll_distinct_accuracy_and_regimes(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        hll_distinct,
    )

    # group "big": 5000 distinct keys repeated 2x (duplicates must not
    # move registers); group "small": 3 keys -> linear-counting regime.
    import pyspark.sql.functions as F

    big = spark.range(5000).select(
        F.lit("big").alias("g"), F.col("id").alias("k")
    )
    df = big.unionAll(big).unionAll(
        spark.range(3).select(F.lit("small").alias("g"), F.col("id").alias("k"))
    )
    got = {r["g"]: r for r in hll_distinct(df, "k", p=10, by=["g"]).collect()}
    est_big = got["big"]["est_milli"] / 1000.0
    assert got["big"]["m"] == 1024
    # standard error ~ 1.04/sqrt(1024) ~ 3.3%; allow 4 sigma
    assert abs(est_big - 5000) / 5000 < 0.13
    small = got["small"]
    assert small["regime"] == "linear"
    assert small["n_zero"] >= 1021
    est_small = small["est_milli"] / 1000.0
    assert abs(est_small - 3) < 0.5


def test_hll_registers_merge_by_max(spark):
    """The mergeability contract: HLL(a ∪ b) register state equals the
    element-wise max of HLL(a) and HLL(b) — verified through the final
    estimate, which is a pure function of the registers."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.sketches import (
        hll_distinct,
    )
    import pyspark.sql.functions as F

    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(200, 600).select(F.col("id").alias("k"))
    union_est = hll_distinct(a.unionAll(b), "k", p=8).collect()[0]
    # recompute from per-shard register states merged by max
    from convei_abstract_relational_knowledge_explorer_spark.operators.dedup import (
        porthash64,
    )

    def regs(df):
        h = porthash64(F.col("k").cast("string"), "hll")
        w = F.shiftright(h, 8)
        rho = (
            F.when(w == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin(w)))
            .cast("int")
        )
        return {
            r["reg"]: r["rho"]
            for r in df.select((h % 256).cast("int").alias("reg"), rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("rho"))
            .collect()
        }

    ra, rb = regs(a), regs(b)
    merged = {j: max(ra.get(j, -1), rb.get(j, -1)) for j in set(ra) | set(rb)}
    big_k = 53
    present_sum = sum(1 << (big_k - rho) for rho in merged.values())
    n_zero = 256 - len(merged)
    harm = present_sum + n_zero * (1 << big_k)
    assert harm == union_est["harm_num"]
    assert n_zero == union_est["n_zero"]


# ------------------------------------------------- registered domain


def _rd(spark, hosts, rules):
    from convei_abstract_relational_knowledge_explorer_spark.operators.urls import (
        registered_domain,
    )

    h = spark.createDataFrame([(x,) for x in hosts], ["host"])
    r = spark.createDataFrame([(x,) for x in rules], ["rule"])
    return {
        row["host"]: row
        for row in registered_domain(h, r).collect()
    }


PSL = ["com", "uk", "co.uk", "*.ck", "!www.ck", "github.io", "io"]


def test_registered_domain_longest_plain_rule_wins(spark):
    got = _rd(spark, ["news.bbc.co.uk", "bbc.co.uk", "x.com"], PSL)
    assert got["news.bbc.co.uk"]["public_suffix"] == "co.uk"
    assert got["news.bbc.co.uk"]["registered_domain"] == "bbc.co.uk"
    assert got["bbc.co.uk"]["registered_domain"] == "bbc.co.uk"
    assert got["x.com"]["registered_domain"] == "x.com"


def test_registered_domain_wildcard_and_exception(spark):
    got = _rd(spark, ["a.b.ck", "b.ck", "ck", "www.ck", "x.www.ck"], PSL)
    # *.ck: b.ck is itself a public suffix
    assert got["b.ck"]["public_suffix"] == "b.ck"
    assert got["b.ck"]["registered_domain"] is None
    assert got["a.b.ck"]["registered_domain"] == "a.b.ck"
    # bare ck: wildcard needs a label to bind; implicit * rule applies
    assert got["ck"]["rule_kind"] == "default"
    assert got["ck"]["registered_domain"] is None
    # !www.ck carves the exception back out
    assert got["www.ck"]["rule_kind"] == "exception"
    assert got["www.ck"]["public_suffix"] == "ck"
    assert got["www.ck"]["registered_domain"] == "www.ck"
    assert got["x.www.ck"]["registered_domain"] == "www.ck"


def test_registered_domain_private_suffix_and_default(spark):
    got = _rd(spark, ["user.github.io", "github.io", "foo.bar.unlisted"], PSL)
    assert got["user.github.io"]["public_suffix"] == "github.io"
    assert got["user.github.io"]["registered_domain"] == "user.github.io"
    assert got["github.io"]["registered_domain"] is None
    # unlisted TLD: implicit * — last label is the suffix
    d = got["foo.bar.unlisted"]
    assert d["rule_kind"] == "default"
    assert d["public_suffix"] == "unlisted"
    assert d["registered_domain"] == "bar.unlisted"


# ------------------------------------------- greedy weighted matching


def _match(spark, edges, rounds=3):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        greedy_weighted_matching,
    )

    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    return sorted(
        (r["u"], r["v"], r["w"], r["rnd"])
        for r in greedy_weighted_matching(e, rounds=rounds).collect()
    )


def test_matching_beats_one_round_reciprocal(spark):
    # path 1-2-3-4 with weights 5, 9, 5: round 1 matches only (2,3);
    # round 2 has nothing left adjacent — (1,) and (4,) stay single.
    got = _match(spark, [(1, 2, 5), (2, 3, 9), (3, 4, 5)])
    assert got == [(2, 3, 9, 1)]
    # star + pendant: (1,2)=9 dominant; then (3,4)=5 becomes dominant
    # in round 2 once node 2 is gone — the pairing one-round
    # reciprocal-best leaves on the table.
    got = _match(spark, [(1, 2, 9), (2, 3, 7), (3, 4, 5)])
    assert got == [(1, 2, 9, 1), (3, 4, 5, 2)]


def test_matching_is_a_matching_and_maximal(spark):
    edges = [
        (i, j, (i * 7 + j * 13) % 50 + 1)
        for i in range(12)
        for j in range(i + 1, 12)
        if (i + j) % 3 != 0
    ]
    got = _match(spark, edges, rounds=8)
    used = [u for u, v, _, _ in got] + [v for _, v, _, _ in got]
    assert len(used) == len(set(used))  # node-disjoint
    # maximal: no live edge has both endpoints unmatched
    matched = set(used)
    assert not [
        (a, b) for a, b, _ in edges
        if a not in matched and b not in matched
    ]


def test_matching_ties_and_duplicate_edges(spark):
    # duplicate edge keeps max weight; equal weights break by (u, v)
    got = _match(spark, [(1, 2, 5), (2, 1, 3), (2, 3, 5)])
    assert got == [(1, 2, 5, 1)]


# -------------------------------------------------- greedy coloring


def test_greedy_coloring_validity_and_waves(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        greedy_coloring,
    )

    # 4-clique plus a pendant: needs 4 colors on the clique
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    rows = greedy_coloring(e, rounds=8).collect()
    col = {r["node"]: r["color"] for r in rows if r["status"] == "colored"}
    assert len(col) == 5  # all colored with enough rounds
    for a, b in edges:
        assert col[a] != col[b]
    assert sorted(col[n] for n in range(4)) == [0, 1, 2, 3]


def test_greedy_coloring_round_cap_leaves_undecided(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        greedy_coloring,
    )

    # long path: one round colors only the local priority minima
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    rows = greedy_coloring(e, rounds=1).collect()
    statuses = {r["status"] for r in rows}
    assert statuses == {"colored", "undecided"}
    colored = [r for r in rows if r["status"] == "colored"]
    # round-1 winners are an independent set and all take color 0
    assert all(r["color"] == 0 and r["rnd"] == 1 for r in colored)
    ids = {r["node"] for r in colored}
    assert not any((a in ids and a + 1 in ids) for a in range(30))


def test_greedy_coloring_smallest_free_color(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        greedy_coloring,
    )

    # star: center is beaten until leaves color; center then takes the
    # smallest free color, which is 1 (all leaves take 0)
    e = spark.createDataFrame(
        [(100, i) for i in range(1, 7)], ["src", "dst"]
    )
    rows = greedy_coloring(e, rounds=8).collect()
    col = {r["node"]: r["color"] for r in rows if r["status"] == "colored"}
    leaves = [col[i] for i in range(1, 7)]
    assert col[100] == (1 if leaves.count(0) == 6 else 0)
    assert all(c in (0, 1) for c in leaves)


# ------------------------------------------- diameter & core numbers


def test_double_sweep_exact_on_path(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        double_sweep_diameter,
    )

    # path 0-1-...-9: double sweep is EXACT on trees -> lb = 9
    e = spark.createDataFrame([(i, i + 1) for i in range(9)], ["src", "dst"])
    row = double_sweep_diameter(e, max_depth=15).collect()[0]
    assert row["lb_diameter"] == 9
    assert {row["far_u"], row["far_v"]} == {0, 9}
    assert row["ecc_seed"] <= 9


def test_double_sweep_cap_still_valid_bound(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        double_sweep_diameter,
    )

    e = spark.createDataFrame([(i, i + 1) for i in range(30)], ["src", "dst"])
    row = double_sweep_diameter(e, max_depth=5).collect()[0]
    assert row["lb_diameter"] <= 5  # capped, still a valid lower bound


def test_core_numbers_clique_plus_pendant(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        core_numbers,
    )

    # 4-clique (core 3) with a pendant chain a-b hanging off node 0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(0, 10), (10, 11)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["core"] for r in core_numbers(e, rounds=6).collect()}
    assert got[1] == got[2] == got[3] == 3
    assert got[0] == 3          # clique membership dominates
    assert got[10] == 1 and got[11] == 1


def test_core_numbers_monotone_upper_bounds(spark):
    from convei_abstract_relational_knowledge_explorer_spark.operators.components import (
        core_numbers,
    )

    # star: center degree 5 but core 1; one round already tightens it
    e = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    r1 = {r["node"]: r for r in core_numbers(e, rounds=1).collect()}
    assert r1[0]["core"] == 1 and r1[0]["rnd_converged"] == 1
    assert all(r1[i]["core"] == 1 for i in range(1, 6))
    # leaves start at degree 1 and never move
    assert all(r1[i]["rnd_converged"] == 0 for i in range(1, 6))
