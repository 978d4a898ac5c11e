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
