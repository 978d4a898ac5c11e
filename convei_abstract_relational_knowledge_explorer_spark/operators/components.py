"""Stage 5 — connected components / canonicalization (iterative DataFrame
label propagation).

Replaces the reference's single-node Leiden clustering
(/root/reference/topic_analysis.py:143-153) with the scalable alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) expressed as pure DataFrame ops:

  large-star: for each node u, every neighbor v > u links to min(N(u) ∪ {u})
  small-star: every neighbor v <= u links to the minimum

Convergence: when the edge set stops changing (checked via an aggregate
hash), guaranteed in O(log^2 n) rounds.  Scale levers:
  - the iteration is shuffle-on-key groupBy; AQE skew-join handles head
    entities, and the caller can pre-salt mega-keys
  - ``localCheckpoint`` every round truncates the lineage (SURVEY.md §4.2)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component = min node id.

    Node ids must be a numeric/orderable type; the component id is the
    smallest member id (deterministic, resume-stable).
    """
    # canonical undirected edge list, self-loops dropped.  localCheckpoint
    # cuts the upstream plan (the caller's edge derivation can be arbitrarily
    # expensive — e.g. an LSH pipeline) so the iteration never recomputes it.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    prev_stats = None
    for _ in range(max_iterations):
        # --- large-star ---
        # neighbors of u from both directions
        nbrs = e.select("u", "v").unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u2"), F.col("m").alias("v2"))
        )
        e1 = (
            large.filter(F.col("u2") != F.col("v2"))
            .select(
                F.least("u2", "v2").alias("u"),
                F.greatest("u2", "v2").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)  # referenced twice by small-star
        )

        # --- small-star ---
        nbrs1 = e1.select("u", "v").unionAll(
            e1.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        small_nbrs = nbrs1.filter(F.col("v") <= F.col("u"))
        mins1 = small_nbrs.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_nbrs.join(mins1, "u")
            .select(
                F.col("v").alias("a"),
                F.col("m").alias("b"),
            )
            .unionAll(
                mins1.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
        )
        e2 = (
            small.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        # convergence: star-contracted edge set fixed point (xor-hash —
        # overflow-safe under ANSI mode, order-insensitive).  One driver
        # round-trip per iteration: the previous round's stats are reused.
        if prev_stats is None:
            prev_stats = e.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).collect()[0]
        after = e2.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        e = e2
        converged = (
            prev_stats["n"] == after["n"] and prev_stats["h"] == after["h"]
        )
        prev_stats = after
        if converged:
            break

    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component"))
    return members.unionAll(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def components_with_singletons(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node"
) -> DataFrame:
    """All nodes labeled; nodes without edges become their own component."""
    cc = connected_components(edges)
    return (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .join(cc, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )
