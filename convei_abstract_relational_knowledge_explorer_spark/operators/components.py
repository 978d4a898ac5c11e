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
from pyspark.sql.window import Window


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
    # canonical undirected edge list, self-loops dropped.  A NON-eager
    # localCheckpoint still cuts the upstream plan (the caller's edge
    # derivation can be arbitrarily expensive — e.g. an LSH pipeline) so
    # the iteration never recomputes it, but the materialization rides
    # the stats aggregate below — ONE Spark action instead of two
    # (r6 optimization: guide §1/§2.4, fewer jobs per round).
    _stats = [
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ]
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_stats = e.agg(*_stats).collect()[0]

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
        # e1 is referenced twice by small-star; both references share one
        # canonical subplan, so the exchanges under it are computed once
        # (ReusedExchange / AQE stage reuse) — no checkpoint job needed.
        # No mid-round distinct either (r6): small-star is duplicate-
        # tolerant — mins1 is a MIN (dup-insensitive) and e2 ends in its
        # own distinct — so deduping here would only add an exchange.
        e1 = large.filter(F.col("u2") != F.col("v2")).select(
            F.least("u2", "v2").alias("u"),
            F.greatest("u2", "v2").alias("v"),
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
            .localCheckpoint(eager=False)
        )

        # convergence: star-contracted edge set fixed point (xor-hash —
        # overflow-safe under ANSI mode, order-insensitive).  ONE Spark
        # action per iteration: the stats aggregate also materializes
        # e2's lazy checkpoint (lineage cut rides the stats job).
        after = e2.agg(*_stats).collect()[0]
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
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    max_component_size: int | None = None,
) -> DataFrame:
    """All nodes labeled; nodes without edges become their own component.

    ``max_component_size`` switches the connected part to
    :func:`guarded_components`: components above the bound are split by
    modularity local moves (the reference-Leiden-quality guard).
    """
    if max_component_size is not None:
        cc = guarded_components(edges, max_size=max_component_size)
    else:
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


def modularity_refine(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    resolution: float = 1.0,
    max_rounds: int = 8,
    parity_fn: str = "xxhash64",
) -> DataFrame:
    """Distributed modularity-aware local moves (Louvain phase 1) →
    (node, community), community = min member id.

    The semantic-quality pass r03 VERDICT ranked as the one real delta vs
    the reference's Leiden clustering (/root/reference/topic_analysis.py:
    143-153, RBConfiguration resolution 1.0): transitive connected
    components merge everything reachable, so one head-topic chain
    collapses thousands of topics into a single explorer row; modularity
    local moves only merge nodes whose linkage beats the configuration-
    model expectation ``w(u,c) − resolution·deg(u)·tot(c)/2m``, splitting
    chain-connected hairballs into dense communities.

    Shape: every round is two hash-partitioned aggregates and a window —
    (u, neighbor-community) weight sums, community degree totals, then an
    argmax-gain move per node.  Moves apply to a hash-selected half
    of the nodes per round (deterministic ``hash(node, round)``
    activation — the JOINT key, so no adjacent pair is co-active every
    round) so the synchronous update cannot oscillate; ties
    prefer staying put, then the smaller label, so the result is
    deterministic and partition-independent.  Labels localCheckpoint per
    round (lineage cut), one scalar move-count per round — the same
    driver-loop discipline as :func:`connected_components`.
    """
    w_expr = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
            w_expr.alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    nbrs = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    deg = nbrs.groupBy("u").agg(F.sum("w").alias("deg")).localCheckpoint(
        eager=False  # materialized (with e) by the m2 aggregate below
    )
    m2_row = deg.agg(F.sum("deg")).collect()[0][0]
    if not m2_row:
        return e.sparkSession.createDataFrame(
            [], "node long, community long"
        )
    m2 = float(m2_row)

    labels, _moves = _louvain_local_moves(
        nbrs, deg, m2, resolution, max_rounds, parity_fn
    )
    # deterministic community ids: min member node per label
    rep = labels.groupBy("label").agg(F.min("node").alias("community"))
    return labels.join(rep, "label").select("node", "community")


def _louvain_local_moves(
    nbrs: DataFrame,
    deg: DataFrame,
    m2: float,
    resolution: float,
    max_rounds: int,
    parity_fn: str,
) -> tuple[DataFrame, int]:
    """The Louvain phase-1 inner loop shared by :func:`modularity_refine`
    (single level) and :func:`louvain_multilevel` (per level) →
    ((node, label), total_moves).

    ``nbrs`` is the symmetric INTER-node adjacency (u, v, w) — self-loops
    excluded, because a node's self-weight travels with it and cancels
    out of the argmax between candidate communities.  ``deg`` is (u, deg)
    and MUST already include 2x any self-loop weight (contracted levels;
    zero at the base level), since the configuration-model expectation
    k_u·tot(c)/2m is over total degree.  ``m2`` = Σ deg = 2m, constant
    across contraction levels by construction.
    """
    labels = deg.select(F.col("u").alias("node"), F.col("u").alias("label"))
    total_moves = 0
    for rnd in range(max_rounds):
        # neighbor-community weights: w(u, c) for every community c that
        # touches u, plus u's own community as an explicit stay option.
        # The stay rows (weight 0) are unioned BEFORE the aggregation so
        # one hash aggregate covers both (weights are positive by the
        # Louvain contract, so sum-with-0 ≡ the former max(sum, 0)) —
        # one exchange per round instead of two (r6, guide §2.4).
        nl = nbrs.join(
            labels.select(F.col("node").alias("v"), F.col("label").alias("clab")),
            "v",
        )
        stay = labels.select(
            F.col("node").alias("u"),
            F.col("label").alias("clab"),
            F.lit(0.0).alias("w"),
        )
        cand = (
            nl.select("u", "clab", "w")
            .unionByName(stay)
            .groupBy("u", "clab")
            .agg(F.sum("w").alias("w_uc"))
        )
        comm_tot = (
            labels.join(deg, labels.node == deg.u)
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )
        cur = labels.select(F.col("node").alias("u"), F.col("label").alias("cur"))
        scored = (
            cand.join(cur, "u")
            .join(deg, "u")
            .join(comm_tot, F.col("clab") == F.col("label"))
            .select(
                "u",
                "clab",
                "cur",
                (
                    F.col("w_uc")
                    - F.lit(resolution)
                    * F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(F.col("clab") == F.col("cur"), F.col("deg"))
                        .otherwise(F.lit(0.0))
                    )
                    / F.lit(m2)
                ).alias("gain"),
            )
        )
        # best move: max gain; ties prefer staying, then the smaller label
        wbest = Window.partitionBy("u").orderBy(
            F.desc("gain"),
            F.desc(F.col("clab") == F.col("cur")),
            F.asc("clab"),
        )
        best = (
            scored.withColumn("rk", F.row_number().over(wbest))
            .filter(F.col("rk") == 1)
            .select("u", "clab", "cur")
        )
        # half the nodes move per round, activation hashed on the JOINT
        # (node, round) key: a FIXED per-node parity class lets two
        # same-parity adjacent nodes swap communities synchronously
        # forever (observed: all-parity-0 triangles deadlock at a
        # suboptimal split), while the joint hash decorrelates
        # co-activation across rounds so every adjacent pair soon gets
        # a round where exactly one of them moves — the standard
        # symmetry-breaking argument for randomized-async local moves.
        # parity_fn="md5" swaps in the portable porthash64 so an ANSI
        # SQL oracle can replay the schedule verbatim (q38/q184)
        if parity_fn == "md5":
            from .dedup import porthash64

            ph = porthash64(
                F.concat(
                    F.col("u").cast("string"),
                    F.lit(":"),
                    F.lit(str(rnd)),
                )
            )
        else:
            ph = F.xxhash64(F.col("u"), F.lit(rnd))
        active = F.pmod(ph, F.lit(2)) == 0
        # ONE action per round: the lazy checkpoint of the new labels is
        # materialized by the stats aggregate, which also counts actual
        # moves (activated AND wanting) and WANTED moves (argmax ≠ cur
        # regardless of activation) — no separate join-back count job.
        sel = best.select(
            F.col("u").alias("node"),
            F.when(active, F.col("clab")).otherwise(F.col("cur")).alias("label"),
            (F.col("clab") != F.col("cur")).cast("long").alias("_want"),
            (active & (F.col("clab") != F.col("cur")))
            .cast("long")
            .alias("_moved"),
        ).localCheckpoint(eager=False)
        stats = sel.agg(
            F.sum("_moved").alias("moved"), F.sum("_want").alias("want")
        ).collect()[0]
        labels = sel.select("node", "label")
        total_moves += int(stats["moved"] or 0)
        # SOUND fixed-point test (r6, ADVICE #1): if NO node's argmax
        # differs from its current community, every later round computes
        # the identical argmax on the identical labels and moves nothing
        # — a true fixed point, which an unrolled fixed-round oracle
        # replays as no-op rounds.  (The former `two zero-MOVE rounds`
        # break was unsound under the joint hash(node, round) activation:
        # a discontent node inactive in both rounds could still move
        # later, diverging from the oracle's full replay.)
        if int(stats["want"] or 0) == 0:
            break
    return labels, total_moves


def _refine_connected(labels: DataFrame, e: DataFrame) -> DataFrame:
    """Leiden's subpartition-connectivity refinement (Traag et al.,
    Sci. Rep. 2019, §2.2 / Theorem 3's invariant), deterministic form:
    split every community into the CONNECTED COMPONENTS of its induced
    intra-community edge set, new label = min member per part.  Louvain
    local moves can strand a community disconnected (a cut-vertex
    departs for a heavier community and leaves its old neighbors
    split — the paper's headline pathology); refining BEFORE each
    contraction guarantees every contracted super-node is internally
    connected, and one final pass over the ORIGINAL edge set
    guarantees the returned communities are too.  Cost: one CC run
    over intra edges only (components cannot bridge communities, so
    all communities resolve in the same O(log² n) loop)."""
    lu = labels.select(F.col("node").alias("u"), F.col("label").alias("_lu"))
    lv = labels.select(F.col("node").alias("v"), F.col("label").alias("_lv"))
    intra = (
        e.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("_lu") == F.col("_lv"))
        .select("u", "v")
    )
    comp = connected_components(intra, src="u", dst="v")
    return labels.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("label")
    )


def louvain_multilevel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    resolution: float = 1.0,
    rounds_per_level: int = 4,
    max_levels: int = 3,
    parity_fn: str = "xxhash64",
    refine: bool = False,
) -> DataFrame:
    """Full multi-level Louvain — local moves + GRAPH CONTRACTION,
    iterated — → (node, community), community = min ORIGINAL member id.

    Closes the one semantic delta r4's VERDICT ranked top vs the
    reference's Leiden clustering (/root/reference/topic_analysis.py:
    143-153, RBConfiguration resolution γ): :func:`modularity_refine` is
    phase 1 only — single nodes move between communities, so two dense
    cliques bridged by a heavy edge bundle can never merge (moving any
    ONE member out of its clique always loses more intra-clique weight
    than the bundle gains).  The aggregation phase fixes exactly that
    regime (Blondel et al. 2008 §2; Traag et al. 2019 keep the same
    contraction loop): after local moves converge, each community
    contracts to a super-node — inter-community weights sum into
    super-edges, intra-community weights into SELF-LOOPS — and local
    moves re-run on the contracted graph, where the bundled cliques are
    single nodes that merge in one move.

    Per level: the same deterministic parity-scheduled local moves as
    :func:`modularity_refine` (ties prefer stay, then smaller label;
    round parity by ``parity_fn`` so ``"md5"`` lets an ANSI-SQL oracle
    replay every round verbatim), then one groupBy contraction.  The
    configuration-model bookkeeping across levels: super-node degree
    includes 2x its self-loop, so Σ deg — and with it 2m and every
    gain denominator — is INVARIANT under contraction (asserted by the
    algebra, relied on by the oracle replay).

    Scale shape: each level is strictly smaller (communities ≤ nodes);
    contraction is one groupBy over the level's edge list; per-round
    cost is two hash aggregates + a per-node window, exactly phase 1's.
    A level whose local moves make ZERO moves is a fixed point — every
    later level would replay the identical schedule on the identical
    graph — so the loop exits early, which an unrolled fixed-level
    oracle replays as no-op levels.  Labels localCheckpoint per round,
    edges per level (lineage cut).

    ``refine=True`` adds Leiden's refinement (:func:`_refine_connected`)
    after every level's local moves AND once more on the final
    partition over the original edges — the returned communities are
    then GUARANTEED internally connected, the property Louvain lacks
    (Traag et al. 2019 §2.2; the q189 oracle replays each refinement
    as a same-label-constrained reachability closure).
    """
    w_expr = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
            w_expr.alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    spark = e.sparkSession
    # full count (not limit(1)): materializes the lazy checkpoint in ONE
    # job — a limit would leave it partially cached and concurrent AQE
    # stages of the first level would each recompute the (possibly
    # expensive) edge derivation for the remaining partitions
    if e.count() == 0:
        return spark.createDataFrame([], "node long, community long")

    e_base = e  # original normalized edges, for the final refinement
    # original node -> current super-node (level-graph node id)
    node_map = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("cur"))
        .localCheckpoint(eager=False)
    )
    # (u, s): self-loop weight of super-node u (empty at the base level;
    # schema derived from e so string node ids keep their type)
    self_w = e.select("u", F.lit(0.0).alias("s")).limit(0)

    for _level in range(max_levels):
        nbrs = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        deg = (
            nbrs.groupBy("u")
            .agg(F.sum("w").alias("_dinter"))
            .join(self_w, "u", "full_outer")
            .select(
                "u",
                (
                    F.coalesce(F.col("_dinter"), F.lit(0.0))
                    + 2.0 * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("deg"),
            )
            .localCheckpoint(eager=False)  # materialized by the m2 agg
        )
        m2 = float(deg.agg(F.sum("deg")).collect()[0][0] or 0.0)
        if m2 == 0.0:
            break
        labels, n_moves = _louvain_local_moves(
            nbrs, deg, m2, resolution, rounds_per_level, parity_fn
        )
        if refine:
            # split disconnected communities BEFORE they contract into
            # (and fuse inside) a single super-node
            labels = _refine_connected(labels, e)
        # fold this level's membership into the original-node mapping
        node_map = (
            node_map.join(
                labels.select(
                    F.col("node").alias("cur"), F.col("label").alias("_nl")
                ),
                "cur",
            )
            .select("node", F.col("_nl").alias("cur"))
            .localCheckpoint(eager=False)
        )
        if n_moves == 0:
            break  # fixed point: later levels replay identically
        if _level == max_levels - 1:
            break  # last level: contraction output would be unused
        # contract: communities -> super-nodes; intra weight -> self-loops
        lu = labels.select(F.col("node").alias("u"), F.col("label").alias("_lu"))
        lv = labels.select(F.col("node").alias("v"), F.col("label").alias("_lv"))
        merged = (
            e.join(lu, "u")
            .join(lv, "v")
            .select(
                F.least("_lu", "_lv").alias("u"),
                F.greatest("_lu", "_lv").alias("v"),
                "w",
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=False)
        )
        old_self = (
            self_w.join(
                labels.select(F.col("node").alias("u"), "label"), "u"
            )
            .groupBy(F.col("label").alias("u"))
            .agg(F.sum("s").alias("s"))
        )
        # all three contraction frames checkpoint LAZILY: the next
        # level's first action (the deg/m2 aggregate) materializes them
        # in one job instead of three eager checkpoint jobs (r6)
        self_w = (
            merged.filter(F.col("u") == F.col("v"))
            .select("u", F.col("w").alias("s"))
            .unionByName(old_self)
            .groupBy("u")
            .agg(F.sum("s").alias("s"))
            .localCheckpoint(eager=False)
        )
        e = merged.filter(F.col("u") != F.col("v")).localCheckpoint(
            eager=False
        )

    if refine:
        # final guarantee pass on the ORIGINAL edge set: a cut-vertex
        # departure at the last level can still strand a community
        final = _refine_connected(
            node_map.select("node", F.col("cur").alias("label")), e_base
        )
        node_map = final.select("node", F.col("label").alias("cur"))
    # deterministic community ids: min ORIGINAL member per final label
    rep = node_map.groupBy("cur").agg(F.min("node").alias("community"))
    return node_map.join(rep, "cur").select("node", "community")


def guarded_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_size: int = 1000,
    resolution: float = 1.0,
    max_rounds: int = 8,
) -> DataFrame:
    """Connected components with a mega-component guard: components no
    larger than ``max_size`` keep their CC label (for near-dup graphs the
    transitive closure IS the semantics); oversized components — the
    head-topic hairballs where CC and the reference's Leiden visibly
    diverge — are re-labeled by :func:`modularity_refine` over just their
    own edges.  Community ids stay min-member-id, so labels from the two
    paths can never collide (disjoint node sets, both labeled by min id).
    """
    cc = connected_components(edges, src, dst)
    big = (
        cc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_size)
        .select("component")
    )
    small_labels = cc.join(big, "component", "left_anti").select(
        "node", "component"
    )
    big_nodes = cc.join(big, "component", "left_semi").select("node")
    sub = edges.join(
        big_nodes.withColumnRenamed("node", src), src, "left_semi"
    )
    refined = modularity_refine(
        sub, src, dst, resolution=resolution, max_rounds=max_rounds
    ).select("node", F.col("community").alias("component"))
    return small_labels.unionByName(refined)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 6,
    damping_pct: int = 85,
    scale: int = 10**9,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """Fixed-point integer PageRank → (node, rank_scaled).

    Node importance over the materialized entity graph — the classic
    "which canonical entities anchor the knowledge graph" ranking the
    reference approximates with per-entity document counts
    (/root/reference/build_reports.py:167-200 top-N report idiom); true
    PageRank additionally propagates importance through co-occurrence
    edges, which is the standard upgrade at web scale.

    ALL arithmetic is 64-bit integer — ranks are maintained as
    ``rank_scaled`` (multiples of 1/scale), edge contributions are
    ``(rank * w) DIV out_w`` and the damping step is
    ``((100-d)*scale) DIV 100 + (d * recv) DIV 100``.  Integer sums are
    associative, so the result is bit-identical regardless of partition
    count, aggregation order, or engine — the same determinism-by-
    quantization trick as the int8 embedding codec (embedding.py) and the
    q38 integer edge weights; the deliberate quantization error is
    ≤ n_edges/scale per node per round (≪ 1e-6 at scale=1e9).

    Dangling mass (nodes with no out-edges) is redistributed uniformly:
    each node receives ``d * (D DIV n) DIV 100`` where D is the summed
    dangling rank — computed with a 1-row aggregate broadcast-crossjoined
    onto the update (no driver collect in the loop).

    Scale shape: per iteration one equi-join on ``src`` (rank × out_w are
    both keyed by node), one hash aggregate on ``dst``, one broadcast of a
    single row.  Ranks localCheckpoint per iteration (lineage cut, same
    discipline as :func:`connected_components`).  Overflow headroom:
    rank ≤ n·scale and contributions multiply by integer weights —
    (n·scale)·w must stay < 2^63, i.e. w·n < 9.2e9 at scale=1e9; callers
    with heavier graphs lower ``scale``.

    ``seeds``: personalized PageRank (Haveliwala, WWW'02) — the restart
    mass and the dangling redistribution go ONLY to the seed set
    (uniform share per seed, total mass preserved), giving
    seed-relative entity relatedness over the KG instead of global
    importance; seeds=None is classic uniform PageRank, bit-identical
    to before.  Ranks still initialize uniformly (bounded-round
    semantics: the oracle replays the same recurrence from the same
    start).
    """
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w")
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    out_w = e.groupBy("u").agg(F.sum("w").alias("out_w"))
    # out-degree folded into the edge frame ONCE (r6, guide §2.4): the
    # per-iteration contribution join then needs only ranks ⋈ e2 instead
    # of re-joining out_w every round — one fewer exchange per iteration.
    e2 = e.join(out_w, "u").localCheckpoint(eager=False)
    nodes = (
        e.select("u")
        .unionAll(e.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    # static dangling set (nodes with no out-edges), computed once; the
    # per-round dangling mass is then a semi-join of ranks against it,
    # whose ranks-side exchange is shared with the contribution join.
    dang_nodes = nodes.join(out_w, "u", "left_anti").localCheckpoint(
        eager=False
    )
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, rank_scaled long"
        )
    if seeds is None:
        # uniform restart: every node is its own "seed"
        marked = nodes.select("u", F.lit(1).alias("is_seed"))
        n_restart = n_nodes
    else:
        sd = seeds.select(F.col(seed_col).alias("u")).distinct()
        marked = nodes.join(
            sd.select("u", F.lit(1).alias("is_seed")), "u", "left"
        ).select("u", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        marked = marked.localCheckpoint(eager=False)
        n_restart = marked.agg(F.sum("is_seed")).collect()[0][0] or 0
        if n_restart == 0:
            raise ValueError("no seed appears in the graph")
    # restart mass (1-d)·n·scale split over the restart set, per round
    base_each = (((100 - damping_pct) * scale) // 100) * n_nodes // n_restart

    ranks = nodes.select("u", F.lit(scale).cast("long").alias("r"))
    for _ in range(iterations):
        # per-edge contribution, integer-exact: (r * w) DIV out_w
        contrib = e2.join(ranks, "u").select(
            F.col("v").alias("u"),
            F.expr("(r * w) DIV out_w").alias("c"),
        )
        recv = contrib.groupBy("u").agg(F.sum("c").alias("recv"))
        # dangling mass: ranks of nodes with no out-edges, shared equally
        dang = (
            ranks.join(dang_nodes, "u", "left_semi")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("d_total"))
            .select(
                F.expr(f"d_total DIV {n_restart}").alias("d_share")
            )
        )
        ranks = (
            marked.join(recv, "u", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "u",
                (
                    F.lit(base_each) * F.col("is_seed")
                    + F.expr(
                        f"({damping_pct} * (coalesce(recv, 0)"
                        f" + d_share * is_seed)) DIV 100"
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("u").alias("node"), F.col("r").alias("rank_scaled"))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 8,
    scale: int = 10**6,
) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg, JACM 1999) → (node,
    hub_scaled, auth_scaled).

    The directed sibling of :func:`pagerank` for the materialized KG:
    on a link-shaped graph, *authorities* are the entities good edges
    point AT and *hubs* are the entities that point at good
    authorities — the classic web-graph decomposition the reference's
    flat per-entity counts (/root/reference/build_reports.py:167-200)
    cannot express.  Mutual recursion: ``auth(v) = Σ_{u→v} hub(u)·w``,
    ``hub(u) = Σ_{u→v} auth(v)·w``, renormalized each half-step.

    ALL arithmetic is 64-bit integer (the q44 determinism-by-
    quantization idiom): scores are multiples of 1/scale and each
    half-step max-normalizes with ``(raw * scale) DIV max(raw)`` —
    max over longs is exact and associative, integer division
    truncates identically everywhere, so the result is bit-identical
    across engines, partitionings, and join orders.  Max-normalization
    (score ∈ [0, scale], best node exactly scale) is Kleinberg's
    presentation; any per-step rescaling preserves the power-iteration
    direction.  Overflow headroom: raw ≤ in_deg·w_max·scale, and the
    normalization multiplies by scale, so ``in_deg·w_max·scale² <
    2^63`` must hold — at the default scale=1e6 that allows
    in_deg·w_max < 9.2e6 per node; heavier graphs lower ``scale``.

    Scale shape per half-step: one equi-join of the score vector onto
    the edge list (both keyed by node), one map-side-combinable hash
    aggregate, one 1-row max broadcast — no driver collect in the
    loop.  Scores localCheckpoint per iteration (flat lineage, the
    :func:`pagerank` discipline).
    """
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w")
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select("u")
        .unionAll(e.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return edges.sparkSession.createDataFrame(
            [], "node string, hub_scaled long, auth_scaled long"
        )

    def _half_step(scores: DataFrame, out_key: str, in_key: str) -> DataFrame:
        # raw(y) = Σ over edges keyed x→y of score(x)·w, then
        # max-normalize back to [0, scale]
        raw = (
            e.join(scores.withColumnRenamed("node", out_key), out_key)
            .select(
                F.col(in_key).alias("node"),
                (F.col("sc") * F.col("w")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        mx = raw.agg(
            F.greatest(F.max("raw"), F.lit(1)).alias("mx")
        )
        return (
            nodes.select(F.col("u").alias("node"))
            .join(raw, "node", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.expr(
                    f"(coalesce(raw, 0) * {scale}) DIV mx"
                ).alias("sc"),
            )
        )

    hubs = nodes.select(
        F.col("u").alias("node"), F.lit(scale).cast("long").alias("sc")
    )
    auths = None
    # r6: lazy checkpoints — each half-step references the previous one
    # exactly once, so the chain materializes in the caller's single
    # action instead of 2·iterations eager checkpoint jobs
    for _ in range(iterations):
        auths = _half_step(hubs, "u", "v").localCheckpoint(eager=False)
        hubs = _half_step(auths, "v", "u").localCheckpoint(eager=False)
    return (
        hubs.select("node", F.col("sc").alias("hub_scaled"))
        .join(
            auths.select("node", F.col("sc").alias("auth_scaled")), "node"
        )
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle and wedge counts → (node, n_triangles, n_wedges).

    Local clustering structure over the entity graph (n_triangles /
    n_wedges is the local clustering coefficient; kept as two exact
    integers so the result is engine- and partition-independent).  The
    standard distributed formulation (Suri & Vassilvitskii, WWW'11
    node-iterator): orient every edge low→high id, enumerate wedges
    (a<b<c) by joining the oriented edge list with itself on the middle
    node, then semi-join the closing edge (a,c).  Both joins are
    equi-joins on node id — hash-partitioned, no cartesian anywhere; the
    orientation bounds the wedge fan-out by the HIGH-degree endpoint's
    lower-id neighbors, the classic skew cap.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ab, bc = e.alias("ab"), e.alias("bc")
    wedges = ab.join(bc, F.col("ab.v") == F.col("bc.u")).select(
        F.col("ab.u").alias("a"), F.col("ab.v").alias("b"), F.col("bc.v").alias("c")
    )
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["a", "c"], "left_semi")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.expr("(deg * (deg - 1)) DIV 2").alias("n_wedges"),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_depth: int = 8,
) -> DataFrame:
    """Multi-source BFS → (seed, node, dist): unweighted shortest hop
    count from every seed over the undirected graph, up to ``max_depth``
    (unreachable pairs omitted).

    Frontier-style iteration — the textbook Pregel shape as DataFrames:
    each round expands only LAST round's newly-settled (seed, node)
    pairs through one equi-join on the edge list, min-aggregates, and
    anti-joins against the settled set, so total work is O(edges ×
    avg-eccentricity) not O(edges × rounds).  All quantities integer;
    one scalar count per round for termination (same driver-loop
    discipline as :func:`connected_components`).  Keys are (seed, node)
    composites, so multi-source runs cost ONE pass, not one per seed —
    the harmonic/closeness-centrality and ego-network idiom at scale.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    settled = (
        seeds.select(F.col(seed_col).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=False)
    )
    # ONE action per depth (r6): the emptiness count materializes the
    # frontier's lazy checkpoint; `settled` stays a lazy union of the
    # (≤ max_depth) materialized frontiers — no per-round re-checkpoint.
    frontier = settled
    for depth in range(1, max_depth + 1):
        grown = (
            frontier.join(nbrs, frontier["node"] == nbrs["u"])
            .select("seed", F.col("v").alias("node"), F.lit(depth).alias("dist"))
            .distinct()
            .join(settled, ["seed", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        if grown.count() == 0:
            break
        settled = settled.unionAll(grown)
        frontier = grown
    return settled


def neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    radius: int = 4,
    k: int = 16,
    hash_seed: str = "anf",
) -> DataFrame:
    """ANF / HyperANF-style neighborhood function → (node, n_kept,
    est_reach): for every node, an estimate of |ball(node, radius)| —
    how many nodes are within ``radius`` hops on the undirected graph.

    The effective-diameter / reach-distribution primitive (Palmer-
    Gibbons-Faloutsos ANF, KDD'02; Boldi-Vigna HyperANF, WWW'11): exact
    per-node ball sizes need one BFS per node (quadratic); instead each
    node carries a bounded K-minimum-values sketch of the hashed node
    ids it has reached, and one round of sketch-merge per hop estimates
    every ball at once.  Merging KMV sketches is "union the hash sets,
    keep the k smallest" — associative, idempotent, and ORDER-FREE, so
    the whole iteration is deterministic: same hashes (portable md5
    lanes, the q24/q54 idiom), same k-th order statistic, same
    ``floor((k-1)·2^60 / h_k)`` estimate in any engine.  Balls with
    fewer than ``k`` members are counted EXACTLY (the sketch holds the
    whole set).

    Scale shape per round: one equi-join of the (node, hash) sketch
    rows onto the adjacency list, one distinct, one per-node ordered
    window capped at k rows (WindowGroupLimit keeps map-side state at
    k per node BEFORE the exchange — the q54 plan shape).  State is
    ≤ k rows per node regardless of graph size; rounds =
    ``radius`` with no data-dependent convergence loop, so the oracle
    unrolls the identical rounds.  HyperANF's HyperLogLog registers
    would shrink the constant further; KMV keeps the exact-below-k
    property and the cross-engine integer estimator, which is worth
    more here.
    """
    from .dedup import porthash64
    from .sketches import HASH_SPACE

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = nbrs.select(F.col("u").alias("node")).distinct()
    sketch = nodes.select(
        "node",
        porthash64(F.col("node").cast("string"), hash_seed).alias("h"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy("h")
    for _ in range(radius):
        grown = sketch.join(nbrs, sketch["node"] == nbrs["u"]).select(
            F.col("v").alias("node"), "h"
        )
        sketch = (
            sketch.unionAll(grown)
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
    est_saturated = F.floor(
        F.lit(float((k - 1) * HASH_SPACE)) / F.max("h")
    ).cast("long")
    return sketch.groupBy("node").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.when(F.count("*") < k, F.count("*"))
        .otherwise(est_saturated)
        .cast("long")
        .alias("est_reach"),
    )


def sample_neighbors(
    edges: DataFrame,
    fanouts: list[int],
    src: str = "src",
    dst: str = "dst",
    hash_seed: str = "sage",
) -> DataFrame:
    """GraphSAGE-style layered neighbor sampling → (root, hop, u, v):
    the sampled message-passing edges for a ``len(fanouts)``-layer GNN
    minibatch over the undirected graph — hop 1 keeps ``fanouts[0]``
    neighbors per root, hop 2 keeps ``fanouts[1]`` neighbors per hop-1
    node, and so on (Hamilton, Ying & Leskovec, NIPS'17).

    Sampling is DETERMINISTIC: node u's neighbor list is ranked by the
    portable hash of the (u, v) pair (ties by v) and each hop keeps a
    rank prefix — the content-addressed sampling idiom this repo uses
    everywhere (q31/q53/q64): reproducible across runs, engines, and
    partitionings, and a node's sample never changes when OTHER parts
    of the graph change (no RNG state to coordinate across executors —
    the property that makes distributed minibatch generation cheap).

    Scale shape: the per-node rank prefix is computed ONCE on the
    adjacency list (WindowGroupLimit caps map-side state at
    max(fanouts) rows per node), then each hop is one equi-join of the
    growing frontier onto that bounded ranked adjacency — fan-out is
    Π fanouts by construction, never degree-driven, which is the whole
    point of GraphSAGE at web scale (hub nodes contribute a bounded
    sample, not their full neighborhood).
    """
    from .dedup import porthash64

    if not fanouts or any(f <= 0 for f in fanouts):
        raise ValueError("fanouts must be a non-empty list of positives")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    h = porthash64(
        F.concat(
            F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string")
        ),
        hash_seed,
    )
    w = Window.partitionBy("u").orderBy("h", "v")
    ranked = (
        nbrs.withColumn("h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max(fanouts))
        .localCheckpoint(eager=True)
    )
    # frontier carries (root, node): the nodes whose neighborhoods the
    # next hop samples; per root, an expanded (root, node) pair expands
    # ONCE (the sampled subgraph per root is an edge set, not a walk
    # multiset — the DGL/PyG block convention)
    cur = ranked.select(F.col("u").alias("root")).distinct()
    cur = cur.select("root", F.col("root").alias("node"))
    out = None
    for hop, f in enumerate(fanouts, start=1):
        layer = (
            cur.join(ranked, cur["node"] == ranked["u"])
            .filter(F.col("_rn") <= f)
            .select("root", F.lit(hop).alias("hop"), "u", "v")
        )
        out = layer if out is None else out.unionAll(layer)
        cur = layer.select("root", F.col("v").alias("node")).distinct()
    return out


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    seed_col: str = "node",
    max_rounds: int = 6,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths → (node, dist): minimum
    path cost from the nearest seed over the undirected graph, using at
    most ``max_rounds`` edges (unreachable nodes omitted).

    The weighted sibling of :func:`bfs_distances` — distance-to-
    nearest-hub assignment over the materialized KG (which canonical
    entity does each node orbit, and how tightly).  Bellman-Ford
    rounds with the delta optimization: only nodes whose distance
    IMPROVED last round relax their neighbors this round, which is
    provably identical to full relaxation (an unimproved node's
    contributions were already min-folded the round it settled) —
    so the bounded-round result is exactly "min cost over paths of
    ≤ max_rounds edges", the recurrence an oracle can replay with
    FULL relaxation per round and still hash-match.

    Parallel edges keep their cheapest weight; weights must be
    non-negative integers (costs, not similarities — callers invert
    similarity weights first).  All arithmetic is 64-bit integer.
    Scale shape per round: one equi-join of the improved frontier onto
    the adjacency list, one map-side-combinable min aggregate, one
    min-merge join against the settled table; the frontier SHRINKS as
    distances converge, so total work tracks the improvement wavefront,
    not edges × rounds.  One scalar emptiness probe per round for
    early stop (the :func:`connected_components` driver-loop
    discipline).
    """
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w")
        )
        .filter(F.col("u") != F.col("v"))
    )
    nbrs = (
        e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=False)
    )
    # ONE action per round (r6): the emptiness count materializes the
    # improved-frontier checkpoint; the merged dist table checkpoints
    # lazily and is materialized by the NEXT round's count (it sits
    # upstream of that round's frontier).
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            frontier.join(nbrs, frontier["node"] == nbrs["u"])
            .select(
                F.col("v").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        improved = (
            cand.join(
                dist.withColumnRenamed("dist", "old"), "node", "left"
            )
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("node", "dist")
            .localCheckpoint(eager=False)
        )
        if improved.count() == 0:
            break
        dist = (
            dist.unionAll(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        frontier = improved
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """The k-core of the undirected graph → (node,): the maximal subgraph
    in which every node keeps degree ≥ k — the standard KG pruning pass
    that trims low-connectivity periphery before expensive community/
    centrality analytics (Seidman 1983; the peeling loop is the textbook
    distributed formulation).

    Each round is one semi-join-restricted degree count (edges with BOTH
    endpoints alive → groupBy count) and one filter; nodes below k drop,
    which may cascade — the loop runs to the fixed point (one scalar
    count per round, early exit on stability), capped at ``max_rounds``.
    All quantities integer; deterministic and partition-independent.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nbrs = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    alive = nbrs.select("u").distinct().localCheckpoint(eager=False)
    n_prev = alive.count()  # materializes e/nbrs/alive in one job (r6)
    for _ in range(max_rounds):
        deg = (
            nbrs.join(alive, "u", "left_semi")
            .join(alive.select(F.col("u").alias("v")), "v", "left_semi")
            .groupBy("u")
            .agg(F.count("*").alias("d"))
        )
        alive = (
            deg.filter(F.col("d") >= k)
            .select("u")
            .localCheckpoint(eager=False)
        )
        n_now = alive.count()  # one action per peeling round (r6)
        if n_now == n_prev:
            break
        n_prev = n_now
    return alive.select(F.col("u").alias("node"))


def _min_reach_labels(
    nodes: DataFrame, edges: DataFrame, forward: bool, max_prop: int
) -> DataFrame:
    """Fixed point of ``lab(u) = min(u, min over u→v of lab(v))`` →
    (node, lab): the smallest label reachable FROM ``u`` along forward
    edges (``forward=False`` reverses the edge list first, giving the
    smallest label that can REACH ``u``).

    Pregel-shaped with POINTER JUMPING: each iteration fuses the 1-hop
    edge relaxation (``lab(u) ← min over u→v of lab(v)``, which alone
    needs O(eccentricity) rounds) with the shortcut
    ``lab(u) ← lab(lab(u))`` — sound because ``lab(u)`` is itself
    reachable from ``u`` and reachability is transitive, and it doubles
    label travel per round, so fixation lands in O(log diameter)
    rounds.  Labels localCheckpointed per round (lineage cut), xor-hash
    scalar convergence (the :func:`connected_components` discipline).
    The fixed point is data-determined — any engine that iterates to
    fixation gets identical labels — which is what lets the SCC oracle
    use an independent formulation.  Raises if ``max_prop`` rounds
    don't converge rather than returning a silent partial answer.
    """
    e = (
        edges
        if forward
        else edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    lab = nodes.select(
        "node", F.col("node").alias("lab")
    ).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_prop):
        adopted = (
            e.join(lab, e["v"] == lab["node"])
            .select(F.col("u").alias("node"), "lab")
        )
        hopped = (
            lab.unionAll(adopted)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        shortcut = (
            hopped.alias("a")
            .join(
                hopped.select(
                    F.col("node").alias("_ln"), F.col("lab").alias("_ll")
                ),
                F.col("a.lab") == F.col("_ln"),
            )
            .select(F.col("a.node").alias("node"), F.col("_ll").alias("lab"))
        )
        lab2 = (
            hopped.unionAll(shortcut)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=False)
        )
        # one action per round: the convergence hash materializes lab2
        stats = lab2.agg(
            F.expr("bit_xor(xxhash64(node, lab))").alias("h")
        ).collect()[0]
        lab = lab2
        if prev is not None and prev == stats["h"]:
            return lab
        prev = stats["h"]
    raise RuntimeError(
        f"min-label propagation did not converge in {max_prop} rounds"
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 20,
    max_prop: int = 40,
) -> DataFrame:
    """SCC decomposition of a DIRECTED graph → (node, scc_id) with
    ``scc_id`` = the smallest node id in the component (canonical, so
    the result is independent of the algorithm — the oracle can use a
    transitive-closure formulation and must still hash-match).

    The distributed forward-backward peeling scheme (FW-BW-MS, McLendon
    et al., and the Spark-native treatments that follow it): per round,
    ``f(u)`` = min label forward-reachable from u, ``b(u)`` = min label
    backward-reachable; nodes with ``f(u) == b(u) == m`` are exactly
    SCC(m) for every settled pivot m SIMULTANEOUSLY (m reaches u and u
    reaches m), and edges crossing distinct ``(f, b)`` classes can
    never be intra-SCC, so the residual graph shatters into independent
    classes — expected O(log n) peel rounds, never an all-pairs step.
    Undirected CC (:func:`connected_components`) is the wrong tool
    here: direction is the semantics (A links B ≠ B links A).

    Self-loops are dropped; isolated nodes come back as singletons.
    Raises after ``max_outer`` rounds instead of silently truncating.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    result = None
    active_nodes, active_edges = nodes, e
    # r6: one explicit action per peel round — the active-node count
    # materializes the lazy lab/active checkpoints; `result` stays a
    # lazy union of done-frames over materialized inputs (≤ max_outer
    # terms, bounded plan depth)
    n_active = active_nodes.count()
    for _ in range(max_outer):
        if n_active == 0:
            break
        f = _min_reach_labels(active_nodes, active_edges, True, max_prop)
        b = _min_reach_labels(active_nodes, active_edges, False, max_prop)
        lab = (
            f.join(
                b.select("node", F.col("lab").alias("_b")), "node"
            ).select("node", F.col("lab").alias("_f"), "_b")
        ).localCheckpoint(eager=False)
        done = lab.filter(F.col("_f") == F.col("_b")).select(
            "node", F.col("_f").alias("scc_id")
        )
        result = done if result is None else result.unionAll(done)
        remaining = lab.filter(F.col("_f") != F.col("_b"))
        active_nodes = remaining.select("node").localCheckpoint(eager=False)
        active_edges = (
            active_edges.join(
                remaining.select(
                    F.col("node").alias("u"),
                    F.col("_f").alias("_fu"),
                    F.col("_b").alias("_bu"),
                ),
                "u",
            )
            .join(
                remaining.select(
                    F.col("node").alias("v"),
                    F.col("_f").alias("_fv"),
                    F.col("_b").alias("_bv"),
                ),
                "v",
            )
            .filter(
                (F.col("_fu") == F.col("_fv")) & (F.col("_bu") == F.col("_bv"))
            )
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_active = active_nodes.count()
    else:
        raise RuntimeError(
            f"SCC peeling did not converge in {max_outer} rounds"
        )
    if result is None:  # edgeless input
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], schema=nodes.select("node", F.col("node").alias("scc_id")).schema
        )
    return result


def resource_allocation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1 << 40,
    max_degree: int | None = None,
) -> DataFrame:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang, EPJ B 2009)
    → (u, v, common_neighbors, ra_score) for NON-adjacent pairs u < v.

    score(u, v) = Σ_{z ∈ N(u) ∩ N(v)} 1/deg(z) — the strongest of the
    classic local similarity indices on co-occurrence graphs, and the
    KG-completion primitive: which entity pairs SHOULD be linked but
    aren't.  Kept exact: each term is ``scale DIV deg(z)`` in 64-bit
    integers, so sums are associative and the result is bit-identical
    across engines, partitionings and join orders (the q61 millibit
    idiom; no runtime floats anywhere).

    Shape: wedge enumeration through the middle node z — nbrs(z→u) ⋈
    nbrs(z→v) on z, u < v — then one left-anti equi-join removes pairs
    already adjacent.  All equi-joins, hash-partitioned; no cartesian.
    The fan-out is Σ_z deg(z)², quadratic in hub degree — the standard
    cap is ``max_degree``: hubs beyond it are EXCLUDED as middle nodes
    (their 1/deg contribution is negligible by construction, which is
    the whole point of the RA weighting; same skew rationale as the
    LSH band-frequency frontier).  Pass None (default) for the exact
    index.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = nbrs.groupBy(F.col("u").alias("z")).agg(
        F.count("*").cast("long").alias("deg")
    )
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    # wedge enumeration through z is the single-hot-key c² self-join
    # pattern (a hub z puts deg(z)²/2 pairs through ONE join key) — the
    # same blocked triangular form as the q66 candidate join spreads it
    # over (deg/B)² tasks; deg_z re-attaches by key afterwards
    from .dedup import _blocked_self_join

    # deg rides along as a key column (functionally dependent on z, so
    # partitions and join keys are unchanged) — one deg join, not two
    mid = nbrs.select(F.col("u").alias("z"), F.col("v").alias("n")).join(
        deg, "z", "inner"
    )
    wedges = _blocked_self_join(
        mid, ["z", "deg"], "n", keep_keys=True
    ).select(
        F.col("sa").alias("u"),
        F.col("sb").alias("v"),
        F.col("deg").alias("deg_z"),
    )
    return (
        wedges.join(e, ["u", "v"], "left_anti")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(F.expr(f"{scale} DIV deg_z")).cast("long").alias("ra_score"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seed: str = "walk",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic DeepWalk-style random-walk corpus (Perozzi et al.,
    KDD'14) → (start, walk, step, node), steps 0..walk_len.

    The embedding-training corpus generator for KG nodes: from every
    node, ``walks_per_node`` walks of ``walk_len`` hops over the
    undirected graph.  "Random" is a seeded hash, not an RNG — at step
    t on node c the walk takes neighbor ranked
    ``porthash64(start⊕walk⊕t⊕c, seed) mod deg(c)`` under the
    (partitioned) row_number ordering of N(c) — so the corpus is
    bit-identical across engines, partitionings and retries, and a
    recursive-CTE oracle can replay the exact recurrence.

    Shape: neighbor ranks are ONE hash-partitioned window (partition by
    node — never global); each hop is ONE equi-join on the composite
    (node, rank) key.  walk_len joins total, frontier-sized each —
    the Pregel shape, same discipline as :func:`bfs_distances`.
    """
    from .dedup import porthash64

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    ranked = nbrs.select(
        F.col("u").alias("node"),
        F.col("v").alias("nxt"),
        (
            F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1
        ).alias("rank"),
    ).localCheckpoint(eager=True)
    degs = ranked.groupBy("node").agg(F.count("*").cast("long").alias("deg"))

    starts = degs.select(F.col("node").alias("start"))
    walks = starts.select(
        "start",
        F.explode(F.array(*[F.lit(w) for w in range(walks_per_node)])).alias(
            "walk"
        ),
    )
    frontier = walks.select(
        "start", "walk", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    out = frontier
    for step in range(1, walk_len + 1):
        keyed = frontier.join(degs, "node").select(
            "start",
            "walk",
            "node",
            F.pmod(
                porthash64(
                    F.concat_ws(
                        "\x1f",
                        F.col("start").cast("string"),
                        F.col("walk").cast("string"),
                        F.lit(str(step)),
                        F.col("node").cast("string"),
                    ),
                    seed,
                ),
                F.col("deg"),
            ).alias("rank"),
        )
        frontier = (
            keyed.join(ranked, ["node", "rank"])
            .select(
                "start",
                "walk",
                F.lit(step).alias("step"),
                F.col("nxt").alias("node"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(frontier)
    return out


def connected_components_incremental(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    comp_col: str = "component",
    max_iterations: int = 25,
) -> DataFrame:
    """Fold a NEW edge batch into existing (node, component) labels
    without re-running CC over the full graph → updated (node,
    component) covering old and new nodes.

    The monthly-crawl KG-maintenance primitive: canonicalization labels
    exist for 10¹² nodes and an increment adds a sliver of edges — the
    full alternating-star iteration over the whole graph would be
    O(full) per increment.  Contraction instead: every labeled
    component collapses to its label node (old label = min member id,
    so the contracted node IS an original node), batch endpoints map
    through their labels (unknown nodes map to themselves), edges
    internal to an old component collapse to self-loops and vanish, and
    :func:`connected_components` runs on the CONTRACTED graph — sized
    by the increment plus the components it touches, not the corpus.
    Exactness: contraction preserves connectivity, and min-label ids
    are stable under it — min over contracted members equals min over
    original members because each old label already is its component's
    minimum; a test asserts incremental == full-recompute on random
    graph splits.  Cost shape: two equi-joins to map endpoints (the
    labels side is the big table — hash-partitioned, increment-sized
    probe), then CC on the contracted sliver, then one label-keyed
    join-back to update ONLY rows whose component merged (the
    upsert_partitioned sink applies it as a partition-pruned merge).
    """
    e = (
        new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(comp_col).alias("component")
    )
    lu = lab.select(
        F.col("node").alias("u"), F.col("component").alias("cu")
    )
    lv = lab.select(
        F.col("node").alias("v"), F.col("component").alias("cv")
    )
    contracted = (
        e.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            F.coalesce("cu", "u").alias("u"),
            F.coalesce("cv", "v").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    sub = connected_components(
        contracted, src="u", dst="v", max_iterations=max_iterations
    )
    relabel = sub.select(
        F.col("node").alias("component"),
        F.col("component").alias("_new_comp"),
    )
    updated_old = lab.join(relabel, "component", "left").select(
        "node",
        F.coalesce("_new_comp", F.col("component")).alias("component"),
    )
    new_rows = (
        sub.join(lab.select("node"), "node", "left_anti")
        .select("node", F.col("component"))
    )
    return updated_old.unionByName(new_rows)


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """Edges of the k-truss after ``rounds`` peeling rounds → (u, v).

    The edge-level sibling of :func:`k_core` (Cohen 2008): keep edges
    supported by ≥ k-2 triangles among SURVIVING edges, cascade.  Where
    k-core prunes weakly-attached nodes, k-truss prunes weakly-embedded
    EDGES — the stricter cohesion filter used to denoise co-occurrence
    graphs before community detection (every k-truss edge sits inside
    k-2 mutually-reinforcing wedges, so single-doc coincidences die
    first).  Per round: one symmetric-neighbor frame, two equi-joins
    enumerating each edge's common-neighbor count (the triangle_stats
    wedge shape, skew bounded by the low→high orientation of the
    input), one groupBy + HAVING.  Peeling is monotone (edges only
    leave), so an unchanged edge COUNT means a fixed point — the loop
    early-stops on the scalar count, same driver discipline as
    :func:`connected_components`.  Bounded-round semantics match the
    q70 oracle, which unrolls the identical rounds as chained
    MATERIALIZED CTEs (fixed point well before round 6 on the bench
    graph, asserted by the unit test).
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = e.count()  # materializes the canonical edge checkpoint (r6)
    for _ in range(rounds):
        nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        na = nbrs.select(F.col("u").alias("_eu"), F.col("v").alias("_w"))
        nb = nbrs.select(F.col("u").alias("_ev"), F.col("v").alias("_w"))
        survived = (
            e.join(na, F.col("u") == F.col("_eu"))
            .join(nb, (F.col("v") == F.col("_ev")) & (na["_w"] == nb["_w"]))
            .groupBy("u", "v")
            .agg(F.count("*").alias("_sup"))
            .filter(F.col("_sup") >= k - 2)
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        cur = survived.count()  # one action per peel round (r6)
        e = survived
        if cur == prev:
            break
        prev = cur
    return e


def minimum_spanning_forest(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 30,
) -> DataFrame:
    """Borůvka minimum spanning forest → the (src, dst, weight) edges of
    the MSF of the undirected graph — the single-linkage clustering
    backbone (cutting the returned edges above any threshold yields
    that threshold's clusters, ALL thresholds at once from one run —
    the dendrogram HDBSCAN-family methods are built on, closing the
    documented J11 granularity delta at the hierarchy level).

    Deterministic and oracle-able: parallel edges collapse to their min
    weight, and each component picks its minimum edge under the TOTAL
    order (weight, a, b) — a unique key per edge, so the forest is
    unique even with tied weights (no FP or RNG anywhere; integer
    weights recommended, the repo's exactness protocol).

    Scale shape — textbook distributed Borůvka (the MST algorithm with
    O(log n) rounds of purely partial-aggregatable work): per round,
    one struct-min groupBy per endpoint label (map-side combinable, no
    gram lists), then label contraction via :func:`connected_components`
    on the SELECTION graph only (one chosen edge per component — the
    contraction input halves every round, so round cost shrinks
    geometrically).  Components at least halve per round ⇒ ≤ log2(n)
    rounds; the loop stops on a scalar cross-edge count (the k_core
    early-stop idiom); every frontier frame is localCheckpointed so no
    round recomputes prior lineage.
    """
    e = (
        edges.select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    lbl = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    picked = []
    # r6 job-count discipline: the cross-edge count is the ONE explicit
    # action per round (materializes e/lbl/cross); sel and the updated
    # lbl checkpoint lazily and ride the CC run / next round's count.
    for _ in range(max_rounds):
        la = lbl.select(F.col("node").alias("a"), F.col("label").alias("_la"))
        lb = lbl.select(F.col("node").alias("b"), F.col("label").alias("_lb"))
        cross = (
            e.join(la, "a")
            .join(lb, "b")
            .filter(F.col("_la") != F.col("_lb"))
            .localCheckpoint(eager=False)
        )
        if cross.count() == 0:
            break
        s = F.struct("w", "a", "b").alias("_s")
        sel = (
            cross.select(F.col("_la").alias("_l"), s)
            .unionAll(cross.select(F.col("_lb").alias("_l"), s))
            .groupBy("_l")
            .agg(F.min("_s").alias("_s"))
            .select("_s.w", "_s.a", "_s.b")
            .distinct()
            .localCheckpoint(eager=False)
        )
        picked.append(sel)
        lg = (
            sel.join(la, "a")
            .join(lb, "b")
            .select(F.col("_la").alias("x"), F.col("_lb").alias("y"))
        )
        comp = connected_components(lg, "x", "y")
        lbl = (
            lbl.join(
                comp.withColumnRenamed("node", "label"), "label", "left"
            )
            .select(
                "node", F.coalesce("component", "label").alias("label")
            )
            .localCheckpoint(eager=False)
        )
    if not picked:
        out = e.filter(F.lit(False))
    else:
        out = picked[0]
        for p in picked[1:]:
            out = out.unionAll(p)
    return out.select(
        F.col("a").alias(src), F.col("b").alias(dst), F.col("w").alias(weight)
    )


def single_linkage_clusters(
    msf_edges: DataFrame,
    threshold: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Flat clusters + NOISE at one threshold from an MSF dendrogram.

    The HDBSCAN-family extraction step over
    :func:`minimum_spanning_forest` output: cut every backbone edge
    with ``weight > threshold`` and take connected components of what
    survives — exactly single-linkage clustering at that distance, for
    ANY threshold, without re-touching the original graph (the MSF is
    O(n) rows however dense the input was).  Nodes whose every
    dendrogram edge was cut come back as singletons with
    ``is_noise = true`` — the noise concept the flat CC/KMeans
    substitutes for the reference's HDBSCAN
    (/root/reference/multitopic_tracer.py:111-128) could not express
    (SURVEY §2 J11's documented delta, closed at the extraction level).

    Returns (node, cluster, cluster_size, is_noise); cluster = min
    member (deterministic).  Scale shape: one filter over the O(n) MSF,
    one :func:`connected_components` run on the kept subset (≤ n-1
    edges), two map-side-combinable aggregations — the expensive part
    (the MSF) is paid once for every threshold anyone ever asks for.
    """
    nodes = (
        msf_edges.select(F.col(src).alias("node"))
        .unionAll(msf_edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    kept = msf_edges.filter(F.col(weight) <= threshold)
    cc = connected_components(kept, src=src, dst=dst)
    labeled = (
        nodes.join(cc, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("cluster"),
        )
    )
    sizes = labeled.groupBy("cluster").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labeled.join(sizes, "cluster").select(
        "node",
        "cluster",
        "cluster_size",
        (F.col("cluster_size") == 1).alias("is_noise"),
    )


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 3,
) -> DataFrame:
    """Semi-supervised entity-TYPE propagation → (node, label, is_seed):
    ``rounds`` synchronous rounds of weighted majority vote from a small
    seed-labeled set over the undirected graph.

    The KG canonicalization step after components/communities: a handful
    of nodes carry a trusted type (from the curated dictionary, the
    reference's seed lists — populate_author_affiliations.py's alias
    tables are exactly such seeds) and every other node takes the type
    with the LARGEST total edge weight among its previously-labeled
    neighbors.  Seeds are clamped (they never change); non-seeds
    re-evaluate every round from the PREVIOUS round's labels — the
    synchronous (Jacobi) schedule, which unlike the asynchronous variant
    is deterministic under any partitioning.  Nodes with no labeled
    neighbor stay unlabeled and are absent from the output.

    Determinism: votes are integer weight sums (weight_col must be an
    integer count; default 1 per edge), argmax ties break to the
    SMALLEST label — so every round is a pure function of the previous
    one and the whole run replays verbatim as ``rounds`` unrolled SQL
    CTEs (the q44/q74 iterative-replay discipline).

    Plan per round: one equi-join (edges ⋈ labels, shuffle on node id)
    + one hash agg + one per-node window rank — all linear in |E|;
    ``localCheckpoint`` per round truncates lineage exactly as
    :func:`connected_components` does.  Rounds is a small constant
    (label influence saturates at the graph diameter of the seeded
    region), so total work is O(rounds·|E|).
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
    nbrs = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    sd = (
        seeds.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("label")
        )
        .dropDuplicates(["node"])
        .localCheckpoint(eager=False)
    )
    cur = sd
    wv = Window.partitionBy("dst_node").orderBy(
        F.desc("wt"), F.asc("label")
    )
    for _ in range(rounds):
        votes = (
            nbrs.join(cur, nbrs["u"] == cur["node"])
            .groupBy(F.col("v").alias("dst_node"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        picked = (
            votes.withColumn("rk", F.row_number().over(wv))
            .filter(F.col("rk") == 1)
            .select(F.col("dst_node").alias("node"), "label")
            .join(sd.select("node"), "node", "left_anti")
        )
        cur = sd.unionByName(picked).localCheckpoint(eager=False)
    return cur.join(
        sd.select("node", F.lit(True).alias("is_seed")), "node", "left"
    ).select(
        "node", "label", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    )


def degree_mixing(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree-mixing summary (assortativity profile) → one row per
    degree class: (degree, n_ends, sum_nbr_deg, mean_nbr_deg_milli).

    k_nn(k) — the mean degree of the neighbors of degree-k nodes — is
    THE standard scale-free-graph diagnostic (Pastor-Satorras et al.,
    PRL 2001): decreasing k_nn(k) = disassortative (hubs touch leaves,
    the web/KG signature), increasing = assortative (social-graph
    signature).  Over a KG's entity graph it answers "do head entities
    link to other heads?" — which decides whether hub salting matters
    for the join plan (the skew.py rationale, measured rather than
    assumed).

    Exact integer arithmetic end to end: degrees are counts over the
    DISTINCT undirected edge set (self-loops dropped, duplicate and
    reversed input rows collapse), each undirected edge contributes
    both (deg u, deg v) and (deg v, deg u) endpoint samples, and
    ``mean_nbr_deg_milli = (1000·Σ nbr_deg) DIV n_ends``.  The global
    assortativity coefficient is recoverable from these rows in exact
    rational form: with M = Σ n_ends, Sx = Σ degree·n_ends,
    Sxx = Σ degree²·n_ends, Sxy = Σ degree·sum_nbr_deg,
    r = (M·Sxy − Sx²) / (M·Sxx − Sx²).

    Plan: one symmetrize + distinct, one degree hash-agg, TWO
    broadcast-or-shuffle joins of the edge list against the (node,
    degree) frame, one final hash-agg keyed by the (bounded) degree
    class — linear in |E|, no windows, no collects.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    deg = und.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    ends = (
        und.join(deg.withColumnRenamed("d", "dx"), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dy")), "v"
        )
        .select("dx", "dy")
    )
    return (
        ends.groupBy(F.col("dx").alias("degree"))
        .agg(
            F.count("*").cast("long").alias("n_ends"),
            F.sum("dy").cast("long").alias("sum_nbr_deg"),
        )
        .select(
            "degree",
            "n_ends",
            "sum_nbr_deg",
            F.expr("(1000 * sum_nbr_deg) DIV n_ends").alias(
                "mean_nbr_deg_milli"
            ),
        )
    )


def supernode_compress(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Graph summarization by structural equivalence (the SWeG /
    supernode-compression idiom): nodes whose OPEN neighborhoods are
    identical collapse into one supernode → (supernode = min member,
    n_members, degree) per equivalence class.

    The KG-canonicalization cousin of exact dedup: two entity nodes
    attached to exactly the same neighbor set are indistinguishable to
    every downstream graph query, so the edge table can be rewritten
    against supernodes at a fraction of the size.  The neighbor-SET
    signature is computed WITHOUT materializing a neighbor array (the
    exact-dedup keeper lesson — a hub's neighborhood never becomes one
    row): per node, an order-insensitive 5-tuple of aggregates over the
    60-bit portable neighbor hashes — (bit_xor, sum, count, min, max).
    Collision of two DIFFERENT neighbor sets on all five simultaneously
    is astronomically improbable and, because the same md5 arithmetic
    runs in any ANSI engine, deterministic — an oracle replays the
    grouping verbatim.

    Plan: symmetrize + distinct (one shuffle), one per-node hash agg
    (map-side combinable), one per-signature agg.  Linear in |E|; no
    arrays, no Python, no windows.
    """
    from .dedup import porthash64

    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("u"), F.col(src_col).alias("v")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # the additive signature lane sums 20-bit hash residues so a hub of
    # up to 2^43 neighbors stays inside BIGINT in BOTH engines (DuckDB's
    # HUGEINT sum must cast back to BIGINT losslessly; Spark's long sum
    # must not wrap) — xor/min/max keep the full 60 bits collision-free
    sig = sym.select(
        "u", porthash64(F.col("v").cast("string"), "sn").alias("_h")
    ).groupBy("u").agg(
        F.expr("bit_xor(_h)").alias("_sx"),
        F.sum(F.expr("_h % 1048576")).alias("_ss"),
        F.count("*").cast("long").alias("degree"),
        F.min("_h").alias("_smin"),
        F.max("_h").alias("_smax"),
    )
    return (
        sig.groupBy("_sx", "_ss", "degree", "_smin", "_smax")
        .agg(
            F.min("u").alias("supernode"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select("supernode", "n_members", "degree")
    )


def butterfly_counts(
    memberships: DataFrame,
    left_col: str = "doc_id",
    right_col: str = "token",
    max_right_degree: int = 64,
) -> DataFrame:
    """Per-vertex butterfly counting (Sanei-Mehri et al., KDD'18) on a
    bipartite graph → (``left_col``, n_partners, n_butterflies): a
    butterfly is a 2×2 biclique, THE bipartite analog of the triangle
    and the base motif of bipartite clustering/community metrics (the
    doc–token, user–item, author–paper graphs of a web corpus are all
    bipartite — triangle machinery says nothing there).

    For left vertices u, w sharing ``c`` right neighbors, the pair
    closes C(c, 2) butterflies; per-vertex count is the sum over
    partners.  Exact integer arithmetic: ``c·(c−1) DIV 2``.

    Right vertices with degree > ``max_right_degree`` are purged first
    (the q124 block-purging guard): a stopword token adjacent to 10⁸
    docs contributes quadratic pairs and epsilon structural signal, so
    the standard practice is to count on the bounded-degree core —
    documented, deterministic, and replayed identically by the oracle.
    Plan: degree agg → purge → within-right self-join (each reducer ≤
    max_right_degree² per key) → pair agg → per-vertex sum via a
    two-sided union.  No arrays, no windows.
    """
    deg = memberships.groupBy(right_col).agg(
        F.countDistinct(left_col).alias("_rd")
    )
    kept = (
        memberships.select(right_col, left_col)
        .distinct()
        .join(
            deg.filter(
                (F.col("_rd") >= 2) & (F.col("_rd") <= max_right_degree)
            ).select(right_col),
            right_col,
        )
    )
    a = kept.select(F.col(right_col).alias("_r"), F.col(left_col).alias("u"))
    b = kept.select(F.col(right_col).alias("_r"), F.col(left_col).alias("w"))
    pairs = (
        a.join(b, "_r")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("_c"))
        .withColumn("_bf", F.expr("(_c * (_c - 1)) DIV 2"))
    )
    sides = pairs.select(
        F.col("u").alias(left_col), "_c", "_bf"
    ).unionByName(pairs.select(F.col("w").alias(left_col), "_c", "_bf"))
    return sides.groupBy(left_col).agg(
        F.count("*").cast("long").alias("n_partners"),
        F.sum("_bf").cast("long").alias("n_butterflies"),
    )


def maximal_independent_set(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    seed: str = "mis",
) -> DataFrame:
    """Luby-style maximal-independent-set selection with DETERMINISTIC
    hash priorities -> (node, status, round) where status is one of
    'mis', 'excluded', 'undecided'.

    The conflict-free scheduling primitive for entity-merge application:
    near-dup / same-as edges say "these two canonical nodes must not
    both act as merge leaders in the same pass"; an MIS over that
    conflict graph is a maximal set of merges that can all be applied
    in ONE pass with no write-write conflict (the rest wait for the
    next wave).  Luby's algorithm (Luby '86) in its permutation form:
    every round, each undecided node whose priority is a strict local
    minimum among its LIVE neighbors joins the set; its neighbors are
    excluded; incident edges vanish.  A node whose live edges have all
    disappeared (every former neighbor was excluded) has an empty
    neighbor minimum and wins the next round — maximality is by
    construction, not by a final sweep.  Expected O(log n) rounds;
    ``rounds`` CAPS the unrolling (leftovers are reported 'undecided',
    never silently dropped), which also makes the whole recurrence
    replayable round-by-round in SQL.

    Priorities are ``porthash64(node, seed)`` with the node id itself
    as the tiebreak, so the result is a pure deterministic function of
    the edge set — resume-stable, bit-identical in ANSI SQL.  Per
    round: one distinct over the live neighbor view + three equi-joins;
    ``localCheckpoint`` truncates lineage.  100 TB shape: the frontier
    only shrinks, every op is equi-keyed on node, no arrays, no
    windows, no driver state beyond the round counter.
    """
    from .dedup import porthash64

    def pri(col):
        return porthash64(F.col(col).cast("string"), seed)

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    undecided = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    decided = None  # (node, status, round)
    for r in range(1, rounds + 1):
        # strict local minimum of (hash, node) among live neighbors;
        # live edges only ever connect undecided nodes (invariant).
        nbr = e.select(
            F.col("u").alias("node"), F.col("v").alias("peer")
        ).unionAll(
            e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
        )
        beaten = (
            nbr.filter(
                (pri("peer") < pri("node"))
                | (
                    (pri("peer") == pri("node"))
                    & (F.col("peer") < F.col("node"))
                )
            )
            .select("node")
            .distinct()
        )
        winners = undecided.join(beaten, "node", "left_anti").select(
            "node",
            F.lit("mis").alias("status"),
            F.lit(r).alias("round"),
        )
        losers = (
            nbr.join(winners.select(F.col("node").alias("peer")), "peer")
            .select("node")
            .distinct()
            .select(
                "node",
                F.lit("excluded").alias("status"),
                F.lit(r).alias("round"),
            )
        )
        batch = winners.unionAll(losers).localCheckpoint(eager=False)
        decided = batch if decided is None else decided.unionAll(batch)
        gone = batch.select("node")
        undecided = undecided.join(gone, "node", "left_anti").localCheckpoint(
            eager=False
        )
        e = (
            e.join(gone.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        # one action per round: materializes batch -> live-edge residue
        # (and, transitively, the round's winner/loser evidence) before
        # the next round fans out multiple references to them
        e.count()
    leftovers = undecided.select(
        "node",
        F.lit("undecided").alias("status"),
        F.lit(rounds).alias("round"),
    )
    out = decided.unionAll(leftovers) if decided is not None else leftovers
    return out.select(
        "node", "status", F.col("round").cast("int").alias("round")
    )


def wl_refinement(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """1-dimensional Weisfeiler–Leman color refinement → (node,
    wl_color, class_size): each node's structural-role color after
    ``rounds`` rounds, plus how many nodes share it.

    The canonical graph-isomorphism / structural-role primitive
    (Weisfeiler & Leman '68; GIN expressiveness, Xu ICLR'19): color₀ =
    degree; each round, color' = hash(own color, MULTISET of neighbor
    colors).  Two nodes keep the same color iff their r-hop unfolded
    neighborhoods are indistinguishable — the refinement that powers
    KG-entity role typing (hub vs leaf vs bridge), graph-template
    detection across crawl snapshots, and candidate pruning for graph
    matching (only same-color nodes can correspond).

    The neighbor multiset is hashed ORDER-INSENSITIVELY without ever
    materializing an array (a hub's neighbor list is a mega-row — the
    q123 supernode lesson): three independent aggregation lanes over
    the per-neighbor 60-bit porthash — sum of bounded residues
    (mod 2^32, so even 2^30 neighbors sum below 2^63 exactly in every
    engine),
    xor, and count — are combined with the node's own color into the
    next 60-bit color.  Residue-lane collisions are astronomically
    unlikely and, crucially, DETERMINISTIC: the refinement is a pure
    function of the edge set, bit-identical in ANSI SQL.

    Per round: one groupBy over the undirected neighbor view + one
    join — the identical shuffle shape as one PageRank round.
    """
    from .dedup import porthash64

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbr = e.select(
        F.col("u").alias("node"), F.col("v").alias("peer")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    )
    colors = nbr.groupBy("node").agg(
        F.count("*").cast("long").alias("wl_color")
    )
    for r in range(1, rounds + 1):
        peer_colors = nbr.join(
            colors.select(
                F.col("node").alias("peer"), F.col("wl_color").alias("pc")
            ),
            "peer",
        ).select(
            "node",
            porthash64(F.col("pc").cast("string"), f"wl{r}").alias("ph"),
        )
        agg = peer_colors.groupBy("node").agg(
            F.sum(F.col("ph") % F.lit(1 << 32)).alias("lane_sum"),
            F.bit_xor("ph").alias("lane_xor"),
            F.count("*").alias("lane_n"),
        )
        colors = (
            colors.join(agg, "node")
            .select(
                "node",
                porthash64(
                    F.concat_ws(
                        ":",
                        F.col("wl_color").cast("string"),
                        F.col("lane_sum").cast("string"),
                        F.col("lane_xor").cast("string"),
                        F.col("lane_n").cast("string"),
                    ),
                    f"wlmix{r}",
                ).alias("wl_color"),
            )
            .localCheckpoint(eager=True)
        )
    sizes = colors.groupBy("wl_color").agg(
        F.count("*").cast("long").alias("class_size")
    )
    return colors.join(sizes, "wl_color").select(
        "node", "wl_color", "class_size"
    )


def align_labels(
    old_labels: DataFrame,
    new_labels: DataFrame,
    node_col: str = "node",
    old_col: str = "label_old",
    new_col: str = "label_new",
) -> DataFrame:
    """Cross-snapshot cluster-label alignment by RECIPROCAL best overlap
    → one row per new cluster: (label_new, stable_id, matched, overlap,
    n_new_nodes).

    The resumability half of entity canonicalization: every incremental
    rebuild (new crawl, new near-dup edges) re-runs connected
    components, and component ids computed from scratch are NOT stable
    — downstream tables keyed on canonical-entity id would churn on
    every run.  A new cluster inherits an old cluster's id iff each is
    the other's LARGEST-overlap partner (the q104 reciprocal-best-match
    idiom, ties broken to the smallest partner label): reciprocity
    makes the assignment injective by construction — no two new
    clusters can claim the same old id, with no driver-side greedy
    matching.  Unmatched new clusters (genuinely new entities, or
    splits that lost the reciprocity vote) keep their own fresh
    ``label_new`` with ``matched = false`` so callers can namespace
    them.

    Spark shape: one equi-join on node, one groupBy (label_new,
    label_old), two WindowGroupLimit argmaxes (rank-1 filters Catalyst
    pushes down), one join back — every step keyed, skew bounded by the
    largest single cluster pair.
    """
    o = old_labels.select(
        F.col(node_col).alias("node"), F.col(old_col).alias("label_old")
    )
    n = new_labels.select(
        F.col(node_col).alias("node"), F.col(new_col).alias("label_new")
    )
    overlap = (
        n.join(o, "node")
        .groupBy("label_new", "label_old")
        .agg(F.count("*").cast("long").alias("overlap"))
    )
    w_new = Window.partitionBy("label_new").orderBy(
        F.desc("overlap"), F.asc("label_old")
    )
    w_old = Window.partitionBy("label_old").orderBy(
        F.desc("overlap"), F.asc("label_new")
    )
    best_new = (
        overlap.withColumn("_rn", F.row_number().over(w_new))
        .filter(F.col("_rn") == 1)
        .select("label_new", "label_old", "overlap")
    )
    best_old = (
        overlap.withColumn("_rn", F.row_number().over(w_old))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("label_new").alias("label_new"),
            F.col("label_old").alias("label_old"),
        )
    )
    matched = best_new.join(best_old, ["label_new", "label_old"]).select(
        "label_new",
        F.col("label_old").alias("stable_id"),
        F.lit(True).alias("matched"),
        "overlap",
    )
    sizes = n.groupBy("label_new").agg(
        F.count("*").cast("long").alias("n_new_nodes")
    )
    return (
        sizes.join(matched, "label_new", "left")
        .select(
            "label_new",
            F.coalesce("stable_id", F.col("label_new")).alias("stable_id"),
            F.coalesce("matched", F.lit(False)).alias("matched"),
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            "n_new_nodes",
        )
    )

def topo_layers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """Kahn topological layering of a directed graph → (node, layer,
    status): longest-path depth from the sources for every node the
    peeling reaches within ``max_rounds``, ``status = 'unresolved'``
    for the rest (cycle members and everything downstream of one).

    The ontology sanity pass of KG construction: a subclass-of /
    part-of taxonomy must be a DAG, and its Kahn layer IS the concept
    depth (a node peels exactly when its last unpeeled predecessor
    does, so ``layer = 1 + max(layer(pred))`` — the longest-path level
    used for ontology levelling, cycle quarantine, and breadth-first
    materialization order of derived tables).  Cycles never peel:
    after ``max_rounds`` the survivors are exactly the nodes whose
    ancestry contains a cycle — the quarantine set a curator repairs —
    and the cap is part of the contract (a DAG of depth > max_rounds
    also reports its tail as unresolved, like q131's MIS leftovers).

    Per round: one left-anti join (live nodes minus live-edge heads)
    + one semi-join edge shrink — both keyed equi-joins, no windows,
    no driver state beyond one scalar emptiness probe; the identical
    per-round shuffle budget as one BFS round.
    """
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    live = e0
    out = None
    # r6: one action per peel round — the emptiness count materializes
    # the peel checkpoint; und/live checkpoint lazily and ride the next
    # round's count (they sit upstream of the next peel)
    for r in range(max_rounds):
        peel = (
            und.join(
                live.select(F.col("v").alias("node")).distinct(),
                "node",
                "left_anti",
            )
            .select("node", F.lit(r).cast("int").alias("layer"))
            .localCheckpoint(eager=False)
        )
        if peel.count() == 0:
            break
        out = peel if out is None else out.unionAll(peel)
        und = und.join(peel, "node", "left_anti").localCheckpoint(eager=False)
        live = live.join(
            peel.select(F.col("node").alias("u")), "u", "left_anti"
        ).localCheckpoint(eager=False)
    layered = (
        out.select("node", "layer", F.lit("layered").alias("status"))
        if out is not None
        else und.limit(0).select(
            "node",
            F.lit(0).cast("int").alias("layer"),
            F.lit("layered").alias("status"),
        )
    )
    unresolved = und.select(
        "node",
        F.lit(None).cast("int").alias("layer"),
        F.lit("unresolved").alias("status"),
    )
    return layered.unionAll(unresolved)

def ancestor_closure(
    parents: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    doubling_rounds: int = 5,
) -> DataFrame:
    """Transitive ancestor closure of a parent FOREST by pointer
    doubling → (node, anc, up) with ``up`` = #edges walked upward
    (``up >= 1``; the self row is NOT emitted).

    Binary lifting, distributed: round k joins the closure with itself
    (ancestor-of-ancestor), so after k rounds every ancestor within
    2^k hops is present — ``doubling_rounds = 5`` covers taxonomies 32
    deep, and real subclass-of hierarchies are < 20 (log-round
    closure, NOT depth-round: a 1000-deep pathological chain costs 10
    joins, not 1000 — the q129 pointer-doubling discipline applied to
    the FULL closure instead of the terminal).  In a forest each
    (node, anc) pair has exactly one path, so the self-join's
    rediscoveries are bit-identical rows and one ``distinct`` per
    round dedupes them.  Output size is Σ depth(node) — bounded by
    depth × n, the payload every LCA / subsumption / inheritance query
    needs anyway.
    """
    c = (
        parents.select(
            F.col(node_col).alias("node"), F.col(parent_col).alias("anc")
        )
        .filter(F.col("anc").isNotNull() & (F.col("anc") != F.col("node")))
        .withColumn("up", F.lit(1).cast("int"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_prev = c.count()  # materializes the base closure (r6)
    for _ in range(doubling_rounds):
        hop = (
            c.alias("a")
            .join(
                c.alias("b"), F.col("a.anc") == F.col("b.node")
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("b.anc").alias("anc"),
                (F.col("a.up") + F.col("b.up")).cast("int").alias("up"),
            )
        )
        grown = c.unionAll(hop).distinct().localCheckpoint(eager=False)
        n_now = grown.count()  # one action per doubling round (r6)
        if n_now == n_prev:
            c = grown
            break
        c = grown
        n_prev = n_now
    return c


def taxonomy_lca(
    parents: DataFrame,
    pairs: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    a_col: str = "a",
    b_col: str = "b",
    doubling_rounds: int = 5,
) -> DataFrame:
    """Lowest common ancestor for query ``pairs`` over a parent forest
    → (a, b, lca, lca_depth, dist): the deepest node on both ancestor
    paths, its depth, and the tree distance ``depth(a) + depth(b) -
    2·lca_depth``; pairs in different trees report NULL lca/dist.

    The ontology-merge primitive of KG canonicalization: semantic
    similarity of two linked types (Wu-Palmer, Resnik) and the
    join-target of subsumption checks are all functions of the LCA.
    Built on :func:`ancestor_closure` (log-round pointer doubling),
    closed to include each node as its own 0-hop ancestor so that an
    ancestor pair (a descendant-of b) resolves to b itself; the LCA
    per pair is one argmax window over the equi-join of the two
    closures on the shared ancestor — in a forest ancestor depths
    along one path are unique, so the argmax is deterministic without
    a tiebreak (one is kept on (lca) anyway for engine parity).
    """
    clo = ancestor_closure(
        parents, node_col, parent_col, doubling_rounds
    )
    nodes = (
        parents.select(F.col(node_col).alias("node"))
        .unionAll(
            parents.select(F.col(parent_col).alias("node")).filter(
                F.col(parent_col).isNotNull()
            )
        )
        .distinct()
    )
    selfrows = nodes.select(
        "node", F.col("node").alias("anc"), F.lit(0).cast("int").alias("up")
    )
    closed = clo.unionAll(selfrows)
    depth = closed.groupBy("node").agg(
        F.max("up").cast("int").alias("depth")
    )
    p = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    ca = closed.select(
        F.col("node").alias("a"), F.col("anc").alias("lca")
    )
    cb = closed.select(
        F.col("node").alias("b"), F.col("anc").alias("lca")
    )
    common = p.join(ca, "a").join(cb, ["b", "lca"])
    ranked = common.join(
        depth.select(
            F.col("node").alias("lca"), F.col("depth").alias("anc_depth")
        ),
        "lca",
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("a", "b").orderBy(
                F.desc("anc_depth"), F.asc("lca")
            )
        ),
    ).filter(F.col("_rn") == 1)
    da = depth.select(F.col("node").alias("a"), F.col("depth").alias("_da"))
    db = depth.select(F.col("node").alias("b"), F.col("depth").alias("_db"))
    return (
        p.join(ranked.select("a", "b", "lca", "anc_depth"), ["a", "b"], "left")
        .join(da, "a", "left")
        .join(db, "b", "left")
        .select(
            "a",
            "b",
            "lca",
            F.col("anc_depth").cast("int").alias("lca_depth"),
            F.when(
                F.col("lca").isNotNull(),
                F.col("_da") + F.col("_db") - 2 * F.col("anc_depth"),
            )
            .cast("int")
            .alias("dist"),
        )
    )

def stress_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_depth: int = 6,
) -> DataFrame:
    """Stress centrality from sampled sources → (node, stress): the
    NUMBER of shortest paths (hop-capped, from the given seed set)
    whose interior passes through each node — Brandes' two-phase
    algorithm (Brandes 2001) in its all-integer variant (Shimbel's
    stress, no σ-ratio division), so the result is engine-exact.

    The KG hub-audit primitive: canonical entities whose removal
    disconnects the most shortest derivation paths are exactly the
    merge decisions to re-examine (an over-merged entity acquires
    pathological stress), and sampled-source stress is the standard
    scalable estimator shape (Brandes-Pich '07) — cost is one BFS +
    one backward sweep PER ROUND for ALL sources at once on (seed,
    node) composite keys, never one pass per source.

    Phase 1 (forward): level-synchronous BFS where σ(v) = Σ σ(u) over
    the settled frontier neighbors — path counts, exact integers.
    Phase 2 (backward): over the shortest-path DAG (edges that advance
    dist by exactly 1), τ(v) = Σ_{w ∈ succ(v)} (1 + τ(w)) counts DAG
    continuations below v, accumulated strictly level-by-level from
    the deepest frontier up.  Interior stress = σ(v)·τ(v) summed over
    sources, with seeds themselves excluded (endpoints are not
    interior).  Both phases are keyed equi-joins + groupBys; rounds ≤
    ``max_depth`` each way.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled = (
        seeds.select(F.col(seed_col).alias("seed"))
        .distinct()
        .select(
            "seed",
            F.col("seed").alias("node"),
            F.lit(0).alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [settled]
    frontier = settled
    # r6: one action per BFS level (count materializes the level's
    # checkpoint); settled stays a lazy union of materialized levels
    for depth in range(1, max_depth + 1):
        grown = (
            frontier.join(nbrs, frontier["node"] == nbrs["u"])
            .select("seed", F.col("v").alias("node"), "sigma")
            .join(
                settled.select("seed", "node"), ["seed", "node"], "left_anti"
            )
            .groupBy("seed", "node")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .select(
                "seed", "node", F.lit(depth).alias("dist"), "sigma"
            )
            .localCheckpoint(eager=False)
        )
        if grown.count() == 0:
            break
        settled = settled.unionAll(grown)
        levels.append(grown)
        frontier = grown
    # shortest-path DAG: neighbor steps that advance dist by exactly 1
    d1 = settled.select("seed", F.col("node").alias("u"), F.col("dist").alias("du"))
    d2 = settled.select("seed", F.col("node").alias("w"), F.col("dist").alias("dw"))
    dag = (
        nbrs.join(d1, "u")
        .join(d2.withColumnRenamed("w", "v"), ["seed", "v"])
        .filter(F.col("dw") == F.col("du") + 1)
        .select("seed", "u", F.col("v").alias("w"))
        .localCheckpoint(eager=True)
    )
    # backward sweep: tau at the deepest level is 0; each shallower level
    # aggregates (1 + tau) over its DAG successors.
    tau = levels[-1].select(
        "seed", "node", F.lit(0).cast("long").alias("tau")
    )
    acc = tau
    for lvl in reversed(levels[:-1]):
        contrib = (
            dag.join(
                tau.select("seed", F.col("node").alias("w"), "tau"),
                ["seed", "w"],
            )
            .groupBy("seed", F.col("u").alias("node"))
            .agg(F.sum(F.lit(1) + F.col("tau")).cast("long").alias("tau"))
        )
        tau = (
            lvl.select("seed", "node")
            .join(contrib, ["seed", "node"], "left")
            .select(
                "seed",
                "node",
                F.coalesce("tau", F.lit(0)).cast("long").alias("tau"),
            )
            # eager: tau is referenced by BOTH the next level's contrib
            # and the final accumulator — lazy checkpoints here let the
            # final job's concurrent stages compute each level twice
            .localCheckpoint(eager=True)
        )
        acc = acc.unionAll(tau)
    stress = (
        settled.join(acc, ["seed", "node"])
        .filter(F.col("node") != F.col("seed"))
        .groupBy("node")
        .agg(F.sum(F.col("sigma") * F.col("tau")).cast("long").alias("stress"))
    )
    nodes = nbrs.select(F.col("u").alias("node")).distinct()
    return nodes.join(stress, "node", "left").select(
        "node", F.coalesce("stress", F.lit(0)).cast("long").alias("stress")
    )


def greedy_weighted_matching(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    rounds: int = 3,
) -> DataFrame:
    """Locally-dominant-edge maximal weighted matching →
    (u, v, w, rnd): the matched edges, tagged with the round that
    locked them in.

    The 1:1 entity-alignment closer: reciprocal best-match
    (q104 / similarity.mutual_best_match) is exactly ONE round of this
    algorithm — it leaves every node whose best partner preferred
    someone else unmatched even when a perfectly good second-choice
    pairing exists.  Iterating to maximality is the classic
    locally-dominant-edge scheme (Preis SODA'99; Manne & Bisseling's
    distributed form): each round, an edge is DOMINANT when it is the
    maximum incident edge of BOTH its endpoints under the total order
    (w DESC, u ASC, v ASC); all dominant edges join the matching
    simultaneously (per-vertex argmaxes can't conflict), their
    endpoints and incident edges vanish, and freed-up second choices
    become dominant next round.  Guarantees a MAXIMAL matching with
    weight ≥ ½ the maximum-weight matching; ``rounds`` caps the
    unrolling (a decreasing-weight path needs one round per edge), so
    leftovers simply stay unmatched — the cap is part of the contract
    and the SQL replay carries the identical recurrence round for
    round.

    Deterministic: the total order breaks every tie by edge id, so the
    matching is a pure function of the edge multiset — no hashes, no
    randomness, resume-stable, bit-identical in any engine.  100 TB
    shape per round: one union-explode of live edges to their two
    endpoints, one per-node top-1 window (WindowGroupLimit keeps it
    map-side partial), one 2-vote groupBy, two anti-joins; the live
    edge set only shrinks, nothing materializes a neighbor array, and
    ``localCheckpoint`` truncates lineage per round exactly as in
    :func:`maximal_independent_set`.
    """
    if rounds < 1:
        raise ValueError("greedy_weighted_matching needs rounds >= 1")
    e = (
        edges.select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col(src) != F.col(dst))
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    # empty accumulator derived from e (a limit-0 slice is cheaper than
    # a 32-partition createDataFrame RDD in every downstream job) — r6
    out = e.limit(0).select(
        "u", "v", "w", F.lit(0).cast("int").alias("rnd")
    )
    n_e = e.count()  # materializes the canonical edge checkpoint (r6)
    for r in range(1, rounds + 1):
        if n_e == 0:
            break
        inc = e.select(F.col("u").alias("node"), "u", "v", "w").unionAll(
            e.select(F.col("v").alias("node"), "u", "v", "w")
        )
        top = Window.partitionBy("node").orderBy(
            F.desc("w"), F.asc("u"), F.asc("v")
        )
        best = (
            inc.withColumn("_rn", F.row_number().over(top))
            .filter(F.col("_rn") == 1)
            .select("node", "u", "v", "w")
        )
        matched = (
            best.groupBy("u", "v", "w")
            .agg(F.count("*").alias("_votes"))
            .filter(F.col("_votes") == 2)
            .select("u", "v", "w")
            .localCheckpoint(eager=False)
        )
        gone = matched.select(F.col("u").alias("node")).unionAll(
            matched.select("v")
        )
        out = out.unionAll(
            matched.select("u", "v", "w", F.lit(r).cast("int").alias("rnd"))
        )
        e = (
            e.join(gone, e["u"] == gone["node"], "left_anti")
            .join(gone, F.col("v") == gone["node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        n_e = e.count()  # one action per round; materializes matched too
    return out


def greedy_coloring(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    seed: str = "color",
) -> DataFrame:
    """Jones-Plassmann greedy graph coloring with deterministic hash
    priorities → (node, status, color, rnd): status 'colored' with the
    smallest color unused by any already-colored neighbor, or
    'undecided' (NULL color) when the round cap left it for the next
    wave.

    The multi-wave generalization of :func:`maximal_independent_set`:
    an MIS schedules ONE conflict-free merge wave; a coloring
    partitions ALL nodes into conflict-free waves (color c = wave c),
    the full schedule for entity-merge application, graph mutation
    batching, or any update set where neighbors must not commit
    together.  Jones & Plassmann ('93): each round, every uncolored
    node whose (hash, id) priority is a strict local minimum among its
    UNCOLORED neighbors picks the smallest color absent from its
    colored neighborhood; neighbors of distinct priorities never pick
    together, so validity is by construction, and expected rounds are
    O(log n).  ``rounds`` caps the unrolling exactly as in MIS — the
    SQL replay carries the identical recurrence.

    100 TB shape per round: the live-neighbor view is two semi-joins,
    the candidate color pool for a winner is generate(0..k) where k =
    its count of DISTINCT colored-neighbor colors — the total explode
    is O(colored-degree sums) ≈ O(E) across ALL rounds combined, never
    a per-node array; the free-color pick is one anti-join + min.
    Every op is equi-keyed on node; ``localCheckpoint`` truncates
    lineage per round.
    """
    from .dedup import porthash64

    def pri(col):
        return porthash64(F.col(col).cast("string"), seed)

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbr = e.select(
        F.col("u").alias("node"), F.col("v").alias("peer")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    ).localCheckpoint(eager=True)
    un = nbr.select("node").distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    colored = spark.createDataFrame([], "node long, color int, rnd int")
    for r in range(1, rounds + 1):
        live = nbr.join(un, "node", "left_semi").join(
            un.select(F.col("node").alias("peer")), "peer", "left_semi"
        )
        beaten = (
            live.filter(
                (pri("peer") < pri("node"))
                | (
                    (pri("peer") == pri("node"))
                    & (F.col("peer") < F.col("node"))
                )
            )
            .select("node")
            .distinct()
        )
        win = un.join(beaten, "node", "left_anti")
        used = (
            nbr.join(win, "node", "left_semi")
            .join(
                colored.select(
                    F.col("node").alias("peer"), "color"
                ),
                "peer",
            )
            .select("node", "color")
            .distinct()
        )
        kc = win.join(
            used.groupBy("node").agg(
                F.countDistinct("color").cast("int").alias("_k")
            ),
            "node",
            "left",
        ).select("node", F.coalesce("_k", F.lit(0)).alias("_k"))
        free = (
            kc.select(
                "node",
                F.explode(F.sequence(F.lit(0), F.col("_k"))).alias("_c"),
            )
            .join(
                used.select("node", F.col("color").alias("_c")),
                ["node", "_c"],
                "left_anti",
            )
            .groupBy("node")
            .agg(F.min("_c").cast("int").alias("color"))
        )
        colored = colored.unionAll(
            free.select("node", "color", F.lit(r).cast("int").alias("rnd"))
        ).localCheckpoint(eager=True)
        un = un.join(win, "node", "left_anti").localCheckpoint(eager=True)
    return colored.select(
        "node", F.lit("colored").alias("status"), "color", "rnd"
    ).unionAll(
        un.select(
            "node",
            F.lit("undecided").alias("status"),
            F.lit(None).cast("int").alias("color"),
            F.lit(None).cast("int").alias("rnd"),
        )
    )


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    levels: int = 3,
    beta_log2: int = 3,
) -> DataFrame:
    """Truncated Katz centrality in Q20 fixed point → (node, katz_q20):
    Σ_{l=1..levels} walks_l(node) · 2^(20 − beta_log2·l), i.e. the walk
    series with attenuation β = 2^-beta_log2 truncated at ``levels``.

    Completes the centrality family (degree, PageRank q44, HITS q74,
    PPR q71, stress q137) with the classic walk-counting measure (Katz
    1953): unlike PageRank, a neighbor's contribution is NOT divided
    by its out-degree, so Katz rewards being reachable by MANY short
    walks — the "influence" notion for entity-importance ranking in a
    KG.  β as a power of two keeps every term an exact integer (the
    q74/q82 fixed-point idiom): no floats, no normalization pass,
    bit-identical in any engine; truncation at ``levels`` is the
    documented contract (the series' tail is bounded by
    (βΔ)^{levels+1}/(1−βΔ) and β must satisfy βΔ < 1 for the full
    series to converge anyway).

    Per level: ONE equi-join of the neighbor list against the previous
    walk-count vector + a map-side-combinable sum — the sparse matvec;
    walk counts stay scalars per node, never arrays.  Overflow bound:
    walks_l ≤ Δ^l, so Q20 terms need log2(n·Δ^levels) + 20 < 63 —
    fine for any real graph at levels ≤ 3.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    nbr = e.select(
        F.col("u").alias("node"), F.col("v").alias("peer")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    ).localCheckpoint(eager=True)
    p = nbr.groupBy("node").agg(F.count("*").cast("long").alias("p"))
    total = p.select(
        "node",
        (F.col("p") * (1 << (20 - beta_log2))).alias("katz_q20"),
    )
    for lvl in range(2, levels + 1):
        p = (
            nbr.join(
                p.select(F.col("node").alias("peer"), "p"), "peer"
            )
            .groupBy("node")
            .agg(F.sum("p").cast("long").alias("p"))
        )
        w = 1 << (20 - beta_log2 * lvl)
        total = (
            total.join(p, "node", "left")
            .select(
                "node",
                (
                    F.col("katz_q20")
                    + F.coalesce(F.col("p"), F.lit(0)) * w
                ).alias("katz_q20"),
            )
        )
        p = p.localCheckpoint(eager=False)
    return total.select("node", F.col("katz_q20").cast("long").alias("katz_q20"))


def double_sweep_diameter(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 20,
    seed: str = "sweep",
) -> DataFrame:
    """Double-sweep BFS diameter lower bound → ONE row:
    (seed_node, far_u, ecc_seed, far_v, lb_diameter).

    The standard practical diameter estimator (Magnien/Latapy/Habib):
    exact diameter needs all-pairs BFS — O(n·E), dead at web scale —
    but ONE BFS from an arbitrary seed to its farthest node u, then a
    SECOND from u, gives ecc(u) ≤ diameter as a certified lower bound
    that is exact on trees and empirically tight on web graphs.  The
    seed is the minimum-porthash node (deterministic, no RNG);
    farthest-node argmaxes break ties by node id, so the whole
    estimate is a pure function of the edge set.

    Both sweeps reuse :func:`bfs_distances` (frontier iteration, one
    equi-join per hop); the argmax between sweeps is a 1-row sort-limit
    (TakeOrderedAndProject), never a collect into driver logic that
    the plan can't see.  ``max_depth`` caps both sweeps — if a sweep
    hits the cap the bound is still valid (it just may be looser), the
    same capped-unrolling contract as MIS/coloring, and what makes the
    SQL replay finite.
    """
    from .dedup import porthash64

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select("v")
    ).distinct()
    s0 = (
        nodes.orderBy(
            porthash64(F.col("node").cast("string"), seed), F.asc("node")
        )
        .limit(1)
        .select(F.col("node").alias("seed_node"))
        .localCheckpoint(eager=True)
    )
    b1 = bfs_distances(
        e, s0.select(F.col("seed_node").alias("node")),
        src="u", dst="v", max_depth=max_depth,
    )
    far1 = (
        b1.orderBy(F.desc("dist"), F.asc("node"))
        .limit(1)
        .select(
            F.col("node").alias("far_u"),
            F.col("dist").cast("long").alias("ecc_seed"),
        )
        .localCheckpoint(eager=True)
    )
    b2 = bfs_distances(
        e, far1.select(F.col("far_u").alias("node")),
        src="u", dst="v", max_depth=max_depth,
    )
    far2 = (
        b2.orderBy(F.desc("dist"), F.asc("node"))
        .limit(1)
        .select(
            F.col("node").alias("far_v"),
            F.col("dist").cast("long").alias("lb_diameter"),
        )
    )
    return s0.crossJoin(F.broadcast(far1)).crossJoin(F.broadcast(far2))


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Per-node core-number estimate by h-index iteration →
    (node, core, rnd_converged): Lü et al. (Nature Comm. 2016) —
    start at c₀(v) = degree and repeatedly set c(v) to the H-INDEX of
    its neighbors' current values; the sequence is non-increasing and
    its fixed point IS the exact core number (Seidman coreness), which
    generalizes q48's single fixed-k peel to the full degeneracy
    decomposition every graph-ordering / sampling / sparsification
    pass wants.

    ``rounds`` caps the iteration (the MIS/coloring contract): values
    are exact UPPER BOUNDS that only tighten; ``rnd_converged`` is the
    last round that tightened the node's value (0 = its degree never
    moved), so a profile whose max equals the cap says "look closer" —
    loose nodes are visible, never silently wrong.  The h-index per
    round is ONE window trick, no arrays: rank each node's neighbor
    values descending and take max(min(rank, value)) — a per-node
    top-rank scan that is rank-monotone, so WindowGroupLimit keeps it
    partial; each round is one equi-join (neighbor value lookup) + one
    window + one groupBy, all keyed on node.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbr = e.select(
        F.col("u").alias("node"), F.col("v").alias("peer")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    ).localCheckpoint(eager=True)
    cur = nbr.groupBy("node").agg(
        F.count("*").cast("long").alias("core")
    ).withColumn("rnd_converged", F.lit(0))
    for r in range(1, rounds + 1):
        w = Window.partitionBy("node").orderBy(
            F.desc("pc"), F.asc("peer")
        )
        nxt = (
            nbr.join(
                cur.select(F.col("node").alias("peer"),
                           F.col("core").alias("pc")),
                "peer",
            )
            .withColumn("_rk", F.row_number().over(w))
            .groupBy("node")
            .agg(
                F.max(F.least(F.col("_rk").cast("long"), F.col("pc")))
                .alias("new_core")
            )
        )
        cur = (
            cur.join(nxt, "node")
            .select(
                "node",
                F.col("new_core").alias("core"),
                F.when(
                    F.col("new_core") < F.col("core"), F.lit(r)
                ).otherwise(F.col("rnd_converged")).alias("rnd_converged"),
            )
            .localCheckpoint(eager=True)
        )
    return cur


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    p_milli: int = 1000,
    q_milli: int = 1000,
    seed: str = "n2v",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic node2vec SECOND-ORDER biased walks (Grover &
    Leskovec, KDD'16) → (start, walk, step, node), steps 0..walk_len.

    :func:`random_walks` is DeepWalk (first-order, uniform); node2vec's
    search bias conditions each hop on the PREVIOUS node: from prev p
    standing at c, candidate x weighs α = 1/p_return if x = p (return),
    1 if x ∈ N(p) (stay near), 1/q_inout otherwise (move out) — the
    BFS↔DFS interpolation that made node2vec embeddings structural.
    Here the weights are exact integers (milli units: 10^6 DIV p_milli
    etc.), and "random" is the same seeded-hash scheme as
    :func:`random_walks`: the walker's residue
    ``porthash64(start⊕walk⊕step⊕prev⊕node, seed) mod Σw`` lands in
    exactly one candidate's cumulative-weight slot — bit-identical
    across engines/partitionings, unrolled-CTE replayable (q192).
    Step 1 has no prev and is the first-order uniform pick.

    Shape per hop: one equi-join frontier×N(c), one LEFT probe of the
    edge set for the x ∈ N(p) flag, one per-walker window (partition
    (start, walk) — group size ≤ deg, never global) for the cumulative
    slots, one filter.  walk_len joins total — the Pregel discipline;
    frontier localCheckpoints per hop.
    """
    from .dedup import porthash64

    if p_milli < 1 or q_milli < 1:
        # 0 would divide by zero below; negatives would flip the slot
        # arithmetic (ADVICE r5 #3)
        raise ValueError(
            f"p_milli and q_milli must be >= 1 (got {p_milli}, {q_milli})"
        )
    if p_milli > 1_000_000 or q_milli > 1_000_000:
        # integer milli weights floor to 0 above 10^6 — the candidate
        # would get a zero-width cumulative slot and never be picked
        raise ValueError(
            "p_milli/q_milli above 1_000_000 floor the integer bias"
            f" weight to 0 (got {p_milli}, {q_milli})"
        )
    w_ret = 1_000_000 // p_milli
    w_far = 1_000_000 // q_milli
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbrs = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=False)
    ranked = nbrs.select(
        F.col("u").alias("node"),
        F.col("v").alias("nxt"),
        (F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1)
        .cast("long")
        .alias("rank"),
    ).localCheckpoint(eager=False)
    degs = ranked.groupBy("node").agg(
        F.count("*").cast("long").alias("deg")
    )

    walkers = degs.select(F.col("node").alias("start")).select(
        "start",
        F.explode(
            F.array(*[F.lit(w) for w in range(walks_per_node)])
        ).alias("walk"),
    )
    out = walkers.select(
        "start", "walk", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    # step 1: first-order uniform (no prev to condition on)
    pick1 = walkers.join(
        degs, walkers["start"] == degs["node"]
    ).select(
        "start",
        "walk",
        F.pmod(
            porthash64(
                F.concat_ws(
                    "\x1f",
                    F.col("start").cast("string"),
                    F.col("walk").cast("string"),
                    F.lit("1"),
                    F.col("start").cast("string"),
                ),
                seed,
            ),
            F.col("deg"),
        ).alias("_r"),
    )
    frontier = (
        pick1.join(
            ranked,
            (pick1["start"] == ranked["node"])
            & (pick1["_r"] == ranked["rank"]),
        )
        .select(
            "start", "walk", F.col("node").alias("prev"),
            F.col("nxt").alias("node"),
        )
        .localCheckpoint(eager=False)
    )
    out = out.unionByName(
        frontier.select("start", "walk", F.lit(1).alias("step"), "node")
    )
    for step in range(2, walk_len + 1):
        cand = (
            frontier.join(
                nbrs.select(F.col("u").alias("node"), F.col("v").alias("x")),
                "node",
            )
            .join(
                nbrs.select(
                    F.col("u").alias("prev"),
                    F.col("v").alias("x"),
                    F.lit(True).alias("_near"),
                ),
                ["prev", "x"],
                "left",
            )
            .select(
                "start",
                "walk",
                "prev",
                "node",
                "x",
                F.when(F.col("x") == F.col("prev"), F.lit(w_ret))
                .when(F.col("_near"), F.lit(1000))
                .otherwise(F.lit(w_far))
                .cast("long")
                .alias("w"),
            )
        )
        wwin = Window.partitionBy("start", "walk").orderBy("x")
        cum = cand.select(
            "*",
            F.sum("w")
            .over(wwin.rowsBetween(Window.unboundedPreceding, 0))
            .alias("_cw"),
            F.sum("w")
            .over(
                wwin.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("_tw"),
        )
        r = F.pmod(
            porthash64(
                F.concat_ws(
                    "\x1f",
                    F.col("start").cast("string"),
                    F.col("walk").cast("string"),
                    F.lit(str(step)),
                    F.col("prev").cast("string"),
                    F.col("node").cast("string"),
                ),
                seed,
            ),
            F.col("_tw"),
        )
        frontier = (
            cum.filter(
                (r >= F.col("_cw") - F.col("w")) & (r < F.col("_cw"))
            )
            .select(
                "start", "walk", F.col("node").alias("prev"),
                F.col("x").alias("node"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            frontier.select(
                "start", "walk", F.lit(step).alias("step"), "node"
            )
        )
    return out
