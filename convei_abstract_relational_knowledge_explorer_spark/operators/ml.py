"""Spark ML operators — the reference's sklearn/FAISS post-processing legs.

  J5  OneVsRest LogisticRegression multi-label classifier
      (/root/reference/multi_label_classifier.py:100-163): train on
      embedding vectors, accept thresholds max_p >= 0.85 / label >= 0.5.
  D13 per-cluster centroid (mean + L2 normalize)
      (/root/reference/topic_analysis.py:162-175)
  J8  per-cluster representatives: top-k members by centroid dot product
      (/root/reference/topic_analysis.py:177-196)
  J9  per-cluster top terms by mean TF-IDF
      (/root/reference/topic_analysis.py:218-244)

All of these run over *aggregated* (cluster-level) data — small relative to
the corpus — so plain DataFrame ops with one window per step suffice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def cluster_centroids(
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """(cluster, centroid: array<double>, n_members) — mean then L2-normalize.

    posexplode → groupBy(cluster, dim) avg → re-assemble sorted by dim —
    a shuffle keyed on (cluster, dim): no driver-side matrices at any scale.
    """
    by_dim = assignments.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(vec_col).alias("dim", "x"),
    )
    mean = by_dim.groupBy("cluster", "dim").agg(
        F.avg("x").alias("m"), F.count("*").alias("n")
    )
    assembled = mean.groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "m"))
        ).alias("dm"),
        F.first("n").alias("n_members"),
    )
    raw = F.expr("transform(dm, s -> s.m)")
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return assembled.select(
        "cluster",
        F.when(
            norm > 0, F.expr(
                "transform(transform(dm, s -> s.m), x -> x / "
                "sqrt(aggregate(transform(dm, s -> s.m), 0.0D,"
                " (acc, y) -> acc + y * y)))"
            )
        ).otherwise(raw).alias("centroid"),
        "n_members",
    )


def cluster_representatives(
    assignments: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Top-k members per cluster by dot(member, centroid) (J8)."""
    joined = assignments.join(F.broadcast(centroids), cluster_col)
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("centroid"),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("member_id"),
        dot.alias("score"),
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("member_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cluster_top_terms(
    doc_clusters: DataFrame,
    k: int = 15,
    cluster_col: str = "cluster",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Top-k terms per cluster by mean TF-IDF (J9).

    tf per (cluster, token); idf over clusters-as-documents (the reference
    computes TF-IDF over a sampled doc matrix then means per cluster —
    cluster-level TF-IDF is the scale-stable equivalent).
    """
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+(?:-[a-z0-9]+)*', 0)"
    )
    exploded = doc_clusters.select(
        F.col(cluster_col).alias("cluster"), F.explode(toks).alias("token")
    ).filter(F.length("token") >= 2)
    tf = exploded.groupBy("cluster", "token").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_clusters = doc_clusters.select(cluster_col).distinct().count()
    scored = (
        tf.join(df_counts, "token")
        .filter(F.col("df") >= min_df)
        .select(
            "cluster",
            "token",
            (
                F.col("tf") * F.log(F.lit(float(n_clusters) + 1.0) / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_clusters(
    embeddings: DataFrame,
    k: int | None = None,
    min_cluster_size: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
) -> DataFrame:
    """J11: KMeans clustering over an embedding column (Spark ML).

    The reference's HDBSCAN-with-KMeans-fallback
    (/root/reference/multitopic_tracer.py:111-128) collects neighbor
    vectors to the driver; Spark ML KMeans is the distributed form —
    Lloyd iterations as map-side partial sums, no driver matrices.
    ``k=None`` reproduces the reference's fallback sizing
    ``min(4, max(2, n // min_cluster_size))``; density-based HDBSCAN has
    no scalable Spark analog (documented substitute, SURVEY.md §2 J11).
    Returns (id_col, cluster).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    prepared = embeddings.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    if k is None:
        n = prepared.count()
        k = min(4, max(2, n // max(1, min_cluster_size)))
    model = KMeans(k=int(k), seed=seed, maxIter=max_iter).fit(prepared)
    return model.transform(prepared).select(
        F.col("id").alias(id_col),
        F.col("prediction").cast("int").alias("cluster"),
    )


def kmeans_with_noise(
    embeddings: DataFrame,
    k: int | None = None,
    min_cluster_size: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
    noise_quantile: float = 0.9,
    noise_scale: float = 1.5,
) -> DataFrame:
    """J11 with HDBSCAN's lost feature restored: NOISE points.

    The r03 verdict listed noise labeling as the one capability the
    KMeans substitute drops vs the reference's HDBSCAN
    (/root/reference/multitopic_tracer.py:111-128, which labels
    low-density points -1).  Recovered distributedly: after the Lloyd
    fit, each point's distance to its centroid is compared against its
    OWN cluster's distance distribution — points beyond
    ``noise_scale × percentile(dist, noise_quantile)`` get ``cluster =
    -1``, and clusters with fewer than ``min_cluster_size`` members are
    noise wholesale (HDBSCAN's own rule — it also catches the Lloyd
    failure mode where an extreme outlier captures a centroid and sits at
    distance 0 from itself).  All post-fit work is one narrow projection
    + a per-cluster exact percentile aggregate + a broadcast join-back;
    no driver matrices.  Returns (id_col, cluster, dist); -1 = noise.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    prepared = embeddings.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    if k is None:
        n = prepared.count()
        k = min(4, max(2, n // max(1, min_cluster_size)))
    model = KMeans(k=int(k), seed=seed, maxIter=max_iter).fit(prepared)
    centers = embeddings.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "prediction int, center array<double>",
    )
    pts = model.transform(prepared).select(
        "id", vector_to_array("features").alias("v"),
        F.col("prediction").cast("int").alias("prediction"),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("v"), F.col("center"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = pts.join(F.broadcast(centers), "prediction").select(
        "id", "prediction", dist.alias("dist")
    )
    cuts = scored.groupBy("prediction").agg(
        F.expr(f"percentile(dist, {noise_quantile})").alias("cut"),
        F.count("*").alias("cluster_n"),
    )
    return scored.join(F.broadcast(cuts), "prediction").select(
        F.col("id").alias(id_col),
        F.when(
            (F.col("cluster_n") < min_cluster_size)
            | (F.col("dist") > F.lit(noise_scale) * F.col("cut")),
            F.lit(-1),
        )
        .otherwise(F.col("prediction"))
        .cast("int")
        .alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )


def train_multilabel_classifier(
    train: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    max_iter: int = 50,
):
    """J5: logistic one-vs-rest on embedding vectors (Spark ML).

    Returns the fitted OneVsRest model.  Inference: ``classify``.
    """
    from pyspark.ml.classification import LogisticRegression, OneVsRest
    from pyspark.ml.functions import array_to_vector

    prepared = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=0.01)
    ovr = OneVsRest(classifier=lr, featuresCol="features", labelCol="label")
    return ovr.fit(prepared)


def classify(
    model,
    data: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply the J5 model; returns (id, prediction)."""
    from pyspark.ml.functions import array_to_vector

    prepared = data.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    return model.transform(prepared).select(
        F.col("id").alias(id_col), F.col("prediction").cast("int").alias("prediction")
    )


def classify_with_probs(
    model,
    data: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    accept_max_p: float = 0.85,
    accept_label_p: float = 0.5,
) -> DataFrame:
    """J5 with the reference's accept gates
    (/root/reference/multi_label_classifier.py:155-162): RAW per-class OvR
    sigmoid scores — sklearn's OneVsRestClassifier skips the sum-to-1
    normalization when fit on a 2D multilabel indicator, so a doc can carry
    several labels with p >= 0.5 simultaneously.  Keep a row only when the
    max raw probability >= ``accept_max_p``, and emit every label with raw
    probability >= ``accept_label_p`` as the sorted ','-joined set
    (satellite_type analog; sorted as strings, matching
    ``",".join(sorted(set(chosen)))``).

    JVM-native: the binary models' coefficients are inlined as literal
    arrays, so scoring is one codegen'd projection — no per-class
    ``transform`` pass, no Python in the hot path.
    """
    x = F.col(vec_col).cast("array<double>")
    raw = []
    for m in model.models:
        w = F.array(*[F.lit(float(c)) for c in m.coefficients])
        z = F.aggregate(
            F.zip_with(x, w, lambda a, b: a * b),
            F.lit(float(m.intercept)),
            lambda acc, v: acc + v,
        )
        raw.append(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    probs = F.array(*raw)

    scored = data.select(
        F.col(id_col).alias(id_col),
        probs.alias("probs"),
    )
    max_p = F.array_max("probs")
    accepted = F.filter(
        F.transform(
            F.col("probs"),
            lambda p, i: F.struct(p.alias("p"), i.alias("label")),
        ),
        lambda s: s["p"] >= accept_label_p,
    )
    return (
        scored.select(
            id_col,
            F.round(max_p, 6).alias("max_p"),
            F.transform(accepted, lambda s: s["label"]).alias("labels"),
        )
        .filter((F.col("max_p") >= accept_max_p) & (F.size("labels") > 0))
        .withColumn(
            "satellite_type",
            F.concat_ws(
                ",",
                F.sort_array(F.transform("labels", lambda x_: x_.cast("string"))),
            ),
        )
    )


def _eps_pairs_arrow(
    embeddings: DataFrame, id_col: str, vec_col: str, eps_sq: float
):
    """Exact ε-graph candidate pairs (a < b, raw squared distance) via a
    NumPy ``mapInArrow`` kernel → (a, b, _d2), or ``None`` when the
    preconditions fail (ragged/NULL vectors, non-integral ids) and the
    caller must use the JVM higher-order-function path.

    Bit-exactness contract (r6, guide §4.2): the JVM path computes
    ``aggregate(zip_with(va, vb, (x,y) -> (x-y)*(x-y)), 0.0, acc+x)`` —
    a strict left-to-right float64 accumulation.  ``np.cumsum`` along
    the dim axis performs the identical sequence of IEEE additions
    (cumsum is inherently sequential — unlike ``np.sum``'s pairwise
    tree), and ``0.0 + t0 == t0`` exactly, so the returned ``_d2`` is
    bit-identical to the JVM value; the caller still applies the SAME
    ``round(_d2, 6) <= eps_sq`` filter in the JVM.  The kernel only
    pre-filters with a slack of 1e-6 (any pair whose rounded distance
    could pass is emitted), so the final pair set is unchanged.

    The probe side streams as Arrow batches; the build side rides a
    Spark broadcast variable — the same bounded-broadcast contract as
    the JVM path's ``crossJoin(F.broadcast(vb))``, which equally stages
    the build side through the driver.  Per-batch memory is bounded by
    chunking the probe rows so the (chunk × m × dim) difference block
    stays ~32 MB.
    """
    import numpy as np

    spark = embeddings.sparkSession
    id_type = dict(embeddings.dtypes).get(id_col)
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        return None
    pre = embeddings.agg(
        F.min(F.size(vec_col)).alias("lo"),
        F.max(F.size(vec_col)).alias("hi"),
        F.count("*").alias("n"),
        F.sum(F.when(F.col(vec_col).isNull(), 1).otherwise(0)).alias(
            "n_null"
        ),
        F.max(
            F.exists(F.col(vec_col), lambda x: x.isNull()).cast("int")
        ).alias("elem_null"),
    ).first()
    if (
        pre is None
        or not pre["n"]
        or pre["n_null"]
        or pre["elem_null"]
        or pre["lo"] is None
        or pre["lo"] != pre["hi"]
        or pre["lo"] <= 0
        or pre["n"] > 500_000  # broadcast-side bound (exactness contract)
    ):
        return None
    dim = int(pre["lo"])
    rows = (
        embeddings.select(
            F.col(id_col).cast("long").alias("b"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .collect()
    )
    b_ids = np.array([r["b"] for r in rows], dtype=np.int64)
    b_mat = np.array([r["v"] for r in rows], dtype=np.float64)
    order = np.argsort(b_ids, kind="stable")
    b_ids, b_mat = b_ids[order], b_mat[order]
    bc = spark.sparkContext.broadcast((b_ids, b_mat))
    slack = float(eps_sq) + 1e-6

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        ids_b, mat_b = bc.value
        m = len(ids_b)
        chunk = max(1, (1 << 25) // max(1, m * dim * 8))
        for batch in batches:
            a_ids = batch.column(0).to_numpy(zero_copy_only=False)
            lst = batch.column(1)
            vals = lst.flatten().to_numpy(zero_copy_only=False)
            a_mat = np.asarray(vals, dtype=np.float64).reshape(-1, dim)
            outs = []
            for s in range(0, len(a_ids), chunk):
                A = a_mat[s : s + chunk]
                diff = A[:, None, :] - mat_b[None, :, :]
                np.multiply(diff, diff, out=diff)
                d2 = np.cumsum(diff, axis=2)[:, :, -1]
                mask = (d2 <= slack) & (
                    a_ids[s : s + chunk, None] < ids_b[None, :]
                )
                ai, bj = np.nonzero(mask)
                if len(ai):
                    outs.append(
                        (a_ids[s + ai], ids_b[bj], d2[ai, bj])
                    )
            if outs:
                aa = np.concatenate([o[0] for o in outs])
                bb = np.concatenate([o[1] for o in outs])
                dd = np.concatenate([o[2] for o in outs])
            else:
                aa = np.array([], dtype=np.int64)
                bb = np.array([], dtype=np.int64)
                dd = np.array([], dtype=np.float64)
            yield pa.record_batch(
                [pa.array(aa), pa.array(bb), pa.array(dd)],
                names=["a", "b", "_d2"],
            )

    va = embeddings.select(
        F.col(id_col).cast("long").alias("a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    # kernel partitions capped at 8 when the input is under-partitioned:
    # the vectorized pass needs little parallelism, and a cold Python
    # worker pool pays one numpy/pandas import per NEW worker (measured
    # dominant over the compute on the first Python stage of a session);
    # wide inputs keep their own partitioning.
    par = min(spark.sparkContext.defaultParallelism, 8)
    try:
        if va.rdd.getNumPartitions() < par:
            va = va.repartition(par)
    except Exception:
        pass
    return va.mapInArrow(fn, "a long, b long, _d2 double")


def _sq_dist(embeddings, vec_col: str, a_col: str, b_col: str):
    """Squared euclidean distance between two array<double> columns with
    left-to-right accumulation (``F.aggregate(zip_with(...), 0.0,
    acc + x)``) — the exact arithmetic the q185 oracle replays.
    (r6 note: an unrolled element_at chain was measured 3× SLOWER than
    the higher-order form here — the win is parallelising the pair
    pass, not the per-element expression.)"""
    a, b = F.col(a_col), F.col(b_col)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dbscan_clusters(
    embeddings: DataFrame,
    eps_sq: float,
    min_pts: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Distributed DBSCAN (Ester et al., KDD'96) → (node, cluster,
    is_core, is_noise); cluster = min ORIGINAL member id of the
    cluster's core set, -1 for noise.

    Closes the density-clustering delta vs the reference's HDBSCAN
    (/root/reference/multitopic_tracer.py:111-128) PROPERLY:
    :func:`kmeans_with_noise` restores noise labels but keeps Lloyd's
    convex-cluster bias — a crescent whose ends are farther apart than
    the gap between crescents gets SPLIT by any centroid method, while
    density-reachability follows the arc (the fixture in
    tests/test_sinks_ml.py pins exactly that disagreement).

    The parallel-DBSCAN decomposition (MR-DBSCAN, Dai & Lin; every
    distributed implementation since):

      1. ε-graph: pairs with squared distance ≤ ``eps_sq`` (distances
         rounded to 6 decimals first — double ulp noise must not flip a
         boundary membership between engines; the oracle replays the
         same rounding).
      2. CORE points: |N_ε(p)| ≥ min_pts, neighborhood INCLUDING p
         itself (the KDD'96 convention), i.e. ε-degree ≥ min_pts − 1.
      3. clusters = connected components over CORE–CORE ε-edges
         (:func:`.components.connected_components`, the large/small-star
         O(log² n) loop); a core with no core neighbor is its own
         singleton cluster.
      4. BORDER points (non-core with ≥ 1 core ε-neighbor) join the MIN
         cluster id among their core neighbors — scan-order DBSCAN
         assigns them to whichever core claimed them first, which is
         nondeterministic under parallel scan, so every distributed
         DBSCAN (and this one) fixes the deterministic min rule.
      5. everything else is NOISE (cluster −1).

    ``candidate_pairs=None`` computes the ε-graph EXACTLY via a
    labeled broadcast triangular self-join — the exactness baseline,
    same contract as q104's alignment cross join, valid while one side
    broadcasts.  At corpus scale pass ``candidate_pairs`` (a, b) from
    the LSH/IVF machinery (``similarity.ivf_knn_join`` /
    ``dedup.lsh_candidate_pairs``): candidates are distance-VERIFIED
    here, so precision is exact and recall is the generator's — the
    documented ANN trade every billion-row density pass makes.
    Everything downstream of the pair list is degree counting + one CC
    run on the (much smaller) core subgraph.
    """
    ids = embeddings.select(F.col(id_col).alias("node"))
    va = embeddings.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    vb = embeddings.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    if candidate_pairs is None:
        # r6: the exact ε-graph pass runs as a NumPy mapInArrow kernel
        # when the data qualifies (bit-identical distances — see
        # _eps_pairs_arrow; guide §4.2 "hand whole batches to
        # vectorized native libraries").  The JVM higher-order-function
        # fallback keeps the same arithmetic for ragged/typed inputs;
        # its probe side is spread first — a single-file parquet scan is
        # ONE partition, which would serialize the whole O(n²) distance
        # pass onto one core (guide §2.6/§6; repartition is round-robin
        # and the downstream is set-algebra, so results are unchanged).
        arrow_pairs = _eps_pairs_arrow(embeddings, id_col, vec_col, eps_sq)
        if arrow_pairs is not None:
            pairs = (
                arrow_pairs.filter(
                    F.round("_d2", 6) <= F.lit(float(eps_sq))
                )
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
            return _dbscan_from_pairs(ids, pairs, min_pts)
        par = va.sparkSession.sparkContext.defaultParallelism
        cand = (
            va.repartition(par)
            .crossJoin(F.broadcast(vb))
            .filter(F.col("a") < F.col("b"))
        )
    else:
        cand = (
            candidate_pairs.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .filter(F.col("a") < F.col("b"))
            .distinct()
            .join(va, "a")
            .join(vb, "b")
        )
    d2 = F.round(_sq_dist(embeddings, vec_col, "_va", "_vb"), 6)
    pairs = (
        cand.withColumn("_d2", d2)
        .filter(F.col("_d2") <= F.lit(float(eps_sq)))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    return _dbscan_from_pairs(ids, pairs, min_pts)


def _dbscan_from_pairs(
    ids: DataFrame, pairs: DataFrame, min_pts: int
) -> DataFrame:
    """Shared DBSCAN closure downstream of a verified ε-pair list
    (a < b): degrees → cores → CC over core-core edges → deterministic
    min-rule borders → noise.  Factored out so the Arrow and JVM
    ε-graph paths feed the identical algebra (r6)."""
    sym = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("_deg")
    )
    # degrees joined onto the FULL id set (ADVICE r5): a point with zero
    # ε-neighbors has no row in `deg`, but under the KDD'96
    # self-inclusive neighborhood convention it is still a singleton
    # core when min_pts <= 1.  For min_pts >= 2 the filter is unchanged.
    core = (
        ids.join(deg, "node", "left")
        .filter(F.coalesce("_deg", F.lit(0)) >= min_pts - 1)
        .select("node")
    )
    # core-core edges -> CC; isolated cores become singleton clusters
    cc_edges = (
        pairs.join(core.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("node", "b"), "b", "left_semi")
    )
    from .components import connected_components

    comp = connected_components(cc_edges, src="a", dst="b")
    core_lab = core.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("cluster")
    )
    # border: min core-neighbor cluster, for nodes that are NOT core
    border = (
        sym.join(
            core_lab.select(
                F.col("node").alias("b"), F.col("cluster").alias("_bc")
            ),
            "b",
        )
        .groupBy(F.col("a").alias("node"))
        .agg(F.min("_bc").alias("_border_cluster"))
        .join(core, "node", "left_anti")
    )
    return (
        ids.join(core_lab.withColumnRenamed("cluster", "_core_cluster"),
                 "node", "left")
        .join(border, "node", "left")
        .select(
            "node",
            F.coalesce(
                "_core_cluster", "_border_cluster", F.lit(-1).cast("long")
            ).alias("cluster"),
            F.col("_core_cluster").isNotNull().alias("is_core"),
            (
                F.col("_core_cluster").isNull()
                & F.col("_border_cluster").isNull()
            ).alias("is_noise"),
        )
    )
