"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k (the exactness baseline; crossJoin(broadcast)
  + TakeOrderedAndProject — the Spark shape of the reference's single-probe
  scan, /root/reference/multitopic_tracer.py:42-108)
- IVF-style bucketed ANN (deterministic seed centroids; probe only the
  closest cells — the scale path)
- all-pairs kNN graph via bucketed join (the J6 FAISS-kNN substitute,
  /root/reference/topic_analysis.py:97-140)

Norms are computed once per vector in a narrow projection and zero-norm
vectors filtered up front (cosine undefined) — cheaper and ANSI-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the big side of a broadcast cross join across the
    cluster when it arrives UNDER-partitioned (r6, guide §2.6/§6): a
    small single-file parquet scan is one partition, which would
    serialize the whole O(n·m) scoring pass onto one core.  No-op when
    the input already has enough partitions; downstream consumers are
    set-algebra / per-row arithmetic, so results are unchanged."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(par)
    return df.repartition(par) if cur < par else df


def _normed(df: DataFrame, id_col: str, vec_col: str, id_out: str) -> DataFrame:
    """(id_out, vec, norm) with zero-norm rows dropped."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
    ).filter(F.col("norm") > 0)


def brute_force_top_k(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for each query row.

    ``crossJoin(broadcast(query))`` + window top-k.  With a single query
    Catalyst compiles the tail to TakeOrderedAndProject; with a query batch
    the window-rank filter becomes per-group top-k (InferWindowGroupLimit).
    """
    target = _normed(embeddings, id_col, vec_col, "vec_id")
    probes = _normed(query, query_id_col, vec_col, "query_id").select(
        "query_id", F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    scored = _spread(target).crossJoin(F.broadcast(probes)).select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 8,
    max_sim: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive hard-negative mining → (anchor_id, negative_id,
    rank): per anchor, the ``k`` MOST similar vectors that are NOT
    near-duplicates — cosine strictly below ``max_sim``, self excluded.

    The training-pair miner for dense-retrieval / contrastive embedding
    training (DPR, SimCSE): random negatives are too easy, duplicates
    are false negatives; the valuable band is "as similar as possible
    while still being a different item".  ``max_sim`` should sit at the
    corpus' near-duplicate threshold (the q26 dedup band), so the miner
    composes with the dedup pipeline's own calibration.

    Exactness contract: brute-force over a BOUNDED anchor slice (the
    q22 labeled-exactness pattern — anchors broadcast, one pass over
    the corpus, per-anchor window top-k compiled to
    InferWindowGroupLimit).  The scale path for all-anchors mining is
    the IVF kNN graph (:func:`knn_graph`) with the same band filter
    applied to its candidate pairs.  Output carries ranks, never raw
    floats — ties break by vec_id, so the result is stable wherever
    the cosine margins exceed engine float noise (measured on the test
    fixtures, same protocol as the q26 oracle).
    """
    target = _normed(embeddings, id_col, vec_col, "vec_id")
    probes = _normed(anchors, anchor_id_col, vec_col, "anchor_id").select(
        "anchor_id",
        F.col("vec").alias("avec"),
        F.col("norm").alias("anorm"),
    )
    scored = (
        _spread(target)
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            (
                _dot(F.col("vec"), F.col("avec"))
                / (F.col("norm") * F.col("anorm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") < max_sim)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "rank")
    )


def _knn_rows_arrow(
    embeddings: DataFrame, k: int, id_col: str, vec_col: str
):
    """Per-source exact-cosine top-k rows (src, dst, weight) via a NumPy
    ``mapInArrow`` kernel, or ``None`` when preconditions fail and the
    caller must use the JVM crossJoin path.

    Bit-exactness (r6, guide §4.2): dot products and squared norms are
    ``np.cumsum`` reductions — the identical left-to-right IEEE float64
    addition sequence as the JVM ``aggregate``/``zip_with`` forms — and
    ``sqrt``/``*``/``/`` are correctly-rounded single ops in both
    engines, so every cosine is bit-identical.  The per-source top-k is
    selected under the same (weight desc, dst asc) total order as the
    JVM ``row_number`` window (``np.lexsort`` with (-weight, dst));
    zero-norm vectors are dropped on both sides exactly as ``_normed``
    does.  Build side rides a Spark broadcast variable — the same
    bounded contract as ``crossJoin(F.broadcast(...))``.
    """
    import numpy as np

    spark = embeddings.sparkSession
    if dict(embeddings.dtypes).get(id_col) not in (
        "bigint",
        "int",
        "smallint",
        "tinyint",
    ):
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
        or pre["n"] > 500_000
    ):
        return None
    dim = int(pre["lo"])
    rows = embeddings.select(
        F.col(id_col).cast("long").alias("b"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).collect()
    b_ids = np.array([r["b"] for r in rows], dtype=np.int64)
    b_mat = np.array([r["v"] for r in rows], dtype=np.float64)
    order = np.argsort(b_ids, kind="stable")
    b_ids, b_mat = b_ids[order], b_mat[order]
    # norms exactly as _norm: cumsum of squares, then sqrt
    b_norm = np.sqrt(np.cumsum(b_mat * b_mat, axis=1)[:, -1])
    keep = b_norm > 0
    b_ids, b_mat, b_norm = b_ids[keep], b_mat[keep], b_norm[keep]
    if len(b_ids) == 0:
        return None
    bc = spark.sparkContext.broadcast((b_ids, b_mat, b_norm))

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        ids_b, mat_b, norm_b = bc.value
        m = len(ids_b)
        kk = min(k, m)
        chunk = max(1, (1 << 25) // max(1, m * dim * 8))
        for batch in batches:
            a_ids = batch.column(0).to_numpy(zero_copy_only=False)
            vals = batch.column(1).flatten().to_numpy(
                zero_copy_only=False
            )
            a_mat = np.asarray(vals, dtype=np.float64).reshape(-1, dim)
            a_norm = np.sqrt(np.cumsum(a_mat * a_mat, axis=1)[:, -1])
            src_o, dst_o, w_o = [], [], []
            for s in range(0, len(a_ids), chunk):
                A = a_mat[s : s + chunk]
                ai = a_ids[s : s + chunk]
                an = a_norm[s : s + chunk]
                live = an > 0
                dots = np.cumsum(
                    A[:, None, :] * mat_b[None, :, :], axis=2
                )[:, :, -1]
                w = dots / (an[:, None] * norm_b[None, :])
                selfmask = ai[:, None] == ids_b[None, :]
                for i in range(len(ai)):
                    if not live[i]:
                        continue
                    wi = w[i]
                    ok = ~selfmask[i]
                    cand_w = wi[ok]
                    cand_d = ids_b[ok]
                    if len(cand_w) == 0:
                        continue
                    # total order (weight desc, dst asc) == the JVM
                    # row_number window ordering
                    sel = np.lexsort((cand_d, -cand_w))[:kk]
                    src_o.append(np.full(len(sel), ai[i], dtype=np.int64))
                    dst_o.append(cand_d[sel])
                    w_o.append(cand_w[sel])
            if src_o:
                aa = np.concatenate(src_o)
                bb = np.concatenate(dst_o)
                ww = np.concatenate(w_o)
            else:
                aa = np.array([], dtype=np.int64)
                bb = np.array([], dtype=np.int64)
                ww = np.array([], dtype=np.float64)
            yield pa.record_batch(
                [pa.array(aa), pa.array(bb), pa.array(ww)],
                names=["src", "dst", "weight"],
            )

    va = embeddings.select(
        F.col(id_col).cast("long").alias("src"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    try:
        cap = min(spark.sparkContext.defaultParallelism, 8)
        if va.rdd.getNumPartitions() < cap:
            va = va.repartition(cap)
    except Exception:
        pass
    return va.mapInArrow(fn, "src long, dst long, weight double")


def brute_force_knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs kNN edge list (src < dst, weight = max cosine).

    O(n²) crossJoin(broadcast) — the correctness baseline that oracles the
    IVF :func:`knn_graph`; only for bounded slices (the caller filters ids).
    r6: the pair scoring + per-source top-k runs as a NumPy mapInArrow
    kernel when inputs qualify (:func:`_knn_rows_arrow`, bit-identical
    cosines and ordering); the JVM crossJoin path is the fallback.
    """
    knn = _knn_rows_arrow(embeddings, k, id_col, vec_col)
    if knn is None:
        vecs = _normed(embeddings, id_col, vec_col, "vec_id")
        a = vecs.select(
            F.col("vec_id").alias("src"), F.col("vec").alias("avec"),
            F.col("norm").alias("anorm"),
        )
        b = vecs.select(
            F.col("vec_id").alias("dst"), F.col("vec").alias("bvec"),
            F.col("norm").alias("bnorm"),
        )
        sim = (
            _spread(a).crossJoin(F.broadcast(b))
            .filter(F.col("src") != F.col("dst"))
            .select(
                "src",
                "dst",
                (_dot(F.col("avec"), F.col("bvec")) / (F.col("anorm") * F.col("bnorm"))).alias("weight"),
            )
        )
        w = Window.partitionBy("src").orderBy(
            F.desc("weight"), F.asc("dst")
        )
        knn = (
            sim.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
        )
    return (
        knn.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )


def adaptive_cells(n: int, floor: int = 16) -> int:
    """IVF cell count ∝ √n so in-cell work stays O(n^1.5) total at any scale."""
    import math

    return max(floor, int(math.isqrt(max(n, 1))))


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    hash_fn: str = "xxhash64",
    quantizer: str = "flat",
    n_coarse: int | None = None,
    coarse_probe: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic seed centroids + one assignment pass.

    Centroids = the ``n_cells`` vectors with smallest hash(id) —
    deterministic, no RNG, no iteration (``hash_fn="md5"`` swaps in the
    portable :func:`..dedup.porthash64` so a SQL oracle can replay the
    seed choice verbatim).  Returns
    (centroids(cell, cvec, cnorm), assignments(vec_id, cell, r)) where
    ``r`` ranks the vector's closest cells 1..n_probe (multi-probe: r=1 is
    the home cell; r>1 rows let the probe side cross cell boundaries).

    ``quantizer="flat"`` (default, oracle-checked): every vector compares
    against ALL ``n_cells`` seeds — exact nearest-cell, O(n·n_cells)
    assignment work and an n_cells-row broadcast.  At the 10^12-doc
    design point n_cells=√n ≈ 10^6, so both become the next ceiling
    (r03 VERDICT #5).

    ``quantizer="two_level"``: a coarse layer of ``n_coarse`` (default
    √n_cells) centroids — the first n_coarse seeds in hash order — routes
    each vector to its ``coarse_probe`` closest coarse cells, and the
    vector then compares only against the fine seeds WHOSE home coarse
    cell was probed (equi join on the coarse cell, shuffle-able — the
    full fine-seed table never needs to broadcast).  Per-vector work
    drops from n_cells to n_coarse + coarse_probe·n_cells/n_coarse
    (10^6 → ~3·10^3 at the design point).  Nearest-cell becomes
    approximate: a vector's true home cell can hide in an unprobed
    coarse cell — the standard hierarchical-IVF trade, bounded by
    ``coarse_probe`` (the recall test pins it on a clustered fixture).
    """
    from .dedup import porthash64

    vecs = _normed(embeddings, id_col, vec_col, "vec_id")
    h = (
        porthash64(F.col("vec_id").cast("string"))
        if hash_fn == "md5"
        else F.xxhash64("vec_id")
    )
    seeds = (
        vecs.withColumn("h", h)
        .orderBy("h")
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy("h")).alias("cell"),
            F.col("vec").alias("cvec"),
            F.col("norm").alias("cnorm"),
        )
    )
    if quantizer == "two_level":
        import math

        n_coarse = n_coarse or max(2, math.isqrt(n_cells))
        coarse = seeds.filter(F.col("cell") <= n_coarse).select(
            F.col("cell").alias("ccell"),
            F.col("cvec").alias("covec"),
            F.col("cnorm").alias("conorm"),
        )
        csim = (
            _dot(F.col("cvec"), F.col("covec"))
            / (F.col("cnorm") * F.col("conorm"))
        )
        # each fine seed's home coarse cell (n_cells x n_coarse — tiny)
        wseed = Window.partitionBy("cell").orderBy(
            F.desc("csim"), F.asc("ccell")
        )
        seed_home = (
            seeds.crossJoin(F.broadcast(coarse))
            .select("cell", "cvec", "cnorm", "ccell", csim.alias("csim"))
            .withColumn("cr", F.row_number().over(wseed))
            .filter(F.col("cr") == 1)
            .select("cell", "cvec", "cnorm", "ccell")
        )
        # route each vector to its coarse_probe closest coarse cells
        vsim = (
            _dot(F.col("vec"), F.col("covec"))
            / (F.col("norm") * F.col("conorm"))
        )
        wv = Window.partitionBy("vec_id").orderBy(
            F.desc("vsim"), F.asc("ccell")
        )
        routed = (
            vecs.crossJoin(F.broadcast(coarse))
            .select("vec_id", "vec", "norm", "ccell", vsim.alias("vsim"))
            .withColumn("cr", F.row_number().over(wv))
            .filter(F.col("cr") <= coarse_probe)
            .select("vec_id", "vec", "norm", "ccell")
        )
        # fine comparison only inside probed coarse cells (equi join —
        # no broadcast of the full fine-seed table required)
        sim = routed.join(seed_home, "ccell").select(
            "vec_id",
            "cell",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("norm") * F.col("cnorm"))
            ).alias("sim"),
        )
    else:
        sim = vecs.crossJoin(F.broadcast(seeds)).select(
            "vec_id",
            "cell",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("norm") * F.col("cnorm"))
            ).alias("sim"),
        )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    assign = (
        sim.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_probe)
        .select("vec_id", "cell", "r")
    )
    return seeds, assign


def ivf_top_k(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n: int | None = None,
    quantizer: str = "flat",
) -> DataFrame:
    """ANN top-k: probe only the n_probe closest IVF cells per query.

    The scan side shrinks by ~n_probe/n_cells; the join is equi on cell —
    the 100 TB path where brute force is off the table.  Default
    ``n_cells=None`` = adaptive √n (pass ``n=`` to skip the count job);
    ``quantizer="two_level"`` bounds the assignment pass at extreme cell
    counts (see :func:`ivf_assign`).
    """
    if n_cells is None:
        n_cells = adaptive_cells(n if n is not None else embeddings.count())
    seeds, assign = ivf_assign(
        embeddings, n_cells, id_col, vec_col, quantizer=quantizer
    )
    vecs = _normed(embeddings, id_col, vec_col, "vec_id").join(
        assign.select("vec_id", "cell"), "vec_id"
    )

    probes = _normed(query, query_id_col, vec_col, "query_id").select(
        "query_id", F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    qcells = probes.crossJoin(F.broadcast(seeds)).select(
        "query_id",
        "qvec",
        "qnorm",
        "cell",
        (
            _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
        ).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
    probe_cells = (
        qcells.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "qvec", "qnorm", "cell")
    )

    scored = vecs.join(probe_cells, "cell").select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 10,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    n: int | None = None,
    hash_fn: str = "xxhash64",
    quantizer: str = "flat",
) -> DataFrame:
    """Approximate all-pairs kNN edge list (src < dst, weight = cosine).

    The J6 substitute: vectors meet only within shared IVF cells (the cell
    is the equi join key), then per-node window top-k; edges deduped with
    src < dst like the reference's edge buffer
    (/root/reference/topic_analysis.py:124-131).

    Scale levers: the DEFAULT ``n_cells=None`` picks √n cells so the
    in-cell self-join stays O(n^1.5) rows total at any corpus size — a
    fixed cell count is the classic 100×-scale killer, so it is opt-in,
    not the default.  Pass ``n=`` (an already-known row count, e.g. a
    checkpointed stage's ledger count) to skip the sizing count job.  The
    probe side visits its ``n_probe`` closest cells so near-neighbors
    split across a cell boundary are still found.
    """
    if n_cells is None:
        n_cells = adaptive_cells(n if n is not None else embeddings.count())
    _, assign = ivf_assign(
        embeddings, n_cells, id_col, vec_col, n_probe=n_probe,
        hash_fn=hash_fn, quantizer=quantizer,
    )
    vecs = _normed(embeddings, id_col, vec_col, "vec_id")
    # index side: home cell only; probe side: n_probe closest cells —
    # every candidate pair still meets exactly like FAISS multi-probe.
    idx = vecs.join(
        assign.filter(F.col("r") == 1).select("vec_id", "cell"), "vec_id"
    )
    probe = vecs.join(assign.select("vec_id", "cell"), "vec_id")
    a, b = probe.alias("a"), idx.alias("b")
    sim = (
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
    w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    knn = sim.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    return (
        knn.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )


def _best_match_arrow(
    probe: DataFrame, build: DataFrame, probe_id: str, build_id: str
):
    """Per-probe argmax of the exact int64 quantized dot against a
    broadcast build side → (probe_id, build_id, qdot), or ``None`` when
    preconditions fail (non-integral ids, ragged/NULL q-vectors,
    build side above the broadcast-exactness bound).

    Tie-break: max qdot, then MIN build id — the build side is sorted
    by id ascending and ``np.argmax`` returns the first maximum, which
    is exactly the JVM ``min(struct(-qdot, id))`` total order.  All
    arithmetic is integer, so there is no accumulation-order concern
    (r6, guide §4.2).
    """
    import numpy as np

    qcol_p, qcol_b = f"{probe_id}_q", f"{build_id}_q"
    for df, idc in ((probe, probe_id), (build, build_id)):
        if dict(df.dtypes).get(idc) not in (
            "bigint",
            "int",
            "smallint",
            "tinyint",
        ):
            return None
    pre = build.agg(
        F.min(F.size(qcol_b)).alias("lo"),
        F.max(F.size(qcol_b)).alias("hi"),
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col(qcol_b).isNull(), 1).otherwise(0)
        ).alias("n_null"),
    ).first()
    if (
        pre is None
        or not pre["n"]
        or pre["n_null"]
        or pre["lo"] is None
        or pre["lo"] != pre["hi"]
        or pre["lo"] <= 0
        or pre["n"] > 500_000
    ):
        return None
    dim = int(pre["lo"])
    rows = build.select(
        F.col(build_id).cast("long").alias("b"), F.col(qcol_b).alias("v")
    ).collect()
    if any(r["v"] is None or len(r["v"]) != dim for r in rows):
        return None
    b_ids = np.array([r["b"] for r in rows], dtype=np.int64)
    b_mat = np.array([r["v"] for r in rows], dtype=np.int64)
    order = np.argsort(b_ids, kind="stable")
    b_ids, b_mat = b_ids[order], b_mat[order]
    spark = probe.sparkSession
    bc = spark.sparkContext.broadcast((b_ids, b_mat.T.copy()))

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        ids_b, mat_bt = bc.value
        for batch in batches:
            p_ids = batch.column(0).to_numpy(zero_copy_only=False)
            lst = batch.column(1)
            vals = lst.flatten().to_numpy(zero_copy_only=False)
            p_mat = np.asarray(vals, dtype=np.int64).reshape(-1, dim)
            if len(p_ids):
                scores = p_mat @ mat_bt  # exact int64
                idx = np.argmax(scores, axis=1)  # first max = min id
                best_ids = ids_b[idx]
                best_q = scores[np.arange(len(p_ids)), idx]
            else:
                best_ids = np.array([], dtype=np.int64)
                best_q = np.array([], dtype=np.int64)
            yield pa.record_batch(
                [
                    pa.array(np.asarray(p_ids, dtype=np.int64)),
                    pa.array(best_ids),
                    pa.array(best_q),
                ],
                names=[probe_id, build_id, "qdot"],
            )

    pv = probe.select(
        F.col(probe_id).cast("long").alias(probe_id), F.col(qcol_p)
    ).filter(F.col(qcol_p).isNotNull() & (F.size(qcol_p) == dim))
    # rows failing the dim/null guard would crash the kernel; their
    # absence from the JVM argmax semantics: a NULL/ragged probe q-vec
    # cannot produce a qdot in the zip_with path either (null dot), so
    # dropping them preserves the pair set.  Partitions capped at 8 when
    # under-partitioned — cold Python workers pay one numpy import each,
    # which dominates the (vectorized, sub-second) compute.
    try:
        cap = min(pv.sparkSession.sparkContext.defaultParallelism, 8)
        if pv.rdd.getNumPartitions() < cap:
            pv = pv.repartition(cap)
    except Exception:
        pass
    return pv.mapInArrow(
        fn, f"{probe_id} long, {build_id} long, qdot long"
    )


def mutual_best_match(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal best match (mutual-nearest) entity ALIGNMENT between two
    embedding sets under int8-quantized maximum-inner-product search →
    (left_id, right_id, qdot): the pairs where each side is the other's
    argmax.

    The KG-merge primitive: aligning author/affiliation/topic nodes
    across two independently-built graphs (or two crawl snapshots) keeps
    only RECIPROCAL best matches — the standard high-precision filter
    (a one-directional best match is wrong whenever the true partner is
    missing; reciprocity makes the match self-certifying).  The
    reference links entities inside ONE store via alias dictionaries
    (/root/reference/populate_author_affiliations.py); this is the
    cross-store alignment step that store never needs.

    Determinism at the core: vectors are int8-quantized with the q36
    arithmetic (scale = max|x| — an ORDER-INDEPENDENT reduce, never a
    float sum — then floor(x·127/scale + 0.5)), and the match score is
    the EXACT BIGINT dot of the quantized vectors, so argmax + ties
    ((qdot desc, id asc)) are bit-identical across engines and
    partitionings — no float accumulation order anywhere (the trap that
    makes naive cosine argmax irreproducible: a + b + c ≠ c + a + b in
    doubles).  Quantized MIPS ranking approximates cosine ranking to
    the int8 resolution; alignment keeps only mutual ARGMAX rows, so
    the int8 rounding must flip a top-1 to matter at all.

    Plan: the score join is |L|×|R| through ``crossJoin(broadcast(R))``
    — the exactness baseline, right side bounded by contract (the q22
    discipline).  At corpus scale, pre-block both sides with
    :func:`ivf_assign` on a SHARED quantizer and run this per cell
    (equi-join on cell), exactly as :func:`knn_graph` does; the
    reciprocity join itself is two window ranks + one equi-join —
    linear, shuffle on each side's id.
    """
    def _quant(df: DataFrame, out_id: str) -> DataFrame:
        v = F.col(vec_col)
        scale = F.greatest(
            F.aggregate(
                F.transform(v, lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ),
            F.lit(1e-30),
        )
        return df.select(
            F.col(id_col).alias(out_id), v.alias("_v"), scale.alias("_s")
        ).select(
            out_id,
            F.transform(
                "_v",
                lambda x: F.floor(
                    x.cast("double") * 127.0 / F.col("_s") + 0.5
                ).cast("long"),
            ).alias(f"{out_id}_q"),
        )

    lq = _quant(left, "left_id")
    rq = _quant(right, "right_id")
    # r6 (guide §4.2): when both quantized sides qualify, the argmax
    # halves run as NumPy mapInArrow kernels — int64 matmul + first-max
    # argmax is EXACT integer arithmetic (order-free), so the result is
    # bit-identical to the JVM zip_with dot + min(struct) aggregate.
    bl = _best_match_arrow(lq, rq, "left_id", "right_id")
    br = _best_match_arrow(rq, lq, "right_id", "left_id")
    if bl is not None and br is not None:
        best_l = bl.select("left_id", "right_id", "qdot")
        best_r = br.select("right_id", "left_id")
        return best_l.join(best_r, ["left_id", "right_id"], "left_semi")
    scored = _spread(lq).crossJoin(F.broadcast(rq)).select(
        "left_id",
        "right_id",
        F.aggregate(
            F.zip_with("left_id_q", "right_id_q", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    # r6 (guide §2.3 'aggregate before you shuffle'): the per-side argmax
    # ((qdot desc, id asc) — EXACT bigint ordering, so min over
    # struct(-qdot, id) is the identical total order) runs as a hash
    # aggregate with map-side partial aggregation: each partition ships
    # one candidate per id instead of the whole |L|×|R| score matrix
    # through a sort window.  Bit-identical to the former
    # row_number()-over-window formulation.
    best_l = (
        scored.groupBy("left_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("qdot")).alias("_nq"),
                    F.col("right_id").alias("right_id"),
                )
            ).alias("_b")
        )
        .select(
            "left_id",
            F.col("_b.right_id").alias("right_id"),
            (-F.col("_b._nq")).alias("qdot"),
        )
    )
    best_r = (
        scored.groupBy("right_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("qdot")).alias("_nq"),
                    F.col("left_id").alias("left_id"),
                )
            ).alias("_b")
        )
        .select("right_id", F.col("_b.left_id").alias("left_id"))
    )
    return best_l.join(best_r, ["left_id", "right_id"], "left_semi")


def semantic_dedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    tau_millis: int = 950,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): embedding-space semantic
    deduplication → (vec_id, cell, status 'keep'|'drop', partner):
    vectors are routed to deterministic seed cells, and inside each
    cell a vector is DROPPED when an earlier (smaller-id) cellmate
    sits above the cosine threshold — ``partner`` is the smallest such
    keeper, NULL for keeps.

    Completes the dedup ladder above MinHash/SimHash: those catch
    lexical near-copies; SemDeDup prunes semantic duplicates —
    paraphrases, translations-of-boilerplate, templated rewrites —
    that share no shingles at all.  The paper clusters with k-means
    and prunes within clusters; the cluster step here is the repo's
    deterministic IVF discipline (seeds = ``n_cells`` smallest
    hash(id), route by ARGMAX quantized dot — the q104 MIPS contract),
    so the whole operator is a pure function of the input.

    Exactness: no float leaves the quantizer.  Routing compares EXACT
    BIGINT dots of q36-quantized vectors; the prune test
    ``cos(a,b) ≥ τ`` runs CROSS-MULTIPLIED on the quantized integers —
    ``d > 0  AND  d²·10⁶ ≥ τ²·‖a‖²·‖b‖²`` with τ in millis — one
    BIGINT inequality, no division, no sqrt, bit-identical in any
    engine (dim ≤ 64 keeps every term under 2⁶³; d = int8 dot ≤
    64·127², d²·10⁶ < 2⁶¹).

    100 TB shape: seeds broadcast (n_cells = √n discipline of
    :func:`ivf_assign`), assignment is one narrow pass, the prune is a
    within-cell self-equi-join — O(n²/n_cells) total, the documented
    O(n^1.5) IVF envelope; the min-partner groupBy is map-side
    combinable.  Boundary loss (true duplicates split across cells) is
    the standard SemDeDup trade, bounded by cell granularity.  Skew
    caveat: a duplicate-SATURATED cell (one embedding repeated m times
    lands m rows on one cell key → m²/2 pairs through one task) is the
    same failure mode `_blocked_self_join` solves for the lexical
    families — on corpora where that regime is expected, run
    `dedup.exact_duplicates` on the embedding bytes first (identical
    vectors are exact dups by definition) so cells only ever hold
    near-neighbors.
    """
    from .dedup import porthash64

    v = F.col(vec_col)
    scale = F.greatest(
        F.aggregate(
            F.transform(v, lambda x: F.abs(x.cast("double"))),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ),
        F.lit(1e-30),
    )
    q = embeddings.select(
        F.col(id_col).alias("vec_id"), v.alias("_v"), scale.alias("_s")
    ).select(
        "vec_id",
        F.transform(
            "_v",
            lambda x: F.floor(
                x.cast("double") * 127.0 / F.col("_s") + 0.5
            ).cast("long"),
        ).alias("qv"),
    )

    def _dotq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    h = (
        porthash64(F.col("vec_id").cast("string"))
        if hash_fn == "md5"
        else F.xxhash64("vec_id")
    )
    seeds = (
        q.withColumn("_h", h)
        .orderBy("_h")
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy("_h")).alias("cell"),
            F.col("qv").alias("sqv"),
        )
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.desc("_qdot"), F.asc("cell")
    )
    assigned = (
        q.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id", "qv", "cell",
            _dotq(F.col("qv"), F.col("sqv")).alias("_qdot"),
        )
        .withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") == 1)
        .select(
            "vec_id", "cell", "qv",
            _dotq(F.col("qv"), F.col("qv")).alias("nq"),
        )
    )
    a = assigned.select(
        "cell",
        F.col("vec_id").alias("_ka"),
        F.col("qv").alias("_qa"),
        F.col("nq").alias("_na"),
    )
    b = assigned.select(
        "cell",
        F.col("vec_id").alias("_kb"),
        F.col("qv").alias("_qb"),
        F.col("nq").alias("_nb"),
    )
    d = _dotq(F.col("_qa"), F.col("_qb"))
    tau2 = int(tau_millis) * int(tau_millis)
    dropped = (
        a.join(b, "cell")
        .filter(F.col("_ka") < F.col("_kb"))
        .select("cell", "_ka", "_kb", d.alias("_d"), "_na", "_nb")
        .filter(
            (F.col("_d") > 0)
            & (
                F.col("_d") * F.col("_d") * F.lit(1000000)
                >= F.lit(tau2) * F.col("_na") * F.col("_nb")
            )
        )
        .groupBy(F.col("_kb").alias("vec_id"))
        .agg(F.min("_ka").alias("partner"))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("partner").isNull(), F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("status"),
            "partner",
        )
    )
