"""Idempotent sinks (A5-A8) and Spark ML operators (J5/J8/J9/D13)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from convei_abstract_relational_knowledge_explorer_spark.operators import ml
from convei_abstract_relational_knowledge_explorer_spark.sources import sinks


def test_insert_if_absent_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    rows1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert sinks.insert_if_absent(spark, rows1, path, ["k"]) == 2
    # re-run: OR IGNORE semantics
    assert sinks.insert_if_absent(spark, rows1, path, ["k"]) == 0
    rows2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    assert sinks.insert_if_absent(spark, rows2, path, ["k"]) == 1
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}  # existing row untouched


def test_upsert_overwrites_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    sinks.upsert(
        spark, spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, ["k"],
    )
    sinks.upsert(
        spark, spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        path, ["k"],
    )
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_fill_missing_only_nulls(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "keep"), (2, None), (3, None)], "k long, v string"
    ).write.parquet(path)
    sinks.fill_missing(
        spark,
        spark.createDataFrame([(1, "new"), (2, "filled")], "k long, v string"),
        path, ["k"], "v",
    )
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "keep"), (2, "filled"), (3, None)}


def test_write_report_csv(spark, tmp_path):
    path = str(tmp_path / "report")
    sinks.write_report(
        spark.createDataFrame([(1, "x")], "a long, b string"), path, "csv"
    )
    back = spark.read.option("header", "true").csv(path)
    assert back.collect()[0]["b"] == "x"


# ---------------------------------------------------------------------------
# ML operators
# ---------------------------------------------------------------------------


def _clustered_vectors(spark):
    rows = []
    for i in range(40):
        cluster = i % 2
        base = [1.0, 0.0] if cluster == 0 else [0.0, 1.0]
        vec = [base[0] + 0.01 * (i % 5), base[1] + 0.01 * ((i * 3) % 5)]
        rows.append((i, vec, cluster))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int"
    )


def test_cluster_centroids_normalized(spark):
    df = _clustered_vectors(spark)
    cents = {r["cluster"]: r for r in ml.cluster_centroids(df).collect()}
    assert set(cents) == {0, 1}
    for r in cents.values():
        norm = sum(x * x for x in r["centroid"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-9)
        assert r["n_members"] == 20
    assert cents[0]["centroid"][0] > 0.9
    assert cents[1]["centroid"][1] > 0.9


def test_cluster_representatives(spark):
    df = _clustered_vectors(spark)
    cents = ml.cluster_centroids(df)
    reps = ml.cluster_representatives(df, cents, k=3)
    by_cluster = {}
    for r in reps.collect():
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert all(len(v) == 3 for v in by_cluster.values())
    assert all(r["rank"] in (1, 2, 3) for v in by_cluster.values() for r in v)


def test_cluster_top_terms(spark):
    rows = [
        (0, "alpha beta alpha gamma"),
        (0, "alpha delta beta"),
        (1, "omega psi omega chi"),
        (1, "omega psi tau"),
    ]
    df = spark.createDataFrame(rows, "cluster int, text string")
    top = ml.cluster_top_terms(df, k=2, min_df=1)
    by_cluster = {}
    for r in top.collect():
        by_cluster.setdefault(r["cluster"], []).append(r["token"])
    assert by_cluster[0][0] == "alpha"
    assert by_cluster[1][0] == "omega"


def test_multilabel_classifier_roundtrip(spark):
    df = _clustered_vectors(spark).withColumnRenamed("cluster", "label")
    model = ml.train_multilabel_classifier(df, label_col="label")
    preds = ml.classify(model, df)
    joined = preds.join(df, "vec_id")
    acc = joined.filter(F.col("prediction") == F.col("label")).count() / 40
    assert acc >= 0.95


def test_classifier_accept_thresholds_reject_low_confidence(spark):
    """J5 parity: the reference gates on max predict_proba >= 0.85 and keeps
    labels with p >= 0.5 (/root/reference/multi_label_classifier.py:155-162).
    An ambiguous midpoint vector must be rejected; confident ones accepted."""
    df = _clustered_vectors(spark).withColumnRenamed("cluster", "label")
    model = ml.train_multilabel_classifier(df, label_col="label")
    probe = spark.createDataFrame(
        [
            (100, [1.0, 0.0]),   # squarely class 0
            (101, [0.0, 1.0]),   # squarely class 1
            (102, [0.5, 0.5]),   # ambiguous midpoint -> rejected
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in ml.classify_with_probs(model, probe).collect()}
    assert 100 in out and out[100]["labels"] == [0]
    assert 101 in out and out[101]["labels"] == [1]
    assert 102 not in out  # max_p < 0.85 gate
    assert all(r["max_p"] >= 0.85 for r in out.values())
    assert out[100]["satellite_type"] == "0"


def test_kmeans_clusters_separates_obvious_groups(spark):
    """J11: Spark ML KMeans with the reference's fallback k sizing
    (/root/reference/multitopic_tracer.py:122-128)."""
    df = _clustered_vectors(spark)
    out = ml.kmeans_clusters(df, min_cluster_size=10)  # n=40 -> k=min(4, 40//10)=4
    got = out.join(df, "vec_id").collect()
    # the two base groups never share a KMeans cluster
    by_label: dict[int, set[int]] = {}
    for r in got:
        by_label.setdefault(r["cluster"], set()).add(r["vec_id"] % 2)
    for members in by_label.values():
        assert len(members) == 1  # each KMeans cluster is label-pure
    assert out.select("cluster").distinct().count() >= 2


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    """A7 at scale (VERDICT r01 "what's wrong" #5): untouched partitions'
    files must be byte-identical after the merge."""
    import os

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 2019, "a"), (2, 2019, "b"), (3, 2020, "c"), (4, 2021, "d")],
        "k long, year int, v string",
    )
    sinks.upsert_partitioned(spark, base, path, ["k"], "year")

    def files_of(year):
        d = os.path.join(path, f"year={year}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    before_2019, before_2021 = files_of(2019), files_of(2021)

    # update one 2020 row + insert a new 2020 row
    sinks.upsert_partitioned(
        spark,
        spark.createDataFrame([(3, 2020, "C"), (5, 2020, "e")],
                              "k long, year int, v string"),
        path, ["k"], "year",
    )
    got = {(r["k"], r["year"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 2019, "a"), (2, 2019, "b"), (3, 2020, "C"),
                   (4, 2021, "d"), (5, 2020, "e")}
    # untouched partitions: same files, same mtimes
    assert files_of(2019) == before_2019
    assert files_of(2021) == before_2021


def test_classifier_accepts_multilabel_raw_sigmoids(spark):
    """The reference fits a 2D multilabel indicator, so sklearn's
    OneVsRestClassifier predict_proba returns RAW per-class sigmoids (no
    sum-to-1 normalization) — a doc confidently in TWO classes keeps both
    labels (/root/reference/multi_label_classifier.py:149-162).  r02
    normalized, which inverted this case: [0.98, 0.98] became [0.5, 0.5]
    and was rejected."""
    from types import SimpleNamespace

    # two linearly separable binary heads: class0 fires on dim0, class1 on
    # dim1; z = 6*x - 2 -> sigmoid(4) = 0.982 when the dim is hot
    model = SimpleNamespace(
        models=[
            SimpleNamespace(coefficients=[6.0, 0.0], intercept=-2.0),
            SimpleNamespace(coefficients=[0.0, 6.0], intercept=-2.0),
        ]
    )
    probe = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),  # only class 0 confident
            (2, [0.0, 1.0]),  # only class 1 confident
            (3, [1.0, 1.0]),  # BOTH confident -> both labels kept
            (4, [0.1, 0.1]),  # neither reaches 0.85 -> rejected
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in ml.classify_with_probs(model, probe).collect()}
    assert out[1]["labels"] == [0] and out[1]["satellite_type"] == "0"
    assert out[2]["labels"] == [1] and out[2]["satellite_type"] == "1"
    assert out[3]["labels"] == [0, 1] and out[3]["satellite_type"] == "0,1"
    assert abs(out[3]["max_p"] - 0.982014) < 1e-4  # raw sigmoid, not 0.5
    assert 4 not in out


def test_upsert_partitioned_sweep_moved_keys(spark, tmp_path):
    """A key whose partition value changes: default mode documents the
    fact-table invariant (stale row survives); sweep_moved_keys=True finds
    and deletes the stale row in the old partition."""
    schema = "k long, year int, v string"
    base = spark.createDataFrame(
        [(1, 2019, "a"), (2, 2020, "b"), (3, 2021, "c")], schema
    )
    moved = spark.createDataFrame([(1, 2020, "A")], schema)  # 2019 -> 2020

    p1 = str(tmp_path / "no_sweep")
    sinks.upsert_partitioned(spark, base, p1, ["k"], "year")
    sinks.upsert_partitioned(spark, moved, p1, ["k"], "year")
    got1 = {(r["k"], r["year"]) for r in spark.read.parquet(p1).collect()}
    assert (1, 2019) in got1 and (1, 2020) in got1  # documented stale dup

    p2 = str(tmp_path / "sweep")
    sinks.upsert_partitioned(spark, base, p2, ["k"], "year")
    sinks.upsert_partitioned(
        spark, moved, p2, ["k"], "year", sweep_moved_keys=True
    )
    got2 = {(r["k"], r["year"], r["v"]) for r in spark.read.parquet(p2).collect()}
    assert got2 == {(1, 2020, "A"), (2, 2020, "b"), (3, 2021, "c")}


def test_upsert_partitioned_sweep_escaped_partition(spark, tmp_path):
    """Partition values Spark escapes on disk (':' -> %3A) must still be
    swept when emptied — the cleanup resolves directories by listing and
    unescaping, not by re-deriving the path from the raw value."""
    schema = "k long, batch string, v string"
    base = spark.createDataFrame([(1, "a:b", "x"), (2, "c", "y")], schema)
    moved = spark.createDataFrame([(1, "c", "X")], schema)  # a:b -> c

    p = str(tmp_path / "esc")
    sinks.upsert_partitioned(spark, base, p, ["k"], "batch")
    import os

    assert "batch=a%3Ab" in os.listdir(p)  # Spark-escaped dir exists
    sinks.upsert_partitioned(
        spark, moved, p, ["k"], "batch", sweep_moved_keys=True
    )
    got = {(r["k"], r["batch"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "c", "X"), (2, "c", "y")}
    assert "batch=a%3Ab" not in os.listdir(p)  # emptied partition dropped


def test_upsert_partitioned_sweep_null_partition(spark, tmp_path):
    """r03 ADVICE (medium): keys moving OUT OF or INTO the NULL partition.
    Plain ``~isin(touched)`` evaluates to NULL (row dropped) on a NULL
    partition value, so the stale NULL-partition row silently survived;
    and ``sorted()`` raised TypeError once a None partition value entered
    the touched set.  Both directions must now merge cleanly."""
    import os

    schema = "k long, year int, v string"
    p = str(tmp_path / "nullpart")
    base = spark.createDataFrame(
        [(1, None, "a"), (2, 2020, "b"), (3, None, "c")], schema
    )
    sinks.upsert_partitioned(spark, base, p, ["k"], "year")
    assert "year=__HIVE_DEFAULT_PARTITION__" in os.listdir(p)

    # k=1 moves OUT of the NULL partition -> its stale NULL row must go,
    # while k=3 (untouched NULL-partition resident) survives
    sinks.upsert_partitioned(
        spark,
        spark.createDataFrame([(1, 2020, "A")], schema),
        p, ["k"], "year", sweep_moved_keys=True,
    )
    got = {(r["k"], r["year"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, 2020, "A"), (2, 2020, "b"), (3, None, "c")}

    # k=2 moves INTO the NULL partition -> stale 2020 row must go and the
    # existing NULL-partition resident must be kept through the rewrite
    sinks.upsert_partitioned(
        spark,
        spark.createDataFrame([(2, None, "B")], schema),
        p, ["k"], "year", sweep_moved_keys=True,
    )
    got = {(r["k"], r["year"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, 2020, "A"), (2, None, "B"), (3, None, "c")}

    # the whole NULL partition empties out -> its directory is dropped
    sinks.upsert_partitioned(
        spark,
        spark.createDataFrame([(2, 2021, "B2"), (3, 2021, "C2")], schema),
        p, ["k"], "year", sweep_moved_keys=True,
    )
    got = {(r["k"], r["year"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, 2020, "A"), (2, 2021, "B2"), (3, 2021, "C2")}
    assert "year=__HIVE_DEFAULT_PARTITION__" not in os.listdir(p)


def test_kmeans_with_noise_labels_outliers(spark):
    """J11's documented HDBSCAN delta, partially closed (r03 'what's
    missing' #2): far-from-centroid points get cluster -1 like HDBSCAN's
    noise label; dense members keep their KMeans cluster."""
    import random

    rng = random.Random(3)
    rows = []
    for cid, center in enumerate(([5.0, 0.0], [0.0, 5.0])):
        for i in range(40):
            rows.append(
                (cid * 100 + i,
                 [c + rng.gauss(0, 0.2) for c in center])
            )
    # two extreme outliers, nearest to cluster 0/1 but far off
    rows += [(900, [50.0, -40.0]), (901, [-40.0, 50.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=4: Lloyd gives each extreme outlier a singleton centroid
    # (below min_cluster_size -> noise) and the dense clusters separate
    got = {r["vec_id"]: r for r in ml.kmeans_with_noise(df, k=4).collect()}
    assert got[900]["cluster"] == -1 and got[901]["cluster"] == -1
    # dense members: labeled, label-pure per generator cluster
    labels0 = {got[i]["cluster"] for i in range(0, 40)}
    labels1 = {got[100 + i]["cluster"] for i in range(0, 40)}
    assert -1 not in labels0 | labels1  # the 90th-percentile cut + 1.5x
    assert len(labels0) == 1 and len(labels1) == 1 and labels0 != labels1
    assert all(r["dist"] >= 0 for r in got.values())


def test_dbscan_recovers_crescents_kmeans_splits(spark):
    """r4 VERDICT #4 'done' fixture: two interleaved crescents (the
    make_moons shape) + 3 far outliers.  Any centroid method must cut
    each crescent (the ends of one arc are farther apart than the gap
    to the other arc), while density-reachability follows the arc:
    DBSCAN returns exactly 2 clusters == the 2 crescents + the outliers
    as noise; kmeans_with_noise(k=2) mixes both crescents in one
    cluster."""
    import math

    from convei_abstract_relational_knowledge_explorer_spark.operators.ml import (
        dbscan_clusters,
        kmeans_with_noise,
    )

    N = 40
    pts = []
    for i in range(N):
        t = math.pi * i / (N - 1)
        pts.append((i, [math.cos(t), math.sin(t)]))           # moon A
        pts.append((100 + i, [1 - math.cos(t), 0.5 - math.sin(t)]))  # moon B
    outliers = [(900, [5.0, 5.0]), (901, [-5.0, -5.0]), (902, [6.0, -5.0])]
    df = spark.createDataFrame(
        pts + outliers, "vec_id long, embedding array<double>"
    )

    got = {
        r.node: (r.cluster, r.is_core, r.is_noise)
        for r in dbscan_clusters(df, eps_sq=0.04, min_pts=3).collect()
    }
    assert len(got) == 2 * N + 3
    # outliers are noise
    for o in (900, 901, 902):
        assert got[o] == (-1, False, True)
    # each moon is ONE cluster, and the two differ
    moon_a = {got[i][0] for i in range(N)}
    moon_b = {got[100 + i][0] for i in range(N)}
    assert len(moon_a) == 1 and len(moon_b) == 1 and moon_a != moon_b
    assert moon_a == {0} and moon_b == {100}  # min-member cluster ids
    # arc interiors are core (deg >= 2 within eps)
    assert all(got[i][1] for i in range(1, N - 1))

    # kmeans k=2: at least one cluster mixes members of BOTH moons
    km = {
        r[0]: r[1]
        for r in kmeans_with_noise(
            df, k=2, min_cluster_size=3, noise_scale=100.0
        ).select("vec_id", "cluster").collect()
    }
    a_labels = {km[i] for i in range(N) if km[i] != -1}
    b_labels = {km[100 + i] for i in range(N) if km[100 + i] != -1}
    assert len(a_labels) > 1 or len(b_labels) > 1 or (a_labels & b_labels)
