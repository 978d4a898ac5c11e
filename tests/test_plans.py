"""Physical-plan assertions: the plans we designed are the plans we get.

These guard the scale properties SURVEY.md §4 calls out — predicate
pushdown, column pruning, broadcast joins, whole-stage codegen, window
group-limit — so a refactor can't silently regress them.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_pruning(spark):
    df = entrymod.queries()["q01_pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the needed columns reach the scan
    assert "l_quantity" in plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_partkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_substring_scan_is_broadcast_nl_join(spark):
    df = entrymod.queries()["q14_term_mentions"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "Contains" in plan


def test_dim_join_is_broadcast_hash(spark):
    df = entrymod.queries()["q06_revenue_by_nation_year"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_anti_and_semi_joins(spark):
    anti = entrymod.queries()["q04_customers_without_orders"](spark, SF)
    assert "LeftAnti" in _plan(anti)
    semi = entrymod.queries()["q05_orders_with_heavy_lines"](spark, SF)
    assert "LeftSemi" in _plan(semi)


def test_topk_uses_window_group_limit(spark):
    df = entrymod.queries()["q02_top_customers_per_nation"](spark, SF)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan  # rank filter pushed into the sort


def test_global_topk_is_take_ordered(spark):
    df = entrymod.queries()["q20_top_docs_by_length"](spark, SF)
    assert "TakeOrderedAndProject" in _plan(df)


def test_whole_stage_codegen_on_text_ops(spark):
    df = entrymod.queries()["q12_token_counts"](spark, SF)
    df.collect()  # AQE finalizes the plan (codegen ids appear post-exec)
    plan = _plan(df)
    assert "codegen id" in plan  # the projection runs inside codegen


def test_partial_aggregation_before_shuffle(spark):
    df = entrymod.queries()["q01_pricing_summary"](spark, SF)
    plan = _plan(df)
    # partial then final hash aggregate around one hash-partitioned exchange
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning" in plan


def test_simhash_blocking_is_equi_join(spark):
    """The pigeonhole-blocked signature self-join must be a shuffled equi
    join on the (chunk, value) key — never a cartesian/BNL product — and
    the candidate DISTINCT must sit in signature-pair space (the frontier
    rewrite), i.e. the plan partial-aggregates before the exchange."""
    df = entrymod.queries()["q25_simhash_near_dups"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning" in plan


def test_repetition_scores_plan(spark):
    """q34 is a pure aggregate chain: no joins except the final left
    join-backs, partial aggregation before each exchange, no cartesian."""
    df = entrymod.queries()["q34_repetition_scores"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine on (doc, n, gram)
    assert plan.count("HashAggregate") >= 2


def test_shard_assignment_no_global_sort(spark):
    """q37's benched plan must rank within hash buckets — a
    single-partition window here is the 100x-scale killer (r03 #2)."""
    df = entrymod.queries()["q37_shard_assignment"](spark, SF)
    plan = _plan(df)
    assert "SinglePartition" not in plan
    assert "Window" in plan  # still a window rank, just hash-partitioned


def test_quantization_has_no_shuffle(spark):
    """q36 is narrow transforms only — no Exchange anywhere in the plan
    (per-vector scale via higher-order aggregate + posexplode)."""
    df = entrymod.queries()["q36_quantized_embeddings"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan


def test_python_kernel_partitions_survive_aqe(spark):
    """operators/_parallel.py empirical anchor: AQE's byte-based
    coalescer collapses a HASH ``repartition(n, col)`` that sits under
    ``mapInPandas`` (the executed stage runs on 1-2 partitions — the
    per-row Python kernel then runs serially), while the round-robin
    ``repartition(n)`` spread_for_python pins keeps its explicit count.
    If a Spark upgrade changes either behavior, this test tells us to
    re-decide the spread strategy."""
    import pyspark.sql.functions as F

    from convei_abstract_relational_knowledge_explorer_spark.operators._parallel import (
        spread_for_python,
    )

    df = (
        spark.range(10000)
        .withColumn("k", F.col("id").cast("string"))
        .select("k")
        .distinct()
    )

    def ident(batches):
        yield from batches

    spread = spread_for_python(df).mapInPandas(ident, schema="k string")
    n = spark.sparkContext.defaultParallelism * 3
    assert spread.rdd.getNumPartitions() == n
    # (the hash repartition(n, col) form was measured collapsing to 1-2
    # executed partitions under AQE in the pipeline's session configs —
    # whether it collapses depends on session shape, so only the
    # round-robin guarantee is anchored here)


def test_linking_and_topic_dedup_spread_for_python(spark):
    """The two heaviest per-row kernels (affiliation linking cascade,
    within-doc topic dedup) must run on a pinned round-robin spread, not
    on the AQE-coalesced exchange."""
    from convei_abstract_relational_knowledge_explorer_spark.operators.linking import (
        link_affiliations,
    )
    from convei_abstract_relational_knowledge_explorer_spark.operators.topics import (
        dedup_topics_within_doc,
    )

    segs = spark.createDataFrame(
        [(1, 0, "A. Smith", 0, "g", "Dept of Geography, Univ of Oxford")],
        "doc_id long, affiliation_index int, author_name string,"
        " author_index int, raw_author_group string,"
        " affiliation_text string",
    )
    plan = link_affiliations(segs)._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan

    topics = spark.createDataFrame(
        [(1, "land cover", 1.0), (1, "land cover change", 0.9)],
        "doc_id long, topic string, score double",
    )
    plan2 = (
        dedup_topics_within_doc(topics)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "REPARTITION_BY_NUM" in plan2 or "RoundRobinPartitioning" in plan2


def test_asof_join_single_shuffle_no_join(spark):
    """q45's as-of is the union-window formulation: the physical plan
    must contain exactly ONE exchange (hash on user_id for the window)
    and NO join operator at all — the scalable property that
    distinguishes it from a range-join explosion."""
    import re

    df = entrymod.queries()["q45_event_asof_join"](spark, SF)
    plan = _plan(df)
    assert "Join" not in plan
    # exactly one exchange keyed on user_id ALONE (the window's); the
    # only other exchange is the right side's (user_id, ts) tie dedupe
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L, \d+\)", plan)) == 1
    assert plan.count("Arguments: hashpartitioning") == 2, plan


def test_contamination_bench_side_broadcasts(spark):
    """q43: the benchmark gram set must broadcast — the training-corpus
    side of the flagging join is never shuffled."""
    df = entrymod.queries()["q43_benchmark_contamination"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_has_no_shuffle(spark):
    """q51 is one narrow projection — counts and redaction fused, no
    self-join, no Exchange anywhere in the plan."""
    df = entrymod.queries()["q51_pii_redaction"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan


def test_sequence_packing_no_global_sort(spark):
    """q52's prefix sum must stay bucket-partitioned: per-bucket windows
    plus a broadcast bucket-prefix join — the only single-partition
    window allowed is the 64-row bucket-totals one (operating on the
    aggregate, not the corpus)."""
    df = entrymod.queries()["q52_sequence_packing"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # corpus-side window is hash-partitioned on bucket
    assert "hashpartitioning(bucket" in plan


def test_rollup_is_one_pass_expand(spark):
    """q57's ROLLUP must be a single aggregation pass over an Expand of
    the grouping sets — not three scans unioned."""
    df = entrymod.queries()["q57_revenue_rollup"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan
    # orders, customer, nation each scanned ONCE (formatted output lists
    # every scan twice: tree line + details block)
    assert plan.count("Scan parquet") <= 6


def test_cube_is_one_pass_expand(spark):
    """q60's CUBE: all four grouping sets from one Expand pass, each
    table scanned once (×2 lines in formatted output)."""
    df = entrymod.queries()["q60_segment_priority_cube"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("Scan parquet") <= 4


def test_interval_join_is_equi_join(spark):
    """q93's range join must plan as an EQUI-join on the interval
    bucket (hash/sort-merge/broadcast-hash), never the
    BroadcastNestedLoopJoin / CartesianProduct a raw BETWEEN theta
    join degenerates to."""
    df = entrymod.queries()["q93_interval_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The layout that amortizes the shuffle: two tables written
    bucketed (bucketBy 8) + sorted on the join key join with ZERO
    Exchange and ZERO extra Sort in the plan — at 100 TB this is the
    difference between re-shuffling both fact tables on every join and
    reading co-located buckets.  Results must equal the plain join."""
    o = entrymod._t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = entrymod._t(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # test tables are tiny — disable broadcast so the planner takes
        # the SortMergeJoin path the bucket layout exists to serve
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "bkt_orders"))
            .saveAsTable("bkt_orders")
        )
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "bkt_lineitem"))
            .saveAsTable("bkt_lineitem")
        )
        joined = (
            spark.table("bkt_orders")
            .join(
                spark.table("bkt_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(joined)
        # the join itself runs on co-located buckets: no shuffle
        # before the SortMergeJoin (the only exchange allowed is the
        # final groupBy's — and even that reuses the bucket hash here)
        assert "SortMergeJoin" in plan
        pre_join = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in pre_join
        expected = (
            o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        got = {(r["o_orderkey"], r["n"]) for r in joined.collect()}
        want = {(r["o_orderkey"], r["n"]) for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Partition pruning THROUGH a join: a fact table partitioned on the
    join key, joined to a small filtered dim, must carry a
    dynamicpruning subquery on the fact scan — at 100 TB this is what
    turns "scan every date partition" into "scan the three partitions
    the dim filter selects".  AQE + DPP are both on by default; the
    assertion reads the optimized plan text."""
    o = entrymod._t(spark, SF, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("yr").parquet(
        str(tmp_path / "fact_by_year")
    )
    fact = spark.read.parquet(str(tmp_path / "fact_by_year"))
    dim = spark.createDataFrame(
        [(1995, "mid-decade"), (1996, "mid-decade"), (2005, "unused")],
        "yr int, era string",
    ).filter(F.col("era") == "mid-decade")
    j = (
        fact.join(dim, "yr")
        .groupBy("era")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruned result equals the unpartitioned join
    got = {(r["era"], r["n"]) for r in j.collect()}
    want = {
        (r["era"], r["n"])
        for r in o.join(dim, "yr")
        .groupBy("era")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_leakage_split_is_single_projection_no_exchange(spark):
    df = entrymod.queries()["q150_leakage_safe_split"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "[codegen id :" in plan  # whole-stage codegen spans the scan


def test_weighted_sample_uses_window_group_limit(spark):
    df = entrymod.queries()["q142_weighted_sample"](spark, SF)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan  # rank filter pushed map-side


def test_cusum_windows_are_partitioned_no_global_sort(spark):
    df = entrymod.queries()["q151_cusum_drift"](spark, SF)
    plan = _plan(df)
    # every Sort in the plan is partition-local (window sorts), never a
    # global ordering
    for line in plan.splitlines():
        if "Sort [" in line and "Sort [" in line:
            assert "global=false" in line, line


def test_registered_domain_rule_join_broadcasts(spark):
    df = entrymod.queries()["q141_registered_domain"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # rule table never shuffles


def test_ams_f2_aggregates_partially(spark):
    df = entrymod.queries()["q156_ams_f2"](spark, SF)
    plan = _plan(df)
    # lane sums combine map-side before the exchange
    assert "partial_sum" in plan.lower()
    # 4 shuffles (lane pair + exact pair) + 1 broadcast, each rendered
    # twice by formatted explain
    assert plan.count("Exchange") <= 10


def test_semantic_dedup_seed_side_broadcasts(spark):
    df = entrymod.queries()["q148_semantic_dedup"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ntriples_is_narrow_zero_exchange(spark):
    df = entrymod.queries()["q166_ntriples"](spark, SF)
    plan = _plan(df)
    # pure per-row serialization over a union of scans: no shuffle at all
    assert "Exchange" not in plan
    assert "[codegen id :" in plan


def test_bgp_match_no_cartesian(spark):
    df = entrymod.queries()["q165_bgp_match"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bgp_optional_no_cartesian_left_join_survives(spark):
    df = entrymod.queries()["q170_bgp_optional"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftOuter" in plan  # the OPTIONAL really is a left join


def test_content_sniff_single_aggregation_exchange(spark):
    df = entrymod.queries()["q171_content_sniff"](spark, SF)
    plan = _plan(df)
    # narrow synth + sniff, then ONE hash-agg shuffle (rendered twice
    # by formatted explain)
    assert plan.count("Exchange") <= 2
    assert "partial_count" in plan.lower() or "partial_sum" in plan.lower()


def test_exact_auc_window_is_partition_local(spark):
    df = entrymod.queries()["q168_auc_eval"](spark, SF)
    plan = _plan(df)
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "global=false" in line, line


def test_shape_validation_broadcasts_shape_frame(spark):
    df = entrymod.queries()["q175_shape_validation"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_type_inference_broadcasts_ontology(spark):
    df = entrymod.queries()["q176_type_inference"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bgp_construct_no_cartesian(spark):
    df = entrymod.queries()["q182_bgp_construct"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bgp_values_is_broadcast_join(spark):
    df = entrymod.queries()["q180_bgp_values_filter"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bgp_aggregate_no_cartesian_partial_agg(spark):
    df = entrymod.queries()["q188_bgp_aggregate"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the GROUP BY really partial-aggregates before the shuffle
    assert "partial_count" in plan.lower() or "partial_min" in plan.lower()


def test_path_alt_inverse_no_cartesian(spark):
    df = entrymod.queries()["q187_path_alt_inverse"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dbscan_border_join_no_single_partition_window(spark):
    df = entrymod.queries()["q185_dbscan_clusters"](spark, SF)
    plan = _plan(df)
    # degree counting + CC + border joins: hash aggregates and equi
    # joins only — no window at all, so nothing can single-partition
    assert "SinglePartition" not in plan
