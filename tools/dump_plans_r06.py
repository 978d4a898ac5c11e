"""Dump .explain("formatted") for the r6-touched queries.

Usage: python tools/dump_plans_r06.py <tag> <outdir>
Run once from the round-start worktree (tag=before) and once from the
current tree (tag=after); the judge checks plan claims against these.
"""

from __future__ import annotations

import os
import sys

TOUCHED = [
    # direct query-body or operator rewrites
    "q186_order_chain_closure",
    "q185_dbscan_clusters",
    "q104_entity_alignment",
    "q26b_knn_components_exact",
    "q26_knn_components",
    "q22_embedding_top20",
    "q27_media_features",
    "q190_ndcg_retrieval",
    # louvain / refinement family
    "q38_topic_communities",
    "q184_louvain_communities",
    "q189_leiden_refined",
    # pagerank family
    "q44_token_pagerank",
    "q71_personalized_pagerank",
    # iterative loop fusions
    "q47_bfs_distances",
    "q62_token_scc",
    "q65_random_walks",
    "q192_node2vec_walks",
    "q73_bpe_merges",
    "q74_token_hits",
    "q75_weighted_sssp",
    "q48_token_kcore",
    "q70_token_ktruss",
    "q81_token_msf",
    "q100_single_linkage_noise",
    "q105_type_propagation",
    "q127_temporal_reachability",
    "q129_redirect_resolution",
    "q131_merge_mis",
    "q135_topo_layers",
    "q137_stress_centrality",
    "q143_greedy_matching",
    "q161_double_sweep",
    "q164_cluster_metrics",
    "q158_consensus_clusters",
    "q167_sameas_canonical",
    "q69_incremental_components",
    # kg-triple store materialization
    "q111_path_rules",
    "q175_shape_validation",
    "q188_bgp_aggregate",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from convei_abstract_relational_knowledge_explorer_spark.session import (
        get_spark,
    )

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"plans-{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    qs = entrymod.queries()
    for name in TOUCHED:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name} (absent)")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
