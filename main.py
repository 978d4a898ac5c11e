"""spark-submit entry point for the KG construction pipeline.

Cluster launch (the north_rule's deployment shape):

    python tools/package.py                      # build dist/convei_kg.zip
    spark-submit --py-files dist/convei_kg.zip \
        main.py --input /path/to/web_pages --output /path/to/graph

Sandbox smoke (local mode, synthetic corpus):

    python main.py --n-docs 10000 --output /tmp/graph
"""

from __future__ import annotations

import argparse
import json


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="CONVEI KG construction pipeline")
    p.add_argument("--input", default=None,
                   help="web_pages table path (parquet/Iceberg); omit to "
                        "generate the synthetic corpus")
    p.add_argument("--n-docs", type=int, default=10_000,
                   help="synthetic corpus size when --input is omitted")
    p.add_argument("--output", required=True, help="graph output directory")
    p.add_argument("--lang", default=None, help="optional language filter")
    p.add_argument("--no-topics", action="store_true")
    return p.parse_args()


def main() -> None:
    args = parse_args()

    # import inside main so --py-files distribution resolves the package
    from convei_abstract_relational_knowledge_explorer_spark.plans.pipeline import (
        build_graph,
    )
    from convei_abstract_relational_knowledge_explorer_spark.session import (
        get_spark,
    )
    from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
        web_pages,
    )

    spark = get_spark(app_name="convei-kg-pipeline")
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = web_pages(spark, args.n_docs)
    if args.lang:
        pages = pages.filter(pages.lang == args.lang)

    tables = build_graph(
        spark, pages, args.output, with_topics=not args.no_topics
    )
    summary = {name: df.count() for name, df in tables.items()}
    print(json.dumps({"output": args.output, "rows": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
