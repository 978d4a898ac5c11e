"""Report surface — the reference's CSV/JSONL outputs, Spark-side.

Reproduces the report families of SURVEY.md §2 A10/A11/D9/D10/E5 over the
materialized KG tables:

  satellite_pair_matrix   upper-triangular co-occurrence matrix CSV
      (/root/reference/analyze_satellites_used_together.py:77-95)
  mentions_per_year       per-(year, entity) counts + first/last year
      (/root/reference/build_reports.py:199-258)
  entities_per_doc_stats  mean/median entities-per-doc by year
      (/root/reference/build_reports.py:264-293)
  top_entities_per_year   rank-within-year (most_common analog)
      (/root/reference/build_reports.py:296-305)
  topics_jsonl            explorer feed rows
      (/root/reference/explorer.html:862; topic summaries
       /root/reference/topic_analysis.py:246-257)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..operators.analytics import top_k_per_group
from ..operators.skew import salted_cooccurrence


def satellite_pair_matrix(triples: DataFrame, n_salts: int = 16) -> DataFrame:
    """Upper-triangular pair counts for MENTIONS_SATELLITE edges, wide form.

    The reference writes a labels × labels matrix with blanks under the
    diagonal; the Spark form is the tidy pair table plus a pivot — the
    pivot column set (satellite names) is small and bounded.

    Uses the skew-salted co-occurrence: head pairs like (Landsat, Landsat)
    or (US, US) cover a large share of all docs, so the per-pair distinct
    count runs two-phase over ``n_salts`` reducers instead of pinning one.
    """
    sats = triples.filter(F.col("pred") == "MENTIONS_SATELLITE").select(
        "doc_id", "obj"
    )
    pairs = salted_cooccurrence(sats, "doc_id", "obj", n_salts=n_salts)
    return (
        pairs.groupBy("ea")
        .pivot("eb")
        .agg(F.first("n_docs"))
        .withColumnRenamed("ea", "satellite")
    )


def mentions_per_year(triples: DataFrame, pred: str) -> DataFrame:
    """(entity, year, n_docs) + per-entity first/last year (D9)."""
    base = triples.filter(F.col("pred") == pred)
    per_year = base.groupBy("obj", "year").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    span = base.groupBy("obj").agg(
        F.min("year").alias("first_year"), F.max("year").alias("last_year")
    )
    return per_year.join(span, "obj").select(
        F.col("obj").alias("entity"), "year", "n_docs", "first_year", "last_year"
    )


def entities_per_doc_stats(triples: DataFrame, pred: str) -> DataFrame:
    """mean/median entities-per-doc by year (D10)."""
    per_doc = (
        triples.filter(F.col("pred") == pred)
        .groupBy("doc_id", "year")
        .agg(F.countDistinct("obj").alias("n_entities"))
    )
    return per_doc.groupBy("year").agg(
        F.round(F.avg("n_entities"), 6).alias("mean_entities"),
        F.expr("percentile(n_entities, 0.5)").alias("median_entities"),
        F.count("*").alias("n_docs"),
    )


def top_entities_per_year(triples: DataFrame, pred: str, k: int = 10) -> DataFrame:
    """Rank entities within each year by distinct-doc count (E5)."""
    counts = (
        triples.filter(F.col("pred") == pred)
        .groupBy("year", "obj")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    return top_k_per_group(counts, ["year"], "n_docs", k, "obj").select(
        "year", F.col("obj").alias("entity"), "n_docs", "rank"
    )


def topics_jsonl(triples: DataFrame, nodes: DataFrame, k_examples: int = 5) -> DataFrame:
    """Explorer feed: one row per canonical topic with size + sample docs."""
    topic_nodes = nodes.filter(F.col("entity_type") == "HAS_TOPIC").select(
        F.col("name").alias("obj"), "canonical_id"
    )
    topic_edges = (
        triples.filter(F.col("pred") == "HAS_TOPIC")
        .join(topic_nodes, "obj")
    )
    sizes = topic_edges.groupBy("canonical_id").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sort_array(F.collect_set("obj")).alias("surface_forms"),
    )
    w = Window.partitionBy("canonical_id").orderBy("subj")
    examples = (
        topic_edges.select("canonical_id", "subj")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_examples)
        .groupBy("canonical_id")
        .agg(F.sort_array(F.collect_list("subj")).alias("example_urls"))
    )
    return sizes.join(examples, "canonical_id").select(
        "canonical_id",
        F.element_at("surface_forms", 1).alias("topic"),
        "n_docs",
        "surface_forms",
        "example_urls",
    )


def annual_stacked_cumulative(
    counts: DataFrame,
    entity_col: str = "entity",
    year_col: str = "year",
    n_col: str = "n",
    top_n: int = 10,
) -> DataFrame:
    """The data table behind the reference's stacked-annual + cumulative
    figure (/root/reference/plot_publication_geography_figures.py:236-292):
    top-N entities by all-time total keep their own series, the tail
    collapses to 'Other', and every year carries its annual total plus the
    running cumulative total (I7).

    Input: tidy (entity, year, n).  The global cumulative window runs over
    the per-YEAR table — a bounded, report-sized domain — so the single
    partition it implies is a few hundred rows, not a scale hazard.
    """
    totals = counts.groupBy(entity_col).agg(F.sum(n_col).alias("total"))
    top = (
        totals.orderBy(F.desc("total"), F.asc(entity_col))
        .limit(top_n)
        .select(entity_col)
        .withColumn("_top", F.lit(1))
    )
    series = F.when(F.col("_top") == 1, F.col(entity_col)).otherwise(
        F.lit("Other")
    )
    per = (
        counts.join(F.broadcast(top), entity_col, "left")
        .select(
            F.col(year_col).alias("year"),
            series.alias("series"),
            F.col(n_col).alias("n"),
        )
        .groupBy("year", "series")
        .agg(F.sum("n").alias("n"))
    )
    annual = per.groupBy("year").agg(F.sum("n").alias("annual_total"))
    wc = Window.orderBy("year").rowsBetween(Window.unboundedPreceding, 0)
    annual = annual.withColumn(
        "cumulative_total", F.sum("annual_total").over(wc)
    )
    return per.join(annual, "year")


def totals_with_share(
    counts: DataFrame, entity_col: str = "entity", n_col: str = "n"
) -> DataFrame:
    """Per-entity totals with percentage share of the grand total — the
    bar-label table of the reference's per-country figure
    (/root/reference/plot_publication_geography_figures.py:330-345)."""
    totals = counts.groupBy(entity_col).agg(F.sum(n_col).alias("total"))
    grand = Window.partitionBy()  # report-sized table; single window is fine
    return totals.select(
        entity_col,
        "total",
        F.round(
            F.col("total") * 100.0 / F.sum("total").over(grand), 6
        ).alias("share_pct"),
    )


def explorer_feed(
    triples: DataFrame,
    nodes: DataFrame,
    docs: DataFrame,
    k_keywords: int = 15,
    k_examples: int = 5,
) -> DataFrame:
    """The reference-shaped ``topics.jsonl`` explorer feed
    (/root/reference/topic_analysis.py:229-257; consumed by
    /root/reference/explorer.html:1399): one row per canonical topic with
    ``(topic_id, size, keywords, representatives)`` — keywords by per-
    cluster TF-IDF (J9), representatives the first ``k_examples`` member
    docs (deterministic doc_id order; the reference samples
    representatives from the cluster).
    """
    from ..operators.ml import cluster_top_terms

    topic_nodes = nodes.filter(F.col("entity_type") == "HAS_TOPIC").select(
        F.col("name").alias("obj"), "canonical_id"
    )
    edges = (
        triples.filter(F.col("pred") == "HAS_TOPIC")
        .join(topic_nodes, "obj")
        .select("canonical_id", "doc_id")
        .distinct()
    )
    sizes = edges.groupBy("canonical_id").agg(F.count("*").alias("size"))

    member_docs = edges.join(
        docs.select("doc_id", "text", "year", "url"), "doc_id"
    )
    kw = cluster_top_terms(
        member_docs.select(F.col("canonical_id").alias("cluster"), "text"),
        k=k_keywords,
    )
    keywords = kw.groupBy("cluster").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rank", "token"))),
            lambda s: s["token"],
        ).alias("keywords")
    )

    w = Window.partitionBy("canonical_id").orderBy("doc_id")
    reps = (
        member_docs.select("canonical_id", "doc_id", "year", "url")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_examples)
        .groupBy("canonical_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "doc_id", "year", "url"))
                ),
                lambda s: F.struct(
                    s["doc_id"].alias("id"),
                    s["year"].alias("year"),
                    s["url"].alias("title"),
                ),
            ).alias("representatives")
        )
    )
    return (
        sizes.join(keywords, sizes.canonical_id == keywords.cluster, "left")
        .join(reps, "canonical_id")
        .select(
            F.col("canonical_id").alias("topic_id"),
            "size",
            F.coalesce("keywords", F.array().cast("array<string>")).alias(
                "keywords"
            ),
            "representatives",
        )
    )


_EXPLORER_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Topic explorer</title>
<style>
 body {{ font: 14px system-ui, sans-serif; margin: 2rem; color: #222; }}
 input {{ font: inherit; padding: .4rem; width: 20rem; margin-bottom: 1rem; }}
 table {{ border-collapse: collapse; width: 100%; }}
 th, td {{ text-align: left; padding: .35rem .6rem;
           border-bottom: 1px solid #ddd; vertical-align: top; }}
 th {{ cursor: pointer; background: #f5f5f5; }}
 .kw {{ color: #555; }} .rep {{ color: #777; font-size: 12px; }}
</style></head><body>
<h1>Topic explorer</h1>
<input id="q" placeholder="Search keywords…" autocomplete="off">
<table id="t"><thead><tr>
 <th data-k="topic_id">topic</th><th data-k="size">size</th>
 <th>keywords</th><th>representatives</th>
</tr></thead><tbody></tbody></table>
<script>
const DATA = [
{rows}
];
let sortKey = "size", dir = -1;
const tb = document.querySelector("#t tbody");
const render = () => {{
  const q = document.querySelector("#q").value.toLowerCase();
  const rows = DATA
    .filter(r => !q || r.keywords.join(" ").toLowerCase().includes(q))
    .sort((a, b) => (a[sortKey] > b[sortKey] ? 1 : -1) * dir);
  const esc = s => String(s).replace(/[&<>"]/g,
      c => ({{"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}})[c]);
  tb.innerHTML = rows.map(r =>
    `<tr><td>${{esc(r.topic_id)}}</td><td>${{r.size}}</td>` +
    `<td class="kw">${{esc(r.keywords.join(", "))}}</td>` +
    `<td class="rep">${{r.representatives.map(
        x => `${{esc(x.id)}} (${{esc(x.year)}}) ${{esc(x.title)}}`).join("<br>")}}</td></tr>`
  ).join("");
}};
document.querySelector("#q").addEventListener("input", render);
document.querySelectorAll("th[data-k]").forEach(th =>
  th.addEventListener("click", () => {{
    sortKey = th.dataset.k; dir = -dir; render();
  }}));
render();
</script></body></html>
"""


def write_explorer_html(feed: DataFrame, path: str) -> None:
    """Static single-file viewer over :func:`explorer_feed` — the Spark
    twin of the reference's ``explorer.html`` (searchable, sortable,
    self-contained; written from scratch, data embedded as JSON rows the
    way the reference embeds its JSONL feed).  Driver-side render of a
    report-sized table (the feed is one row per canonical topic)."""
    import json

    rows = [
        json.dumps(
            {
                "topic_id": r["topic_id"],
                "size": r["size"],
                "keywords": list(r["keywords"]),
                "representatives": [
                    {"id": x["id"], "year": x["year"], "title": x["title"]}
                    for x in r["representatives"]
                ],
            },
            ensure_ascii=False,
        )
        for r in feed.collect()
    ]
    # '<' must not appear raw inside the <script> block: a keyword
    # containing '</script>' would terminate it (json.dumps leaves '/'
    # and '<' unescaped)
    html = _EXPLORER_TEMPLATE.format(
        rows=",\n".join(rows).replace("<", "\\u003c")
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
