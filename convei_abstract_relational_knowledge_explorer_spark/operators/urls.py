"""URL canonicalization + canonical-URL dedup (Common-Crawl ingest idiom).

The reference keys documents by their source identifier as-is (WoS UT /
filename — wos_extract_relevant_abstracts.py:140-162); at Common-Crawl
scale the ingest key is a URL, and raw URLs over-count wildly: the same
page appears with mixed-case hosts, default ports, tracking params in
shuffled order, fragments, and trailing slashes.  Canonicalization is
therefore stage 0 of the KG pipeline's identity model (the `doc_id =
xxhash64(url)` contract in operators/extract.py assumes the url is
already canonical).

Everything here is a composition of JVM built-ins (regexp / split /
filter / array_sort / concat_ws) — whole-stage-codegen friendly, no
Python in the hot path, and each step has an exact ANSI-SQL twin so the
whole kernel is oracle-checkable (q42).

Canonical form (RFC 3986 normalization + the SURT-ish cleanups every
crawl pipeline applies):
  - scheme and host lowercased; a leading ``www.`` stripped
  - default ports stripped (``:80`` for http, ``:443`` for https)
  - the fragment dropped
  - tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
    the survivors sorted bytewise and re-joined
  - empty path → ``/``; trailing slashes trimmed from non-root paths
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url) -> Column:
    """Column expression: raw URL string → canonical URL string.

    Pure narrow transforms — no shuffle, no UDF.  NULL propagates.
    """
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, "^www\\.", ""), ":(80|443)$", ""
    )
    pathq = F.regexp_replace(rest, "^[^/?]+", "")
    raw_path = F.regexp_extract(pathq, "^([^?]*)", 1)
    trimmed = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.rlike("^(fbclid|gclid|ref)="),
        )
    )
    qcanon = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qcanon)


def url_duplicates(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL duplicate groups → (canonical_url, n_docs, keeper).

    The keeper is the smallest id in the group (the same min-keeper
    join-back shape as dedup.exact_duplicate_losers — no member arrays,
    so a canonical URL with 10^7 raw variants streams through partial
    aggregation).  Groups of one are filtered out: the output is the
    dedup worklist, not a full re-keying.
    """
    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        canonicalize_url(url_col).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | None = None,
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Crawl-snapshot delta → (key…, status ∈ added|removed|changed):
    full-outer join of two snapshots on the key, content compared by a
    null-sentinel md5 over ``hash_cols``; unchanged rows are dropped.

    The recrawl primitive: between two Common-Crawl-style snapshots of
    the same url space, downstream stages only need the DELTA (new
    pages to extract, vanished pages to tombstone, changed pages to
    re-extract) — the batch analog of the CDC changelog q99 applies,
    produced from full snapshots when no changelog exists.

    Content equality is md5 over hash_cols concatenated with a \\x1f
    separator and a per-column NULL sentinel (``\\x00∅``) — so NULL vs
    empty-string vs absent column all compare distinctly, and the
    comparison is one fixed-width digest per row rather than N wide
    column comparisons shuffled twice.

    Plan: both sides reduce to (key, digest) BEFORE the join (column
    pruning reaches the scans; the shuffle carries 2 columns however
    wide the snapshot is), then one full-outer sort-merge join on the
    key and a three-way CASE — linear, one shuffle per side, no
    windows.  Precondition: the key is unique within each snapshot
    (the crawl key is the url); duplicate keys multiply join rows —
    dedupe upstream (url_duplicates) rather than here, so the cost is
    paid once per snapshot, not once per diff.
    """
    key_cols = key_cols or ["url"]
    hash_cols = hash_cols or [
        c for c in old.columns if c not in key_cols
    ]
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00∅"))
                for c in hash_cols
            ],
        )
    )

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.select(*key_cols, digest.alias(f"_h_{name}"))

    o, n = side(old, "old"), side(new, "new")
    joined = o.join(n, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    delay_col: str | None = None,
    delay_ms: int = 1000,
    wave_ms: int = 60000,
) -> DataFrame:
    """Crawl-frontier politeness scheduler → (``url_col``, ``host_col``,
    fetch_rank, slot_ms, wave): per-host fetch order by (priority DESC,
    url ASC), each fetch offset ``(fetch_rank−1) · delay`` milliseconds
    from the host's first slot so a host is never hit faster than its
    crawl-delay, and ``wave = slot_ms DIV wave_ms`` buckets the frontier
    into dispatch rounds a fetch fleet drains one at a time.

    The Common-Crawl frontier-scheduling step between URL dedup (q42)
    and fetching: politeness is PER HOST, so the window partitions by
    host and parallelizes across the billions of hosts with no global
    sort anywhere — the one operator shape where a per-group
    `row_number` is exactly right (a host's frontier is bounded by its
    own page count, and a pathological mega-host is throttled by its
    own crawl-delay far below any reducer limit).  ``delay_col`` (e.g.
    parsed from robots.txt) overrides the constant ``delay_ms``;
    everything stays exact integer milliseconds.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    delay = F.col(delay_col) if delay_col else F.lit(delay_ms)
    return (
        frontier.select(
            url_col,
            host_col,
            priority_col,
            delay.cast("long").alias("_delay"),
        )
        .withColumn("fetch_rank", F.row_number().over(w).cast("long"))
        .select(
            url_col,
            host_col,
            "fetch_rank",
            ((F.col("fetch_rank") - 1) * F.col("_delay")).alias("slot_ms"),
            F.expr(f"((fetch_rank - 1) * _delay) DIV {wave_ms}")
            .cast("long")
            .alias("wave"),
        )
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 6,
) -> DataFrame:
    """Redirect-chain resolution by POINTER DOUBLING → one row per
    redirecting url: (node, terminal, hops, resolved).

    The crawl-ingest step between URL canonicalization (q42) and
    document identity: 3xx chains (and KG alias chains — ``sameAs``
    pointers) form a FUNCTIONAL graph (every node has at most one
    successor), and each source must resolve to its terminal target so
    all versions of a page share one doc_id.  The naive per-hop join
    needs one round per hop — a 64-hop chain is 64 shuffles; pointer
    doubling (the classic parallel list-ranking / path-halving trick,
    Wyllie '79) squares the reach every round: after r rounds every
    chain of length ≤ 2^r is resolved, so ``max_rounds`` shuffles cover
    chains of length ≤ ``2**max_rounds``.

    Per round, each pointer jumps to its pointer's pointer —
    ``ptr' = ptr(ptr(u))``, ``hops' = hops(u) + hops(ptr(u))`` — one
    self-equi-join on the (shrinking-lineage) pointer frame, hop counts
    stay EXACT chain distances.  ``localCheckpoint`` per round truncates
    lineage exactly as in :func:`~.components.connected_components`.

    A node is ``resolved`` when its final pointer is itself not a
    redirect source (a true terminal).  Redirect CYCLES (a→b→a — crawl
    traps) never reach a terminal: they are reported with
    ``terminal = NULL, hops = NULL, resolved = false`` rather than
    looping forever — the pointer a doubling round happens to land on
    inside a cycle is order-dependent, so no pointer value is emitted.

    If a source appears with several targets (corrupt logs), the
    bytewise-smallest target wins — deterministic, resume-stable.
    100 TB shape: every round is one equi-join + localCheckpoint on a
    frame no larger than the redirect table; no arrays, no windows, no
    driver state.
    """
    p = (
        redirects.groupBy(F.col(src_col).alias("node"))
        .agg(F.min(dst_col).alias("ptr"))
        .filter(F.col("node") != F.col("ptr"))
        .select("node", "ptr", F.lit(1).cast("long").alias("hops"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        q = p.select(
            F.col("node").alias("q_node"),
            F.col("ptr").alias("q_ptr"),
            F.col("hops").alias("q_hops"),
        )
        p = (
            p.join(q, p["ptr"] == q["q_node"], "left")
            .select(
                "node",
                F.coalesce("q_ptr", "ptr").alias("ptr"),
                (
                    F.col("hops") + F.coalesce("q_hops", F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    srcs = p.select(F.col("node").alias("s_node")).distinct()
    return (
        p.join(srcs, p["ptr"] == srcs["s_node"], "left")
        .select(
            "node",
            F.when(F.col("s_node").isNull(), F.col("ptr")).alias(
                "terminal"
            ),
            F.when(F.col("s_node").isNull(), F.col("hops")).alias("hops"),
            F.col("s_node").isNull().alias("resolved"),
        )
    )


def match_prefix_rules(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    url_col: str = "url",
    default_allow: bool = True,
) -> DataFrame:
    """Longest-prefix rule matching (the robots.txt / URL-policy idiom)
    → one row per url: (url, host, matched_prefix, rule_allow,
    allowed).

    ``rules`` is (host, prefix, allow) with ``prefix`` a '/'-rooted,
    SEGMENT-ALIGNED path prefix ('/a/b' matches '/a/b' and '/a/b/...',
    never '/a/bc'); at most one rule per (host, prefix).  The most
    specific (longest) matching rule decides; urls with no matching
    rule fall back to ``default_allow``.

    The distributed-trie idiom: instead of a rules⨯urls LIKE join
    (quadratic per host, unindexable), each url EXPLODES its own
    segment prefixes — '/a/b/c' → ['/a', '/a/b', '/a/b/c'], bounded by
    the url's own segment depth — and rule lookup becomes a plain
    (host, prefix) EQUI-join Catalyst can hash-partition.  A root rule
    '/' is matched via the empty cumulative prefix.  One window per url
    (longest prefix, bounded by segment depth) picks the winner.
    100 TB shape: explode fan-out ≤ path depth (crawl paths are <32
    segments), the join is equi-keyed on (host, prefix), and the rules
    side is typically broadcastable — no LIKE, no cross join.
    """
    parts = F.split(F.regexp_replace(F.col(path_col), "/+$", ""), "/")
    # parts[0] = '' for a '/'-rooted path; cumulative joins give
    # '' (root), '/a', '/a/b', ... — map '' to the root rule '/'.
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.when(i == 1, F.lit("/")).otherwise(
            F.array_join(F.slice(parts, 1, i), "/")
        ),
    )
    exploded = urls.select(
        url_col, host_col, path_col, F.explode(prefixes).alias("prefix")
    )
    matched = exploded.join(F.broadcast(rules), [host_col, "prefix"])
    w = Window.partitionBy(url_col).orderBy(F.length("prefix").desc())
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(url_col).alias("_m_url"),
            F.col("prefix").alias("matched_prefix"),
            F.col("allow").cast("boolean").alias("rule_allow"),
        )
    )
    return (
        urls.join(best, urls[url_col] == best["_m_url"], "left")
        .select(
            url_col,
            host_col,
            "matched_prefix",
            "rule_allow",
            F.coalesce("rule_allow", F.lit(default_allow)).alias(
                "allowed"
            ),
        )
    )


def host_of(url) -> Column:
    """Column expression: URL string → canonical host (lowercase,
    ``www.`` and default ports stripped) — the grouping key of every
    host-level crawl product.  Pure narrow regexps, NULL propagates."""
    u = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, "^www\\.", ""), ":(80|443)$", ""
    )


def anchor_entity_names(
    links: DataFrame,
    pages: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
    page_url_col: str = "url",
) -> DataFrame:
    """Anchor-text entity naming + dead-link audit → one row per
    canonical link target: (canonical_url, n_links, n_src_hosts,
    top_anchor, top_anchor_links, is_dead).

    The web-KG naming signal: what OTHER pages call a URL is the best
    surface form for the entity behind it (the classic anchor-text
    prior of web IR / entity linking), and the aggregation is exactly
    a majority vote over in-link anchors — ``top_anchor`` is the
    anchor with the most links (count desc, then bytewise-smallest for
    the deterministic tie), ``n_src_hosts`` measures naming consensus
    breadth, and ``is_dead`` marks targets absent from the crawled
    page set (link-rot audit).

    Plan shape — everything keyed on the canonical target, one shuffle
    family: per-(target, anchor) counts first (Zipf-safe: downstream
    rows are per-DISTINCT-anchor, never per-link), one window argmax
    over targets, one distinct-host count, and the dead flag is a
    left join against the distinct canonical page set.  A head target
    with 10^8 in-links occupies one row per distinct anchor after the
    first partial-aggregated groupBy — no per-link rows survive the
    map side.
    """
    e = links.select(
        host_of(src_col).alias("src_host"),
        canonicalize_url(dst_col).alias("canonical_url"),
        F.col(anchor_col).alias("anchor"),
    ).filter(F.col("canonical_url").isNotNull())
    per_anchor = e.groupBy("canonical_url", "anchor").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc("n"), F.asc("anchor")
    )
    top = (
        per_anchor.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "canonical_url",
            F.col("anchor").alias("top_anchor"),
            F.col("n").alias("top_anchor_links"),
        )
    )
    totals = e.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("src_host").cast("long").alias("n_src_hosts"),
    )
    crawled = (
        pages.select(canonicalize_url(page_url_col).alias("canonical_url"))
        .filter(F.col("canonical_url").isNotNull())
        .distinct()
        .withColumn("_crawled", F.lit(True))
    )
    return (
        totals.join(top, "canonical_url")
        .join(crawled, "canonical_url", "left")
        .select(
            "canonical_url",
            "n_links",
            "n_src_hosts",
            "top_anchor",
            "top_anchor_links",
            F.col("_crawled").isNull().alias("is_dead"),
        )
    )


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Page-level links → the HOST-level web graph: (src_host,
    dst_host, weight, n_src_pages, reciprocal) with intra-host edges
    dropped.

    The Common-Crawl host-graph rollup (the published webgraph
    product): ``weight`` counts page-level links between the host
    pair, ``n_src_pages`` counts distinct linking pages (weight
    inflation guard — one hub page emitting 10^4 copies of a link
    still counts once here), and ``reciprocal`` marks pairs linked in
    both directions (the standard spam/nepotism signal).

    Plan shape: host extraction is narrow regexp work; ONE groupBy on
    the (src_host, dst_host) pair does both aggregates with map-side
    partials; reciprocity is a self left-semi-style join of the
    aggregated host pairs (|host pairs| ≪ |links|) against their own
    reversal — never a page-level self-join.
    """
    e = (
        links.select(
            host_of(src_col).alias("src_host"),
            host_of(dst_col).alias("dst_host"),
            F.col(src_col).alias("_src_page"),
        )
        .filter(
            F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host"))
        )
    )
    agg = e.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("weight"),
        F.countDistinct("_src_page").cast("long").alias("n_src_pages"),
    )
    rev = agg.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(True).alias("_rev"),
    )
    return agg.join(rev, ["src_host", "dst_host"], "left").select(
        "src_host",
        "dst_host",
        "weight",
        "n_src_pages",
        F.coalesce("_rev", F.lit(False)).alias("reciprocal"),
    )


def registered_domain(
    hosts: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
) -> DataFrame:
    """Public-suffix (eTLD+1) resolution → one row per input host:
    (host, rule, rule_kind, public_suffix, registered_domain).

    Implements the publicsuffix.org algorithm — THE host-grouping
    contract of every crawl product: ``site`` means registered domain
    (``bbc.co.uk``), never raw host (``news.bbc.co.uk``) and never bare
    TLD, and getting it right requires the rule list's three kinds:
    plain suffixes (``co.uk``), wildcards (``*.ck`` — every label under
    ck is itself a public suffix) and exceptions (``!www.ck`` — carved
    back out of a wildcard).  Matching picks the exception if any, else
    the rule with the most labels; no match falls back to the implicit
    ``*`` rule (the TLD itself is the suffix).  ``registered_domain``
    is the public suffix plus one host label, NULL when the host IS a
    public suffix.

    Spark shape — the same distributed-trie explode as
    :func:`match_prefix_rules`, on suffixes instead of prefixes: each
    host emits its own dot-boundary suffixes (bounded by label count,
    never a LIKE scan), rule lookup is one broadcast equi-join on the
    suffix string (a wildcard rule keyed by its tail matches any
    strictly-longer suffix, checked with the exploded position), one
    per-host window picks the winner, and both output strings are
    label-array slices — no second pass over the rule list.  The rule
    table is ~10k rows in the wild: always broadcast.
    """
    lab = F.split(F.col(host_col), "\\.")
    cand = (
        hosts.select(
            F.col(host_col).alias("host"),
            lab.alias("_lab"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(split({host_col},"
                    f" '\\\\.'))), i -> array_join(slice(split({host_col},"
                    f" '\\\\.'), i, 1000), '.'))"
                )
            ).alias("_pos", "_suffix"),
        )
    )
    r = rules.select(
        F.col(rule_col).alias("rule"),
        F.when(F.col(rule_col).startswith("!"), F.lit("exception"))
        .when(F.col(rule_col).startswith("*."), F.lit("wildcard"))
        .otherwise(F.lit("plain"))
        .alias("rule_kind"),
        F.regexp_replace(rule_col, "^(!|\\*\\.)", "").alias("_key"),
    ).withColumn(
        # labels of the EFFECTIVE public suffix this rule asserts
        "_eff",
        F.size(F.split("_key", "\\."))
        + F.when(F.col("rule_kind") == "wildcard", F.lit(1))
        .when(F.col("rule_kind") == "exception", F.lit(-1))
        .otherwise(F.lit(0)),
    )
    hits = cand.join(
        F.broadcast(r), cand["_suffix"] == r["_key"], "inner"
    ).filter(
        # a wildcard's tail must sit strictly below at least one more
        # host label (the '*' has to bind to something)
        (F.col("rule_kind") != "wildcard") | (F.col("_pos") > 0)
    )
    w = Window.partitionBy("host").orderBy(
        F.desc(F.col("rule_kind") == "exception"),
        F.desc("_eff"),
        F.asc("rule"),
    )
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("host", "rule", "rule_kind", "_eff")
    )
    n = F.size("_lab")
    resolved = (
        hosts.select(F.col(host_col).alias("host"), lab.alias("_lab"))
        .join(best, "host", "left")
        .select(
            "host",
            F.coalesce("rule", F.lit("*")).alias("rule"),
            F.coalesce("rule_kind", F.lit("default")).alias("rule_kind"),
            F.coalesce("_eff", F.lit(1)).alias("_eff"),
            "_lab",
        )
    )
    return resolved.select(
        "host",
        "rule",
        "rule_kind",
        F.when(
            n >= F.col("_eff"),
            F.array_join(
                F.slice(
                    "_lab", n - F.col("_eff") + 1, F.col("_eff")
                ),
                ".",
            ),
        ).alias("public_suffix"),
        F.when(
            n > F.col("_eff"),
            F.array_join(
                F.slice("_lab", n - F.col("_eff"), F.col("_eff") + 1),
                ".",
            ),
        ).alias("registered_domain"),
    )
