"""Web-corpus preparation: HTML→text extraction and URL-level
filtering — the tier between WARC ingestion (llm/io.py read_warc) and
the documents pipeline (clean → dedup → pack).

Everything here is JVM-side expression work (regexp chains, parse_url,
broadcast joins) — no Python in the hot path. A production extractor
with DOM-aware boilerplate removal (trafilatura/jusText class) would
slot in as a mapInPandas pass per the model-scoring hook pattern
(llm/scoring.py); `html_to_text` is the dependency-free baseline that
handles the bulk signal (tags, scripts, entities) and is what C4's own
pipeline-scale extraction amounted to.

No reference counterpart (pipit reads traces, not web crawls); extends
SURVEY.md §7 step 9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# entity → replacement (the handful that dominate real HTML; numeric
# entities are handled separately below). ``&amp;`` MUST decode LAST:
# decoding it first would turn escaped entities like ``&amp;lt;`` into
# ``&lt;`` and then into a literal ``<`` the source page never
# displayed (double-decoding).
_ENTITIES = {
    "&nbsp;": " ",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&amp;": "&",
}


def html_to_text_expr(col: Column) -> Column:
    """HTML→plain-text as a pure expression chain (whole-stage codegen,
    no UDF): drop <script>/<style>/<head> subtrees and comments, break
    block-level boundaries into newlines, strip remaining tags, decode
    the dominant entities, collapse whitespace. ``(?is)`` = DOTALL +
    case-insensitive, so multi-line subtrees go in one pass."""
    t = col
    # un-renderable subtrees out first, so their contents never leak
    t = F.regexp_replace(
        t, r"(?is)<(script|style|head|noscript|template)\b[^>]*>.*?</\1\s*>", " "
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block boundaries → newline (so paragraphs survive tag stripping)
    t = F.regexp_replace(
        t,
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
        r"header|footer|blockquote)\b[^>]*/?>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES.items():
        t = F.regexp_replace(t, ent, rep)
    # numeric entities: decimal &#NNNN; via chr() would need a UDF —
    # the common printable-ASCII range is handled, the rest dropped
    t = F.regexp_replace(t, r"&#\d+;", " ")
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # Spark's trim strips spaces only — boundary newlines need the regex
    return F.regexp_replace(F.trim(t), r"^\n+|\n+$", "")


def warc_to_documents(warc: DataFrame) -> DataFrame:
    """The read_warc → documents bridge: keep HTTP-200 ``text/html``
    captures, extract text JVM-side, emit the canonical documents shape
    (doc_id from the record id hash — stable across re-reads, unlike
    monotonically_increasing_id). One narrow pass, no shuffle."""
    html = warc.filter(
        (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    )
    return html.select(
        F.xxhash64("record_id").alias("doc_id"),
        html_to_text_expr(
            F.decode(F.col("payload"), "UTF-8")
        ).alias("text"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL decomposition via the built-in ``parse_url`` (JVM, no UDF):
    host, registrable-ish domain (last two labels — a public-suffix
    list lookup is a broadcast-join away when exactness matters), path
    depth, and query presence — the features URL-quality filters
    (RefinedWeb/C4 style) cut on."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    return df.withColumns(
        {
            "url_host": host,
            "url_domain": F.regexp_extract(
                host, r"([^.]+\.[^.]+)$", 1
            ),
            "url_path_depth": F.size(
                F.filter(
                    F.split(F.coalesce(path, F.lit("")), "/"),
                    lambda s: F.length(s) > 0,
                )
            ),
            "url_has_query": F.parse_url(
                F.col(url_col), F.lit("QUERY")
            ).isNotNull(),
        }
    )


def filter_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Domain-list filtering: drop (``mode="block"``) or keep
    (``mode="allow"``) rows whose registrable domain appears in the
    list. The list rides a broadcast semi/anti join — blocklists are
    millions of rows at most (UT1/adult ≈ 4M), far under broadcast
    thresholds at realistic executor memory, so the corpus never
    shuffles. ``blocklist`` needs one column ``domain``."""
    if mode not in ("block", "allow"):
        raise ValueError(f"unknown mode: {mode!r}")
    # internal join key, NOT the public url_domain name — a caller who
    # already ran url_features keeps their columns intact
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    keyed = df.withColumn(
        "__fd_domain", F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    )
    joined = keyed.join(
        F.broadcast(
            blocklist.select(F.lower("domain").alias("__fd_domain"))
        ),
        "__fd_domain",
        "left_anti" if mode == "block" else "left_semi",
    )
    return joined.drop("__fd_domain")


def dedup_urls(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
) -> DataFrame:
    """Keep the LATEST capture per URL — the first dedup a multi-crawl
    corpus needs (the same page is re-captured every crawl; training on
    every capture over-weights stable pages and mixes stale content
    with its own update). One ``max_by`` hash aggregation keyed on the
    URL: a hot URL's captures combine map-side (the skew-safe keep-one
    shape, not a window), with ``(date, record_id)`` as the
    deterministic recency order (ISO-8601 dates compare correctly as
    strings; record_id breaks same-second ties).

    Rows with a NULL url (WARC-Target-URI is optional per the WARC
    spec, and the parser emits None for missing headers) are NOT
    captures of one shared page — they pass through unchanged rather
    than collapsing into a single keep-one group.  With a record_id
    column this stays ONE scan + one exchange: each NULL-url row
    groups under its own synthetic key (a \\x00-prefixed record_id —
    no real URL starts with NUL) and max_by returns the row itself.
    Without record_id there is no per-row key to synthesize, so the
    input splits into two filtered scans and unions back."""
    cols = df.columns
    order = (
        F.struct(F.col(date_col), F.col("record_id"))
        if "record_id" in cols
        else F.col(date_col)
    )

    def keep_one(frame, key):
        return (
            frame.groupBy(key.alias("__u"))
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols]), order
                ).alias("__r")
            )
            .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
        )

    if "record_id" in cols:
        # WARC-Record-ID is mandatory per ISO 28500, so record_id is
        # non-null whenever the column exists; the inner coalesce just
        # keeps a malformed row from producing a NULL group key
        key = F.coalesce(
            F.col(url_col),
            F.concat(F.lit("\x00"), F.coalesce(F.col("record_id"), F.lit(""))),
        )
        return keep_one(df, key)
    deduped = keep_one(df.filter(F.col(url_col).isNotNull()), F.col(url_col))
    return deduped.unionByName(df.filter(F.col(url_col).isNull()))


def has_noindex_expr(html_col: Column) -> Column:
    """True when the page opts out of indexing via
    ``<meta name="robots" content="...noindex...">`` — the crawl-etiquette
    filter a responsible corpus builder applies before training on a
    capture. Pure regexp (codegen); attribute order within the tag is
    handled both ways."""
    pat_fwd = (
        r"""(?is)<meta[^>]+name\s*=\s*["']?robots["']?[^>]*"""
        r"""content\s*=\s*["'][^"'>]*noindex"""
    )
    pat_rev = (
        r"""(?is)<meta[^>]+content\s*=\s*["'][^"'>]*noindex[^>]*"""
        r"""name\s*=\s*["']?robots["']?"""
    )
    return (F.regexp_count(html_col, F.lit(pat_fwd)) > 0) | (
        F.regexp_count(html_col, F.lit(pat_rev)) > 0
    )


def extract_links_expr(html_col: Column) -> Column:
    """All ``href`` targets in the page as an ``array<string>`` — one
    ``regexp_extract_all`` (JVM, codegen), no DOM parse. Quoted and
    bare attribute forms both match; fragments/whitespace terminate a
    bare value. Relative links come out as written — resolution
    against the page URL is the caller's concern (``link_graph`` keeps
    absolute http(s) targets only, which is what a cross-DOMAIN graph
    needs anyway: a relative link can never leave the host)."""
    return F.regexp_extract_all(
        html_col,
        F.lit(r"""(?i)href\s*=\s*(?:["']([^"'<>]+)["']|([^\s"'<>`]+))"""),
        1,
    )


def link_graph(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Distinct (src_domain, dst_domain) edges from page captures —
    the input to ``domain_pagerank``. One narrow pass: extract hrefs
    (expression, above), explode, keep absolute http(s) targets,
    reduce both endpoints to registrable-ish domains (same last-two-
    label rule as ``url_features``), drop intra-domain self-loops, and
    dedup. The explode multiplies rows ~50× (links/page) but carries
    only two short strings — the page body never rides the exchange;
    the only shuffle is the final distinct, whose map-side partial
    aggregation absorbs repeated edges first."""
    dom = lambda c: F.regexp_extract(  # noqa: E731
        F.lower(F.parse_url(c, F.lit("HOST"))), r"([^.]+\.[^.]+)$", 1
    )
    links = df.select(
        dom(F.col(url_col)).alias("src"),
        F.explode(extract_links_expr(F.col(html_col))).alias("href"),
    )
    return (
        links.filter(F.col("href").rlike(r"(?i)^https?://"))
        .select("src", dom(F.col("href")).alias("dst"))
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )


def domain_pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    persist_edges: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a domain link graph — the crawl-
    priority / quality prior Common-Crawl-scale curation ranks hosts
    by (cf. the CC host-level ranking releases; no reference
    counterpart, pipit reads traces).

    ALL arithmetic is BIGINT: ranks live in integer units of
    ``1/scale``, each out-edge carries ``rank div out_degree``, and the
    damped update is ``(100-damping_pct)·scale div (100·n) +
    damping_pct·Σcontrib div 100``. Integer sums are associative, so
    the result is BIT-IDENTICAL across engines, partition counts, and
    aggregation orders — float PageRank would differ in the last ulp
    per partitioning (same lesson as the r01-r03 AVG gates). Dangling
    mass (domains with no out-links) is dropped, not redistributed —
    ranks sum to < scale; fine for ordering, documented for parity.

    Scale shape: the edge table (the 100-TB side) is shuffled ONCE
    onto its out-degree key and persisted; each iteration then joins
    the domain-sized rank table to it and reduces contributions by
    ``dst`` — per iteration, one shuffle of the rank table + one of
    the (dst, contrib) stream, never the raw edges again. ``n`` rides
    a 1-row broadcast."""
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).distinct()
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    ed = e.join(deg, "__src")  # same key as the distinct — no extra exchange
    if persist_edges:
        ed = ed.persist()
    nodes = (
        e.select(F.col("__src").alias("domain"))
        .union(e.select("__dst"))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = F.expr(
        f"CAST({(100 - damping_pct) * scale} AS BIGINT) div (100 * __n)"
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "domain", F.expr(f"CAST({scale} AS BIGINT) div __n").alias("rank")
    )
    for _ in range(iterations):
        contrib = ranks.join(
            ed, ranks["domain"] == ed["__src"]
        ).select(
            F.col("__dst").alias("domain"),
            F.expr("rank div __deg").alias("__c"),
        )
        sums = contrib.groupBy("domain").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, "domain", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "domain",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * coalesce(__s, CAST(0 AS BIGINT)))"
                        " div 100"
                    )
                ).alias("rank"),
            )
        )
    return ranks


def oracle_pagerank_sql(
    edges_cte: str,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> str:
    """DuckDB replay of ``domain_pagerank`` with the iterations
    UNROLLED as CTE pairs (DuckDB restricts aggregates over a
    recursive table). ``edges_cte`` must define ``edges(src, dst)``
    (already distinct). Same integer-unit arithmetic — ``//`` and
    ``div`` agree on non-negative BIGINTs — so the driver's exact hash
    holds."""
    parts = [
        f"WITH {edges_cte}",
        ", deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1)",
        ", nodes AS (SELECT src AS domain FROM edges"
        "  UNION SELECT dst FROM edges)",
        ", nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f", r0 AS (SELECT domain, CAST({scale} AS BIGINT) // n AS rank"
        "  FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f", s{i} AS (SELECT e.dst AS domain,"
            f" SUM(r.rank // d.deg) AS s"
            f" FROM r{i - 1} r JOIN edges e ON r.domain = e.src"
            f" JOIN deg d ON d.src = e.src GROUP BY 1)"
        )
        parts.append(
            f", r{i} AS (SELECT nodes.domain,"
            f" CAST(CAST({(100 - damping_pct) * scale} AS BIGINT)"
            f" // (100 * nn.n)"
            f" + ({damping_pct} * COALESCE(s{i}.s, 0)) // 100"
            f" AS BIGINT) AS rank"
            f" FROM nodes CROSS JOIN nn"
            f" LEFT JOIN s{i} ON s{i}.domain = nodes.domain)"
        )
    parts.append(
        f"SELECT domain, rank FROM r{iterations} ORDER BY domain"
    )
    return "\n".join(parts)
