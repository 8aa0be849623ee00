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
