"""Corpus-quality operators: repetition statistics, heuristic filtering,
PII redaction, and per-slice percentile summaries.

These are the standard pre-training corpus gates (C4 / Gopher-style rule
filters, repetition-based spam detection, PII scrubbing) expressed
Spark-first:

* repetition stats are the same explode + two-level hash-aggregation
  shape as :func:`pipit_spark.llm.text.token_frequencies` — map-side
  partial aggregation on ``(doc_id, token)`` absorbs the duplicates
  before the shuffle, so wire volume is ~distinct tokens per doc, not
  corpus tokens, and the plan scales linearly over 100 TB;
* the heuristic filter is single-scan and join-free: the one row-local
  feature it needs (normalized text length) rides through the explode
  as a carried column, so the whole rule set costs one corpus scan and
  two hash aggregations;
* PII redaction is pure ``regexp_replace`` / ``regexp_extract_all`` —
  JVM codegen, no UDFs, no shuffle; patterns are kept in the
  RE2-compatible subset so the DuckDB oracle replays them verbatim;
* the corpus summary uses exact interpolated ``percentile`` (both
  engines implement quantile type 7) over a two-key hash aggregation.

No reference counterpart (pipit has no text operators); these extend
SURVEY.md §7 step 9 alongside dedup/similarity/text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _norm, _tokens, _sql_norm

# RE2-compatible PII patterns (identical strings are interpolated into
# the DuckDB oracle — keep them free of Java-only constructs like
# possessive quantifiers or lookbehind)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"

# (tag, pattern) in application order: emails first (may contain digits
# and dots), then IPs (all-digit dotted quads), then phones — both
# sides replay the same nesting so the composition is deterministic
PII_RULES = [
    ("<EMAIL>", EMAIL_RE),
    ("<IP>", IPV4_RE),
    ("<PHONE>", PHONE_RE),
]


# ---------------------------------------------------------- repetition


def repetition_stats(docs: DataFrame, bigrams: bool = True) -> DataFrame:
    """Per-document repetition features (Gopher-style spam signals):

    * ``n_tokens`` — whitespace token count
    * ``distinct_token_ratio`` — distinct / total tokens
    * ``top_token_frac`` — frequency of the modal token / total
    * ``top_bigram_frac`` — frequency of the modal word bigram / bigram
      count (0.0 when ``bigrams=False``; a 1-token document contributes
      its lone token as a degenerate "bigram", mirroring the truncated
      final shingle of :func:`pipit_spark.llm.dedup.shingle_table`)

    Shape: explode tokens → hash-agg ``(doc_id, token)`` → hash-agg
    ``doc_id``. Bigrams reuse the slice-at-position formulation from
    the shingle table (codegen expressions, no HOF lambdas — see
    PLANS.md on the 13µs/element interpreted-lambda tax).
    """
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    uni = (
        toked.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6
            ).alias("distinct_token_ratio"),
            F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias(
                "top_token_frac"
            ),
        )
    )
    if not bigrams:
        return uni.withColumn("top_bigram_frac", F.lit(0.0))
    big = (
        toked.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("toks") - 1, F.lit(1))
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("toks", F.col("p"), F.lit(2))).alias(
                "bigram"
            ),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias(
                "top_bigram_frac"
            )
        )
    )
    # both sides are post-aggregation outputs keyed by doc_id; the join
    # key equals both groupBy keys so no extra exchange is introduced
    return uni.join(big, "doc_id", "left").fillna(
        {"top_bigram_frac": 0.0}
    )


def oracle_repetition_stats(table: str = "documents") -> str:
    norm = _sql_norm("text")
    return f"""
WITH toked AS (
    SELECT doc_id, string_split({norm}, ' ') AS toks FROM {table}
),
per_tok AS (
    SELECT doc_id, token, COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest(toks) AS token FROM toked)
    GROUP BY doc_id, token
),
uni AS (
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6)
               AS distinct_token_ratio,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_token_frac
    FROM per_tok GROUP BY doc_id
),
per_big AS (
    SELECT doc_id, bigram, COUNT(*) AS cnt
    FROM (
        SELECT doc_id,
               array_to_string(list_slice(toks, p, p + 1), ' ') AS bigram
        FROM toked,
             LATERAL (SELECT unnest(range(1, GREATEST(len(toks) - 1, 1) + 1))
                      AS p)
    )
    GROUP BY doc_id, bigram
),
big AS (
    SELECT doc_id, ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6)
               AS top_bigram_frac
    FROM per_big GROUP BY doc_id
)
SELECT uni.doc_id, uni.n_tokens, uni.distinct_token_ratio,
       uni.top_token_frac, COALESCE(big.top_bigram_frac, 0.0)
           AS top_bigram_frac
FROM uni LEFT JOIN big USING (doc_id)
"""


# ----------------------------------------------------- heuristic filter


def heuristic_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_avg_word: float = 2.0,
    max_avg_word: float = 12.0,
    min_distinct_ratio: float = 0.40,
    max_top_token_frac: float = 0.12,
) -> DataFrame:
    """C4/Gopher-style rule filter: keep documents inside length,
    word-shape, and repetition bounds. Returns the surviving documents
    with their decision features.

    Single-scan, join-free shape: the only row-local input the rule set
    needs beyond token counts is the normalized text length (for average
    word length), so it rides through the explode as a carried column and
    is recovered with ``first()`` after aggregation — one scan of the
    corpus, two hash aggregations, no self-join. (The naive formulation
    — ``stats_exprs`` projection joined to ``repetition_stats`` — scans
    the text twice; at 100 TB the second scan dominates.) ``n_tokens``
    is recovered as ``sum(cnt)`` ≡ ``size(tokens)`` and ``avg_word_len``
    as ``norm_len / n_tokens``, the same formulas as :func:`stats_exprs`,
    so the output matches the two-scan form exactly.
    """
    ex = docs.select(
        "doc_id",
        F.length(_norm(F.col("text"))).alias("norm_len"),
        F.explode(_tokens(F.col("text"))).alias("token"),
    )
    rep = (
        ex.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"), F.first("norm_len").alias("norm_len"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.round(
                F.first("norm_len").cast("double") / F.sum("cnt"), 4
            ).alias("avg_word_len"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6
            ).alias("distinct_token_ratio"),
            F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias(
                "top_token_frac"
            ),
        )
    )
    return (
        rep.filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("avg_word_len") >= min_avg_word)
            & (F.col("avg_word_len") <= max_avg_word)
            & (F.col("distinct_token_ratio") >= min_distinct_ratio)
            & (F.col("top_token_frac") <= max_top_token_frac)
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_word_len",
            "distinct_token_ratio",
            "top_token_frac",
        )
    )


def oracle_heuristic_filter(
    table: str = "documents",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_avg_word: float = 2.0,
    max_avg_word: float = 12.0,
    min_distinct_ratio: float = 0.40,
    max_top_token_frac: float = 0.12,
) -> str:
    norm = _sql_norm("text")
    return f"""
WITH per_tok AS (
    SELECT doc_id, token, COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split({norm}, ' ')) AS token
          FROM {table})
    GROUP BY doc_id, token
),
rep AS (
    SELECT doc_id,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6)
               AS distinct_token_ratio,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_token_frac
    FROM per_tok GROUP BY doc_id
),
local AS (
    SELECT doc_id,
           CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_tokens,
           ROUND(CAST(length({norm}) AS DOUBLE)
                 / len(string_split({norm}, ' ')), 4) AS avg_word_len
    FROM {table}
)
SELECT local.doc_id, local.n_tokens, local.avg_word_len,
       rep.distinct_token_ratio, rep.top_token_frac
FROM local JOIN rep USING (doc_id)
WHERE local.n_tokens BETWEEN {min_tokens} AND {max_tokens}
  AND local.avg_word_len BETWEEN {min_avg_word} AND {max_avg_word}
  AND rep.distinct_token_ratio >= {min_distinct_ratio}
  AND rep.top_token_frac <= {max_top_token_frac}
"""


# --------------------------------------------------------- PII redaction


def pii_redact_expr():
    """The redaction fold as a reusable expression — ONE owner of the
    rule application order, shared by :func:`pii_redact` and the
    recipe runner's in-place step so a new rule (or an escaping fix
    for replacement metacharacters) lands everywhere at once."""
    redacted = F.col("text")
    for tag, pat in PII_RULES:
        redacted = F.regexp_replace(redacted, pat, tag)
    return redacted


def pii_redact(docs: DataFrame) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers, replacing each
    match with a typed tag, and count matches per category (counts are
    taken on the original text, independently per pattern).

    Pure regexp codegen — a narrow map over the corpus with no shuffle;
    at 100 TB this is scan-bound, which is the best possible shape.
    """
    redacted = pii_redact_expr()
    return docs.select(
        "doc_id",
        redacted.alias("clean_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
    )


def oracle_pii_redact(table: str = "documents") -> str:
    redacted = "text"
    for tag, pat in PII_RULES:
        redacted = f"regexp_replace({redacted}, '{pat}', '{tag}', 'g')"
    return f"""
SELECT doc_id,
       {redacted} AS clean_text,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
           AS n_phones
FROM {table}
"""


# -------------------------------------------------------- corpus summary

_PCTS = [0.5, 0.9, 0.99]


def corpus_summary(docs: DataFrame, approx: bool = False) -> DataFrame:
    """Per-(source, lang) corpus profile: document count and
    interpolated length percentiles — the slice-level report a curation
    pipeline runs before and after each filter stage.

    Default is exact ``percentile`` (not ``approx_percentile``) so the
    DuckDB ``quantile_cont`` oracle matches bit-for-bit after rounding;
    both implement type-7 interpolation at index ``p·(n−1)``.
    ``approx=True`` is the 100 TB path: ``approx_percentile`` (bounded
    error, no per-group sort buffer) in the identical single-pass plan.
    """
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    ]
    for p in _PCTS:
        pct = (
            F.approx_percentile(F.col("n_chars"), F.lit(p), F.lit(10000))
            if approx
            else F.percentile(F.col("n_chars"), F.lit(p))
        )
        aggs.append(
            F.round(pct.cast("double"), 4).alias(f"p{int(p * 100)}_chars")
        )
    return docs.groupBy("source", "lang").agg(*aggs)


def oracle_corpus_summary(table: str = "documents") -> str:
    pct_cols = ", ".join(
        f"ROUND(quantile_cont(n_chars, {p}), 4) AS p{int(p * 100)}_chars"
        for p in _PCTS
    )
    return f"""
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       {pct_cols}
FROM {table}
GROUP BY source, lang
"""


def dedup_lines(docs: DataFrame, max_line_df: int = 2) -> DataFrame:
    """C4-style corpus-level line dedup: drop every line that occurs in
    more than ``max_line_df`` documents (navigation chrome, cookie
    banners, boilerplate headers), then reassemble each document from
    its surviving lines in original order.

    Plan: split+posexplode lines; count DISTINCT (line, doc) pairs per
    line hash with map-side combine; the boilerplate line set is
    typically tiny after the frequency filter, so it rides a broadcast
    anti-join back onto the line stream; reassembly is one groupBy with
    an array_sort on (idx, line) structs — no window, no global sort.
    Returns ``(doc_id, text, n_lines_kept, n_lines_dropped)``.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line"),
    )
    key = F.md5(F.trim(F.col("line")))
    per_doc = lines.select("doc_id", key.alias("__k")).dropDuplicates()
    hot = (
        per_doc.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_line_df)
        .select("__k", F.lit(True).alias("__hot"))
    )
    # flag hot lines instead of anti-joining them away: ONE aggregation
    # then computes kept text (collect_list skips the nulled hot lines)
    # and both counts together — no separate totals aggregation, no
    # join of two aggregated branches
    flagged = lines.withColumn("__k", key).join(
        F.broadcast(hot), "__k", "left"
    )
    agg = flagged.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__hot").isNull(), F.struct("idx", "line"))
            )
        ).alias("__kept"),
        F.count(F.lit(1)).alias("__n_total"),
    )
    return agg.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("__kept"), lambda s: s["line"]), "\n"
        ).alias("text"),
        F.size("__kept").cast("long").alias("n_lines_kept"),
        (F.col("__n_total") - F.size("__kept"))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def oracle_dedup_lines(table: str = "documents", max_line_df: int = 2) -> str:
    return f"""
WITH lines AS (
    SELECT doc_id, i - 1 AS idx, parts[i] AS line
    FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM {table}),
         LATERAL (SELECT UNNEST(generate_series(1, len(parts))) AS i)
),
hot AS (
    SELECT md5(trim(line)) AS k
    FROM (SELECT DISTINCT doc_id, md5(trim(line)) AS line_k, line
          FROM lines)
    GROUP BY md5(trim(line))
    HAVING COUNT(DISTINCT doc_id) > {max_line_df}
),
keptl AS (
    SELECT l.* FROM lines l
    LEFT JOIN hot h ON h.k = md5(trim(l.line))
    WHERE h.k IS NULL
),
kept AS (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text,
           COUNT(*) AS n_kept
    FROM keptl GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(k.text, '') AS text,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(t.n_total - COALESCE(k.n_kept, 0) AS BIGINT) AS n_lines_dropped
FROM tot t LEFT JOIN kept k USING (doc_id)
"""


def dedup_lines_within(docs: DataFrame) -> DataFrame:
    """Intra-document repeated-line removal: keep each distinct line's
    FIRST occurrence within its document, preserving order — the local
    complement of corpus-level :func:`dedup_lines` (chat transcripts
    and scraped pages repeat their own headers).

    Entirely row-local — no shuffle, no join: a higher-order
    ``filter`` keeps positions whose line's first index equals their
    own. Returns ``(doc_id, text, n_lines_kept, n_lines_dropped)``.
    """
    parts = F.split(F.col("text"), "\n")
    # two-arg filter lambda (element, 0-based index): keep a line iff
    # its first occurrence in the array is at this very position.
    # The filter result is projected ONCE and the counts read the
    # projected column — repeating an indexed-lambda HOF across several
    # expressions in one projection miscounts under Spark's
    # subexpression elimination (observed on 4.1: size() of the repeat
    # disagreed with the joined text).
    staged = docs.select(
        "doc_id",
        F.size(parts).alias("__n_total"),
        F.filter(
            parts, lambda x, i: F.array_position(parts, x) == i + 1
        ).alias("__kept"),
    )
    return staged.select(
        "doc_id",
        F.array_join("__kept", "\n").alias("text"),
        F.size("__kept").cast("long").alias("n_lines_kept"),
        (F.col("__n_total") - F.size("__kept"))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def oracle_dedup_lines_within(table: str = "documents") -> str:
    return f"""
WITH lines AS (
    SELECT doc_id, i, parts[i] AS line
    FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM {table}),
         LATERAL (SELECT UNNEST(generate_series(1, len(parts))) AS i)
),
firsts AS (
    SELECT doc_id, i, line,
           MIN(i) OVER (PARTITION BY doc_id, line) AS first_i,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_total
    FROM lines
)
SELECT doc_id,
       string_agg(CASE WHEN i = first_i THEN line END, chr(10)
                  ORDER BY i) AS text,
       CAST(SUM(CASE WHEN i = first_i THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lines_kept,
       CAST(ANY_VALUE(n_total)
            - SUM(CASE WHEN i = first_i THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lines_dropped
FROM firsts GROUP BY doc_id
"""


def filter_lines_by_fluency(
    docs: DataFrame,
    min_fluency: float = -9.0,
    top_k: int = 50_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """CCNet-style per-segment LM filtering (Wenzek et al. 2020,
    re-expressed relationally): score every LINE of every document
    under the corpus's own top-``top_k`` unigram distribution and drop
    lines whose mean log-probability falls below ``min_fluency`` —
    the segment-granular fluency filter that removes embedded gibberish
    / navigation junk a document-level score averages away. Lines with
    no tokens score as dropped (CCNet's rule).

    Plan: one line explode; the vocabulary table is bounded (top-K) and
    broadcasts exactly as in :func:`~pipit_spark.llm.text.fluency_score`;
    per-line means come from one aggregation keyed (doc, line idx), and
    document reassembly is the dedup_lines shape — one more aggregation
    with an array_sort, no window, no global sort.
    """
    from pyspark import StorageLevel
    from .text import _tokens

    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line"),
    )
    toks = lines.select(
        "doc_id", "idx",
        F.explode(_tokens(F.col("line"))).alias("token"),
    ).filter(F.length("token") > 0)
    freq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    totals = freq.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    line_scores = (
        toks.join(F.broadcast(top.select("token", "cnt")), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(smoothing))
                / (F.col("__total") + F.lit(smoothing) * F.col("__vocab"))
            ),
        )
        .groupBy("doc_id", "idx")
        # rounded BEFORE the threshold compare: both engines then test
        # identical 6-decimal values, so double summation-order noise
        # cannot flip a line straddling the threshold
        .agg(F.round(F.avg("__logp"), 6).alias("__fl"))
    )
    flagged = lines.join(line_scores, ["doc_id", "idx"], "left").withColumn(
        "__keep", F.col("__fl") >= min_fluency  # NULL (no tokens) drops
    )
    agg = flagged.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__keep"), F.struct("idx", "line"))
            )
        ).alias("__kept"),
        F.count(F.lit(1)).alias("__n_total"),
    )
    return agg.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("__kept"), lambda s: s["line"]), "\n"
        ).alias("text"),
        F.size("__kept").cast("long").alias("n_lines_kept"),
        (F.col("__n_total") - F.size("__kept"))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def oracle_filter_lines_by_fluency(
    table: str = "documents",
    min_fluency: float = -9.0,
    top_k: int = 50_000,
    smoothing: float = 1.0,
) -> str:
    from .text import _sql_norm

    norm_line = _sql_norm("l.line")
    return f"""
WITH lines AS (
    SELECT doc_id, generate_subscripts(ls, 1) - 1 AS idx,
           unnest(ls) AS line
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {table})
),
toks AS (
    SELECT doc_id, idx, unnest(string_split({norm_line}, ' ')) AS token
    FROM lines l
),
tf AS (SELECT token, COUNT(*) AS cnt FROM toks WHERE token <> ''
       GROUP BY token),
top AS (
    SELECT token, cnt FROM (
        SELECT token, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS r
        FROM tf
    ) WHERE r <= {top_k}
),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM tf),
line_scores AS (
    SELECT t.doc_id, t.idx,
           ROUND(AVG(LN((COALESCE(p.cnt, 0) + {smoothing})
                  / (tot.total + {smoothing} * tot.vocab))), 6) AS fl
    FROM toks t
    LEFT JOIN top p USING (token)
    CROSS JOIN tot
    WHERE t.token <> ''
    GROUP BY t.doc_id, t.idx
),
flagged AS (
    SELECT l.doc_id, l.idx, l.line,
           COALESCE(s.fl >= {min_fluency}, FALSE) AS keep
    FROM lines l
    LEFT JOIN line_scores s ON l.doc_id = s.doc_id AND l.idx = s.idx
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                ORDER BY idx), '') AS text,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lines_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_lines_dropped
FROM flagged
GROUP BY doc_id
"""


def corpus_card(docs: DataFrame) -> DataFrame:
    """One-row dataset datasheet — the numbers a data card leads with:
    document/token totals, source diversity, language share, duplicate
    rate, and mean quality. ONE text scan: every input is a narrow
    expression from the shared factories (:func:`..text.stats_exprs`,
    :func:`..text.pred_lang_expr`, :func:`..text.fingerprint_expr`)
    evaluated in a single projection feeding a single aggregation —
    at 100 TB this costs exactly one pass over the corpus.

    ``approx_count_distinct`` would be the drop-in for the two distinct
    counts at scale; exact here for the value-hash gate.
    """
    from .text import fingerprint_expr, pred_lang_expr, stats_exprs

    se = stats_exprs()
    feats = docs.select(
        F.col("source"),
        se["n_tokens"].alias("__nt"),
        se["quality_score"].alias("__q"),
        pred_lang_expr().alias("__lang"),
        fingerprint_expr().alias("__fp"),
    )
    return feats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.round(
            F.sum(F.when(F.col("__lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("en_share"),
        F.round(
            F.lit(1.0) - F.countDistinct("__fp") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(F.avg("__q"), 6).alias("mean_quality"),
    )


def oracle_corpus_card(table: str = "documents") -> str:
    from .text import _PUNCT_RE, _sql_norm, oracle_lang_id

    norm = _sql_norm("text")

    return f"""
WITH langs AS ({oracle_lang_id(table)}),
feats AS (
    SELECT d.source,
           len(string_split({norm}, ' ')) AS nt,
           LEAST(CAST(len(string_split({norm}, ' ')) AS DOUBLE) / 50.0, 1.0)
             * (1.0 - CAST(length(regexp_replace(d.text, '{_PUNCT_RE}', '', 'g'))
                           AS DOUBLE) / length(d.text)) AS q,
           l.pred_lang AS lang,
           md5(lower({norm})) AS fp
    FROM {table} d JOIN langs l USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       ROUND(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS en_share,
       ROUND(1.0 - COUNT(DISTINCT fp) / CAST(COUNT(*) AS DOUBLE), 6)
           AS dup_rate,
       ROUND(AVG(ROUND(q, 6)), 6) AS mean_quality
FROM feats
"""


def pattern_stats(
    docs: DataFrame, pattern: str, per: str = "source"
) -> DataFrame:
    """Corpus forensics for an arbitrary regex — how much of each
    ``per``-group matches a pattern (URLs, emails, code fences,
    boilerplate markers): documents matching, total match occurrences,
    and the per-document match rate. One scan, one aggregation; the
    count runs in JVM codegen (``regexp_count``), verified
    count-identical to DuckDB's ``regexp_extract_all`` length."""
    cnt = F.regexp_count(F.coalesce(F.col("text"), F.lit("")), F.lit(pattern))
    return (
        docs.select(F.col(per), cnt.alias("__m"))
        .groupBy(per)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__m") > 0, 1).otherwise(0)).alias(
                "n_docs_matching"
            ),
            F.sum("__m").alias("total_matches"),
        )
        .select(
            per,
            "n_docs",
            "n_docs_matching",
            "total_matches",
            F.round(F.col("total_matches") / F.col("n_docs"), 6).alias(
                "matches_per_doc"
            ),
        )
    )


def oracle_pattern_stats(
    table: str = "documents", pattern: str = "", per: str = "source"
) -> str:
    return f"""
SELECT {per},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN len(regexp_extract_all(COALESCE(text, ''),
                '{pattern}')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_matching,
       CAST(SUM(len(regexp_extract_all(COALESCE(text, ''), '{pattern}')))
           AS BIGINT) AS total_matches,
       ROUND(SUM(len(regexp_extract_all(COALESCE(text, ''), '{pattern}')))
             / CAST(COUNT(*) AS DOUBLE), 6) AS matches_per_doc
FROM {table} GROUP BY {per}
"""


# -------------------------------------------------- Luhn card scanning

_CARD_CAND_RE = r"\d(?:[ -]?\d)+"


def scan_credit_cards(docs: DataFrame, tag: str = "<CARD>") -> DataFrame:
    """Payment-card detection with EXACT Luhn verification — the PII
    tier regexes alone cannot give: a 16-digit order number is not a
    card, and redacting it anyway destroys usable text. Candidates are
    maximal digit runs (spaces/dashes allowed); a candidate counts as a
    card iff it has 13-19 digits AND passes the Luhn mod-10 check.
    Verified matches are replaced with ``tag`` in ``clean_text``.

    Everything is row-local JVM expressions (regexp extraction + HOF
    integer fold for the checksum — exact arithmetic, so the DuckDB
    twin agrees bit-for-bit); no UDF, no shuffle — scan-bound at 100 TB
    like the rest of the quality tier. Two adjacent cards separated
    only by a space/dash form ONE run and are (deterministically, on
    both engines) not counted — the candidate grammar's documented
    limit.
    """
    cands = F.regexp_extract_all(
        F.coalesce(F.col("text"), F.lit("")), F.lit(_CARD_CAND_RE), F.lit(0)
    )

    def _luhn_ok(c):
        rev = F.reverse(
            F.filter(
                F.split(F.regexp_replace(c, r"[ -]", ""), ""),
                lambda ch: ch != "",
            )
        )
        n = F.size(rev)
        vals = F.transform(
            rev,
            lambda ch, i: F.when(
                i % 2 == 0, ch.cast("int")
            ).otherwise(
                F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9)
                .otherwise(ch.cast("int") * 2)
            ),
        )
        s = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
        return (n >= 13) & (n <= 19) & (s % 10 == 0)

    valid = F.filter(cands, _luhn_ok)
    return docs.select(
        "doc_id",
        F.size(cands).cast("long").alias("n_card_candidates"),
        F.size(valid).cast("long").alias("n_cards"),
        F.aggregate(
            valid,
            F.coalesce(F.col("text"), F.lit("")),
            lambda acc, c: F.replace(acc, c, F.lit(tag)),
        ).alias("clean_text"),
    )


def oracle_scan_credit_cards(table: str = "documents") -> str:
    """DuckDB twin of the counts (the fold-redaction column is checked
    by pytest; the gate compares the counts)."""
    return f"""
WITH cand AS (
    -- occurrence counts survive the per-(doc, candidate) grouping:
    -- identical card strings repeated in one doc each count, and their
    -- Luhn verdict is shared
    SELECT doc_id, c, COUNT(*) AS occ FROM (
        SELECT doc_id,
               UNNEST(regexp_extract_all(COALESCE(text, ''),
                                         '{_CARD_CAND_RE}')) AS c
        FROM {table}
    ) GROUP BY doc_id, c
),
norm AS (
    SELECT doc_id, c, occ,
           reverse(regexp_replace(c, '[ -]', '', 'g')) AS d
    FROM cand
),
luhn AS (
    SELECT doc_id, c, ANY_VALUE(occ) AS occ, length(d) AS nd,
           SUM(CASE WHEN (i - 1) % 2 = 0
                    THEN CAST(substr(d, CAST(i AS INT), 1) AS INT)
                    WHEN CAST(substr(d, CAST(i AS INT), 1) AS INT) * 2 > 9
                    THEN CAST(substr(d, CAST(i AS INT), 1) AS INT) * 2 - 9
                    ELSE CAST(substr(d, CAST(i AS INT), 1) AS INT) * 2
               END) AS s
    FROM norm, UNNEST(range(1, length(d) + 1)) AS t(i)
    GROUP BY doc_id, c, d
),
per_cand AS (
    SELECT doc_id,
           SUM(occ) AS n_card_candidates,
           SUM(CASE WHEN nd BETWEEN 13 AND 19 AND s % 10 = 0
                    THEN occ ELSE 0 END) AS n_cards
    FROM luhn GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_card_candidates, 0) AS BIGINT)
           AS n_card_candidates,
       CAST(COALESCE(p.n_cards, 0) AS BIGINT) AS n_cards
FROM {table} d LEFT JOIN per_cand p USING (doc_id)
"""


# ------------------------------------------------------------ licenses

# (spdx id, family, lowercase marker substring) in detection-precedence
# order. Markers are PLAIN substrings matched on lower(text) — both
# engines use contains/strpos, so there is no regex-dialect risk; the
# SPDX tag, when present, wins over any marker.
LICENSE_MARKERS = [
    ("Apache-2.0", "permissive", "apache license"),
    ("MIT", "permissive", "mit license"),
    ("BSD-3-Clause", "permissive", "bsd 3-clause"),
    ("GPL-3.0-only", "copyleft", "gnu general public license"),
    ("MPL-2.0", "weak-copyleft", "mozilla public license"),
    ("CC-BY-4.0", "attribution", "creative commons attribution"),
    ("CC0-1.0", "public-domain", "cc0"),
]

# families for SPDX ids seen in the wild beyond the marker set; ids not
# listed here fall back to 'unknown' family (the id itself is still
# reported verbatim)
SPDX_FAMILIES = dict(
    [(lic, fam) for lic, fam, _ in LICENSE_MARKERS]
    + [
        ("GPL-2.0-only", "copyleft"),
        ("AGPL-3.0-only", "copyleft"),
        ("LGPL-3.0-only", "weak-copyleft"),
        ("BSD-2-Clause", "permissive"),
        ("ISC", "permissive"),
        ("Unlicense", "public-domain"),
    ]
)

# RE2-compatible: no lookaround, '-' last in the class
SPDX_RE = r"SPDX-License-Identifier: ([A-Za-z0-9.+-]+)"


def _license_expr(text_col: str):
    """(license column, has_spdx column) — the shared classification
    expressions (SPDX tag wins, then marker precedence, else
    unknown)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    spdx = F.regexp_extract(t, SPDX_RE, 1)
    low = F.lower(t)
    lic = F.when(spdx != "", spdx)
    for lid, _fam, marker in LICENSE_MARKERS:
        lic = lic.when(low.contains(marker), F.lit(lid))
    return lic.otherwise(F.lit("unknown")), (spdx != "")


def _family_expr(lic_col):
    fam = None
    for lid, family in SPDX_FAMILIES.items():
        cond = lic_col == lid
        fam = (
            F.when(cond, family) if fam is None else fam.when(cond, family)
        )
    return fam.otherwise(F.lit("unknown"))


def detect_licenses(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document license detection for code/web corpora: the SPDX
    tag (``SPDX-License-Identifier: <id>``, reported verbatim) wins;
    otherwise the first matching marker substring from
    ``LICENSE_MARKERS`` (case-insensitive, precedence = list order);
    otherwise ``unknown``. ``family`` buckets the id for downstream
    policy filters (permissive / copyleft / weak-copyleft /
    attribution / public-domain / unknown).

    Shape: one corpus scan, join-free — the when-chain and the single
    regexp_extract are JVM codegen expressions, so the op costs the
    same as reading the text column. At 100 TB this composes with
    heuristic_filter / pii_redact into the same single-scan pass
    (shared-expression plan, see llm/pipeline.py).
    """
    lic, has_spdx = _license_expr(text_col)
    return docs.select(
        "doc_id",
        lic.alias("license"),
        has_spdx.alias("has_spdx"),
    ).withColumn("family", _family_expr(F.col("license")))


def license_filter(
    docs: DataFrame,
    allowed_families: tuple[str, ...] = ("permissive", "public-domain"),
    text_col: str = "text",
) -> DataFrame:
    """License-policy gate for code/web corpora: keeps documents whose
    detected license family is in ``allowed_families``; every input
    column rides through, plus ``license`` and ``family``. One scan,
    join-free — composes with clean_corpus / pack_sequences into a
    single-pass curation plan (see the doc_licensed_pack gate)."""
    lic, _ = _license_expr(text_col)
    out = docs.withColumn("license", lic).withColumn(
        "family", _family_expr(F.col("license"))
    )
    return out.filter(F.col("family").isin(*list(allowed_families)))


def license_mix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus license report: docs and share (integer ppm — the
    integer-determinism rule from PLANS.md §14) per (license, family).
    One scan + one map-side-combined hash aggregation; the total-count
    scalar joins back as a 1-row broadcast."""
    per = detect_licenses(docs, text_col)
    counts = per.groupBy("license", "family").agg(
        F.count("*").alias("docs")
    )
    total = per.agg(F.count("*").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "license",
            "family",
            "docs",
            F.expr("docs * 1000000 div __total").alias("share_ppm"),
        )
    )


def _sql_detect_licenses(text_expr: str) -> str:
    """Shared SELECT-list fragment for the DuckDB twins: license,
    has_spdx, family computed from ``text_expr`` exactly as
    :func:`detect_licenses` does."""
    low = f"lower({text_expr})"
    spdx = f"regexp_extract({text_expr}, '{SPDX_RE}', 1)"
    marker_chain = " ".join(
        f"WHEN strpos({low}, '{m}') > 0 THEN '{lid}'"
        for lid, _f, m in LICENSE_MARKERS
    )
    fam_chain = " ".join(
        f"WHEN '{lid}' THEN '{fam}'" for lid, fam in SPDX_FAMILIES.items()
    )
    return f"""
           CASE WHEN {spdx} <> '' THEN {spdx}
                {marker_chain}
                ELSE 'unknown' END AS license,
           ({spdx} <> '') AS has_spdx,
           CASE (CASE WHEN {spdx} <> '' THEN {spdx}
                      {marker_chain}
                      ELSE 'unknown' END)
                {fam_chain}
                ELSE 'unknown' END AS family
    """


def oracle_detect_licenses(
    table: str = "documents", text_expr: str = "COALESCE(text, '')"
) -> str:
    return f"""
SELECT doc_id, {_sql_detect_licenses(text_expr)}
FROM {table}
"""


def oracle_license_mix(
    table: str = "documents", text_expr: str = "COALESCE(text, '')"
) -> str:
    return f"""
WITH per AS (
    SELECT doc_id, {_sql_detect_licenses(text_expr)} FROM {table}
)
SELECT license, family, COUNT(*) AS docs,
       COUNT(*) * 1000000 // (SELECT COUNT(*) FROM per) AS share_ppm
FROM per GROUP BY license, family
"""
