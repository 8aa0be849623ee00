"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side builtin expressions (split/regexp/higher-order
array functions) — no Python UDFs — so they whole-stage-codegen and scale
linearly over 100 TB of documents. Each operator has a DuckDB-portable
SQL twin (see ORACLE_SQL) used by the driver's correctness gate; the two
are kept semantically identical (same normalization, same regexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic marker stopwords per language for the n-gram/stopword
# language-ID heuristic (tie-break: fixed language order)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "des"],
    "zh": ["de5", "shi4", "le5", "bu4", "wo3"],
}
EN_STOPWORDS = LANG_MARKERS["en"] + ["in", "is", "it", "for", "on"]

_PUNCT_RE = r"[^.,;:!?]"


def _norm(col):
    """Whitespace-normalized text: trim + collapse runs to single space.
    (Identical in the SQL twin; avoids split() edge cases on leading /
    trailing whitespace.)"""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def _tokens(col):
    return F.split(_norm(col), " ")


def stats_exprs() -> dict:
    """The text_stats feature set as named column expressions, so fused
    pipelines (:mod:`pipit_spark.llm.pipeline`) can evaluate them in the
    same projection as other features — one pass over the text instead
    of a join between per-operator outputs."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct = F.length(F.regexp_replace(F.col("text"), _PUNCT_RE, ""))
    avg_word = F.length(_norm(F.col("text"))) / n_tokens
    # try_divide: empty text (n_chars=0) yields NULL ratios instead of
    # an ANSI DIVIDE_BY_ZERO crash — real corpora contain empty docs,
    # and a NULL quality score correctly fails any quality floor.
    # (n_tokens is never 0: split('') is [''].) The DuckDB oracles are
    # unaffected — the fixture corpus has no empty text.
    punct_ratio = F.try_divide(punct.cast("double"), n_chars)
    quality = (
        F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
        * (F.lit(1.0) - punct_ratio)
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_word_len": F.round(avg_word, 4),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tokens, 6),
        "quality_score": F.round(quality, 6),
    }


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality statistics: char/token counts, average word
    length, punctuation ratio, stopword ratio, and a composite quality
    score — the standard pre-training quality-filter features."""
    return docs.select(
        "doc_id", *[c.alias(k) for k, c in stats_exprs().items()]
    )


def token_frequencies(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """Corpus-wide term frequencies: explode + hash aggregation (partial
    map-side combine makes this shuffle-light even at corpus scale)."""
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counting per document: whitespace
    tokens plus an estimate of subword pieces (len/4 heuristic used by
    byte-pair encoders for budgeting)."""
    toks = _tokens(F.col("text"))
    ws = F.size(toks)
    bpe_est = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.length(t).cast("double") / F.lit(4.0)).cast("long"),
        ),
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe_est.alias("bpe_tokens"),
    )


def pred_lang_expr():
    """Predicted-language column expression (argmax of marker-word hit
    counts, fixed language order breaking ties, 'und' when nothing
    hits). Standalone expression so fused pipelines evaluate it inline;
    codegen subexpression elimination dedups the per-language scores."""
    toks = _tokens(F.lower(F.col("text")))

    def _hits(markers):
        # closure per language: F.filter inspects the lambda's arity,
        # so the marker array must NOT ride as a default parameter
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lg: _hits(m) for lg, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(
            pred
        )
    return pred


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language identification (deterministic heuristic):
    score = number of marker-word hits per language; argmax with fixed
    language order as tie-break; 'und' when no markers hit."""
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        pred_lang_expr().alias("pred_lang"),
    )


def fingerprint_expr():
    """md5 over lowercased, whitespace-normalized text."""
    return F.md5(F.lower(_norm(F.col("text"))))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized text
    (content-addressing for exact dedup and incremental reprocessing)."""
    return docs.select("doc_id", fingerprint_expr().alias("fingerprint"))


def _sql_norm(col: str) -> str:
    return f"regexp_replace(trim({col}), '\\s+', ' ', 'g')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def oracle_text_stats(table: str = "documents") -> str:
    norm = _sql_norm("text")
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_tokens,
       ROUND(CAST(length({norm}) AS DOUBLE) / len(string_split({norm}, ' ')), 4)
           AS avg_word_len,
       ROUND(CAST(length(regexp_replace(text, '{_PUNCT_RE}', '', 'g')) AS DOUBLE)
             / length(text), 6) AS punct_ratio,
       ROUND(CAST(len(list_filter(string_split({norm}, ' '),
                  t -> list_contains({_sql_list(EN_STOPWORDS)}, t))) AS DOUBLE)
             / len(string_split({norm}, ' ')), 6) AS stopword_ratio,
       ROUND(LEAST(CAST(len(string_split({norm}, ' ')) AS DOUBLE) / 50.0, 1.0)
             * (1.0 - CAST(length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
                           AS DOUBLE) / length(text)), 6) AS quality_score
FROM {table}
"""


def oracle_token_frequencies(table: str = "documents", min_count: int = 1) -> str:
    norm = _sql_norm("text")
    return f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split({norm}, ' ')) AS token FROM {table})
WHERE length(token) > 0
GROUP BY token
HAVING COUNT(*) >= {min_count}
"""


def oracle_token_counts(table: str = "documents") -> str:
    norm = _sql_norm("text")
    return f"""
SELECT doc_id,
       CAST(len(string_split({norm}, ' ')) AS BIGINT) AS ws_tokens,
       CAST(list_sum(list_transform(string_split({norm}, ' '),
            t -> GREATEST(1, CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))))
            AS BIGINT) AS bpe_tokens
FROM {table}
"""


def oracle_lang_id(table: str = "documents") -> str:
    norm = _sql_norm("lower(text)")
    score = {
        lg: (
            f"len(list_filter(string_split({norm}, ' '), "
            f"t -> list_contains({_sql_list(ms)}, t)))"
        )
        for lg, ms in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(score[lg] for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {score[lg]} = {best} AND {best} > 0 THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
SELECT doc_id, lang AS true_lang, {case} AS pred_lang
FROM {table}
"""


def oracle_doc_fingerprint(table: str = "documents") -> str:
    return f"""
SELECT doc_id, md5(lower({_sql_norm('text')})) AS fingerprint
FROM {table}
"""


def vocab_stats(docs: DataFrame, approx: bool = False) -> DataFrame:
    """Per-source vocabulary profile: distinct token count and total
    token occurrences. With ``approx=True`` the distinct count uses the
    HyperLogLog sketch (``approx_count_distinct``) — the 100 TB path,
    where an exact distinct over (source, token) would shuffle the full
    token stream; the sketch aggregates locally and merges ~kB of state
    per partition. The exact form (default) is the correctness-gate
    twin. Both are one explode + one hash aggregation."""
    toks = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("token")
    )
    distinct = (
        F.approx_count_distinct("token")
        if approx
        else F.count_distinct("token")
    )
    return toks.groupBy("source").agg(
        distinct.cast("long").alias("vocab_size"),
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
    )


def oracle_vocab_stats(table: str = "documents") -> str:
    norm = _sql_norm("text")
    return f"""
SELECT source,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) AS BIGINT) AS total_tokens
FROM (SELECT source, unnest(string_split({norm}, ' ')) AS token
      FROM {table})
GROUP BY source
"""


def fluency_score(
    docs: DataFrame, top_k: int = 50_000, smoothing: float = 1.0
) -> DataFrame:
    """Unigram language-model fluency per document: the mean
    add-``smoothing`` log-probability of the document's tokens under
    the corpus's own top-``top_k`` unigram distribution — the cheap
    fluency signal curation pipelines use between heuristics and a real
    classifier (gibberish and boilerplate score low; OOV tokens get the
    smoothed floor).

    Scale shape: the frequency table is capped at ``top_k`` entries
    (count desc, token asc — deterministic), so the probability table
    BROADCASTS no matter how large the corpus; scoring is one explode +
    broadcast left join + per-doc mean. Two corpus scans total (train,
    score) and one bounded shuffle for the frequency aggregation.
    """
    from pyspark import StorageLevel

    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    ).filter(F.length("token") > 0)
    # the frequency table feeds two branches (top-K and the totals) —
    # persist it (disk-allowed: vocabulary-sized, not corpus-sized) so
    # the corpus is tokenized once, not re-scanned per branch
    freq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # orderBy+limit → TakeOrderedAndProject: distributed partial top-K
    # per partition, merged on the driver — never a single-partition
    # global-window sort of the whole vocabulary
    top = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    # scalar totals ride a 1-row broadcast cross join (no collect)
    totals = freq.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    scored = (
        toks.join(F.broadcast(top.select("token", "cnt")), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(smoothing))
                / (F.col("__total") + F.lit(smoothing) * F.col("__vocab"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("__logp"), 6).alias("fluency"),
        F.count(F.lit(1)).cast("long").alias("n_scored_tokens"),
    )


def oracle_fluency_score(
    table: str = "documents", top_k: int = 50_000, smoothing: float = 1.0
) -> str:
    norm = _sql_norm("text")
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({norm}, ' ')) AS token
    FROM {table}
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
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM tf)
SELECT t.doc_id,
       ROUND(AVG(LN((COALESCE(p.cnt, 0) + {smoothing})
                    / (tot.total + {smoothing} * tot.vocab))), 6) AS fluency,
       CAST(COUNT(*) AS BIGINT) AS n_scored_tokens
FROM toks t
LEFT JOIN top p USING (token)
CROSS JOIN tot
WHERE t.token <> ''
GROUP BY t.doc_id
"""


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4
) -> DataFrame:
    """MOSS-style winnowing fingerprints: hash every character k-gram of
    the normalized text, slide a window of ``w`` consecutive hashes,
    and keep each window's minimum (ties to the rightmost position, the
    standard rule) — the shift-robust document fingerprint set used for
    local-similarity detection, where the md5 whole-doc fingerprint is
    defeated by a single edit.

    Guarantee: any shared substring of length ≥ k + w - 1 between two
    documents yields at least one shared fingerprint.

    Shape: the ENTIRE winnow — k-gram hashes, the w-window minima, and
    the selected-position distinct — evaluates ROW-LOCALLY as array
    expressions inside one projection; the only thing that ever leaves
    the row is the per-doc fingerprint set.  (The previous shape
    exploded one row per character position — each carrying the whole
    document text — and shuffled ~N·len(text) rows into a window: the
    explode/window pair made this the registry's slowest fingerprint
    stage by far.  Rule and hash VALUES are unchanged, so the DuckDB
    oracle replays the same pipeline and the gate hash is identical.)
    The hash is the first 8 md5 hex chars — engine-portable."""
    # The projection is ~ms of CPU per document, so parallelism must
    # come from the INPUT split (12 s single-task vs 1.7 s spread on
    # the 1-file sf0.1 fixture) — see partitioning.spread_input.
    from ..partitioning import spread_input

    docs = spread_input(docs)
    norm = _norm(F.col("text"))
    n = F.greatest(F.length(norm) - k + 1, F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n),
        lambda p: F.substring(F.md5(F.substring(norm, p, k)), 1, 8),
    )
    with_hs = docs.select("doc_id", hs.alias("__hs"))
    # The (hash, -p)-struct window-min rule reduces to plain string
    # comparison: position p is its own window's rightmost minimum iff
    # h_p is STRICTLY below every one of the next w-1 hashes (equality
    # loses to the later position by the -p tie-break).  'ｚ' (U+FF5A)
    # sorts above every hex char, so an end-of-doc empty slice always
    # selects.
    sentinel = "ｚ"
    fps = F.array_distinct(
        F.transform(
            F.filter(
                F.sequence(F.lit(1), F.size("__hs")),
                lambda p: F.element_at("__hs", p)
                < F.coalesce(
                    F.array_min(F.slice("__hs", p + 1, w - 1)),
                    F.lit(sentinel),
                ),
            ),
            lambda p: F.element_at("__hs", p),
        )
    )
    return with_hs.select(
        "doc_id", F.explode(fps).alias("fingerprint")
    ).distinct()


def oracle_winnow_fingerprints(
    table: str = "documents", k: int = 8, w: int = 4
) -> str:
    norm = _sql_norm("text")
    return f"""
WITH pos AS (
    SELECT doc_id, t, UNNEST(generate_series(1, GREATEST(length(t) - {k} + 1, 1)))
               AS p
    FROM (SELECT doc_id, {norm} AS t FROM {table})
),
grams AS (
    SELECT doc_id, p, substr(md5(substr(t, p, {k})), 1, 8) AS h FROM pos
),
sel AS (
    SELECT doc_id, p, h,
           MIN(struct_pack(h := h, np := -p)) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
           ) AS m
    FROM grams
)
SELECT DISTINCT doc_id, h AS fingerprint
FROM sel WHERE m.h = h AND m.np = -p
"""


# GPT-2-style pre-tokenizer classes, ASCII-restricted so the Java and
# POSIX regex engines agree byte-for-byte: letter runs, digit runs,
# punctuation runs (whitespace separates, never emitted).
_PRETOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"
_US = "\x1f"  # unit separator joins the token stream


def pretokenize(docs: DataFrame) -> DataFrame:
    """BPE-style regex pre-tokenization (the split GPT-2-family
    tokenizers apply before byte-pair merges): letter / digit /
    punctuation runs via ``regexp_extract_all`` — a single JVM
    expression, no UDF, no shuffle. Output carries the token count and
    the unit-separator-joined token stream (scalar columns hash
    deterministically across engines; the array form is
    ``split(pretokens, US)``)."""
    # pattern as a lit Column — routing it through F.expr would hit the
    # SQL string parser, which eats the \s escape. Null text coalesces
    # to '' so count/stream stay (0, '') instead of (NULL, '').
    toks = F.regexp_extract_all(
        F.coalesce(F.col("text"), F.lit("")), F.lit(_PRETOKEN_RE), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_pretokens"),
        F.concat_ws(_US, toks).alias("pretokens"),
    )


def oracle_pretokenize(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{_PRETOKEN_RE}'))
            AS BIGINT) AS n_pretokens,
       array_to_string(regexp_extract_all(COALESCE(text, ''),
                       '{_PRETOKEN_RE}'), chr(31)) AS pretokens
FROM {table}
"""


def winnow_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """MOSS-style clone detection: document pairs sharing ≥
    ``min_shared`` winnowing fingerprints, scored by the overlap
    coefficient shared/min(|A|, |B|) — robust to one document embedding
    a fragment of another, where Jaccard dilutes.

    Plan: the document-frequency cap applies COUNT-FIRST — a count
    aggregation (map-side combine absorbs boilerplate fingerprints)
    finds the surviving fingerprints, and only their rows reach the
    posting-list collection, so no aggregation buffer ever holds more
    than ``max_df`` doc ids (collecting first and size-filtering after
    would buffer a hot fingerprint's corpus-scale posting list in one
    task before discarding it). Pairs explode intra-list, and the
    per-doc fingerprint counts join back (doc-level cardinality — AQE
    broadcasts). The fingerprint stream feeds the count, the probe,
    and the sizes aggregate — it persists spill-safely for the query
    (clear via ``spark.catalog.clearCache()``)."""
    from pyspark import StorageLevel

    # int64 fingerprint surrogate (r13, guide §2.3): everything below —
    # per-doc counts, the df cap, the bucket self-join — needs only
    # fingerprint EQUALITY, so the 8-hex-char portable string (already a
    # 32-bit space; the oracle never sees pair internals) rides the
    # persist, the exchanges and the join as an 8-byte long. Applied
    # AFTER the per-doc distinct, so per-doc fingerprint counts are
    # byte-identical to the string form; cross-string xxhash64
    # collisions on distinct 32-bit values are the only delta (~0).
    fps = (
        winnow_fingerprints(docs, k=k, w=w)
        .select("doc_id", F.xxhash64("fingerprint").alias("fingerprint"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("__n"))
    # df BETWEEN 2 and max_df: singletons can't pair, so they skip the
    # posting-list collection entirely
    surviving = (
        fps.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df").between(2, max_df))
        .select("fingerprint")
    )
    posting = fps.join(surviving, "fingerprint")
    # intra-bucket pairs via a streaming SELF-JOIN on the fingerprint
    # (r12; the same reform as _pair_common_counts / r11's
    # simhash_pairs): the old collect_list + double-explode buffered
    # each posting list in an ObjectHashAggregate before exploding
    # df² rows — the self-join emits the same a<b pairs from codegen'd
    # join machinery with NO posting buffer, and the two sides
    # canonicalize equal so the bucket exchange is built once (AQE
    # runtime stage reuse)
    pairs = (
        posting.select("fingerprint", F.col("doc_id").alias("__a"))
        .join(
            posting.select("fingerprint", F.col("doc_id").alias("__b")),
            "fingerprint",
        )
        .filter(F.col("__a") < F.col("__b"))
        .groupBy(F.col("__a").alias("a"), F.col("__b").alias("b"))
        .agg(F.count("*").cast("bigint").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a", "b", "shared",
            F.round(
                F.col("shared") / F.least("__na", "__nb"), 6
            ).alias("overlap"),
        )
    )


def oracle_winnow_pairs(
    table: str = "documents",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
) -> str:
    fp = oracle_winnow_fingerprints(table=table, k=k, w=w)
    return f"""
WITH fp AS (SELECT * FROM ({fp})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id),
keep AS (
    SELECT fingerprint FROM fp GROUP BY fingerprint
    HAVING COUNT(*) <= {max_df}
),
pairs AS (
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST(COUNT(*) AS BIGINT) AS shared
    FROM fp x
    JOIN fp y ON x.fingerprint = y.fingerprint AND x.doc_id < y.doc_id
    WHERE x.fingerprint IN (SELECT fingerprint FROM keep)
    GROUP BY x.doc_id, y.doc_id
    HAVING COUNT(*) >= {min_shared}
)
SELECT a, b, shared,
       ROUND(CAST(shared AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS overlap
FROM pairs
JOIN sizes sa ON pairs.a = sa.doc_id
JOIN sizes sb ON pairs.b = sb.doc_id
"""


def vocab_coverage(
    docs: DataFrame, top_k: int = 500, persist: bool = True
) -> DataFrame:
    """Per-source out-of-vocabulary rate against the corpus-wide top-K
    token vocabulary — the tokenizer-health monitor a pipeline runs
    before committing to a vocab: a source whose OOV rate spikes is
    about to shred into <unk>/byte-fallback pieces.

    ONE corpus text scan: the exploded stream collapses immediately
    into (source, token) counts — everything downstream (vocab ranking,
    OOV probe, per-source totals) works on that aggregate, which is
    bounded by |sources|×|vocab|, not by corpus tokens. The vocab cut
    is ``orderBy().limit()`` — Catalyst compiles it to
    TakeOrderedAndProject, a distributed per-partition partial top-k +
    tiny driver merge, NOT the single-partition global sort a ranking
    window would force over what can be billions of distinct tokens at
    100 TB (the deterministic (count DESC, token ASC) total order makes
    the two formulations equivalent). The probe is a broadcast join of
    aggregated rows against the bounded vocab; the persisted (source,
    token) counts are re-read, never re-scanned from text.

    Cache lifetime: with ``persist=True`` the (source, token) counts
    stay in storage memory until released — Spark's CacheManager does
    not GC them. The cached frame is exposed as
    ``result.cached_token_counts``; long-lived sessions calling this
    repeatedly should ``result.cached_token_counts.unpersist()`` after
    consuming the result (or pass ``persist=False`` to trade the second
    scan for zero cache footprint).
    """
    st = (
        docs.select(
            "source", F.explode(_tokens(F.col("text"))).alias("token")
        )
        .filter(F.length("token") > 0)
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if persist:
        st = st.persist()
    vocab = (
        st.groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_k)
        .select("token")
    )
    flagged = st.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "token", "left"
    )
    out = (
        flagged.groupBy("source")
        .agg(
            F.sum("cnt").alias("total_tokens"),
            F.sum(F.when(F.col("__in").isNull(), F.col("cnt")).otherwise(0))
            .alias("oov_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "oov_tokens",
            F.round(
                F.col("oov_tokens") / F.col("total_tokens"), 6
            ).alias("oov_rate"),
        )
    )
    # release handle for the persisted counts (see docstring)
    out.cached_token_counts = st if persist else None
    return out


def oracle_vocab_coverage(table: str = "documents", top_k: int = 500) -> str:
    norm = _sql_norm("text")
    return f"""
WITH toks AS (
    SELECT source, t.token
    FROM {table}, UNNEST(string_split({norm}, ' ')) AS t(token)
    WHERE length(t.token) > 0
),
vocab AS (
    SELECT token FROM (
        SELECT token,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
        FROM toks GROUP BY token
    ) WHERE rk <= {top_k}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS oov_tokens,
       ROUND(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM toks LEFT JOIN vocab v USING (token)
GROUP BY source
"""


def boilerplate_ngrams(
    docs: DataFrame, n: int = 3, top_k: int = 20, min_df: int = 2
) -> DataFrame:
    """The corpus's most widespread word n-grams by DOCUMENT frequency —
    the boilerplate detector (headers, footers, license blurbs, nav
    text) run before writing removal rules: an n-gram appearing in many
    documents is template, not content.

    One shingle pass (distinct per doc, so df counts documents not
    occurrences) → hash aggregation → distributed
    ``orderBy().limit()`` top-k (TakeOrderedAndProject, same shape as
    :func:`vocab_coverage`'s vocab cut). Deterministic (df DESC,
    ngram ASC) order.
    """
    from .dedup import shingle_table

    sh = shingle_table(docs, n=n, distinct=True)
    return (
        sh.groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("ngram"))
        .limit(top_k)
    )


def oracle_boilerplate_ngrams(
    table: str = "documents", n: int = 3, top_k: int = 20, min_df: int = 2
) -> str:
    from .dedup import _sql_shingles

    return f"""
SELECT ngram, CAST(df AS BIGINT) AS df FROM (
    SELECT ngram, COUNT(*) AS df FROM (
        SELECT DISTINCT doc_id, unnest({_sql_shingles(n)}) AS ngram
        FROM {table}
    ) GROUP BY ngram HAVING COUNT(*) >= {min_df}
    ORDER BY df DESC, ngram ASC LIMIT {top_k}
)
"""


def novelty_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document novelty: the fraction of the document's distinct
    word ``n``-grams that appear in NO other document — the signal
    memorization/duplication studies rank corpora by (a doc of mostly
    corpus-unique n-grams is fresh content; near-zero novelty is
    boilerplate or a near-duplicate).

    All-aggregation shape — deliberately NO window over the shingle
    key: a boilerplate shingle shared by millions of documents would
    funnel its whole posting list through one window task (windows
    can't split a hot key; hash aggregation combines it map-side).
    A corpus-unique shingle has exactly one owner, so per-doc unique
    counts come from the shingle-keyed aggregate's ``min(doc_id)``
    without ever materializing per-row document frequencies:
    one branch counts each doc's distinct shingles, the other counts
    df==1 shingles grouped by their single owner, and the two
    doc-keyed frames join skew-free. Document frequency counts
    DOCUMENTS (distinct shingles per doc), not occurrences.
    """
    from .dedup import shingle_table

    sh = shingle_table(docs, n=n, distinct=True)
    per_doc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams")
    )
    uniques = (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("__df"),
            F.min("doc_id").alias("doc_id"),
        )
        .filter(F.col("__df") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        per_doc.join(uniques, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.round(
                F.coalesce("n_unique", F.lit(0)) / F.col("n_ngrams"), 6
            ).alias("novelty"),
        )
    )


def oracle_novelty_scores(table: str = "documents", n: int = 3) -> str:
    from .dedup import _sql_shingles

    return f"""
WITH sh AS (
    SELECT DISTINCT doc_id, unnest({_sql_shingles(n)}) AS shingle
    FROM {table}
),
flagged AS (
    SELECT doc_id,
           CASE WHEN COUNT(*) OVER (PARTITION BY shingle) = 1
                THEN 1 ELSE 0 END AS uniq
    FROM sh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(uniq) AS BIGINT) AS n_unique,
       ROUND(SUM(uniq) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM flagged GROUP BY doc_id
"""


def tfidf_topk(
    docs: DataFrame, k: int = 3, mode: str = "log", persist: bool = True,
    group_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k characteristic terms by TF-IDF — the keyword
    signal behind per-doc topic tags, near-query retrieval, and
    "what is this cluster about" summaries of dedup groups.

    ONE corpus text scan: exploded tokens collapse immediately into
    (doc_id, token) term frequencies; document frequency is an
    aggregation OVER that frame (the vocab-sized table, never the token
    stream twice), and the corpus size joins in as a 1-row broadcast
    scalar. The final per-doc top-k is a rank window partitioned by
    doc_id — at 100 TB each document's terms hash to one partition, so
    no global sort; the tf↔df join keys on token and is left to AQE
    (the df side is vocab-sized: broadcastable for natural-language
    vocabularies, shuffled only when genuinely huge).

    ``mode="log"`` scores the classic ``tf·ln(N/df)`` (floats — for
    users). ``mode="ppm"`` scores ``(tf·N·1e6) div df`` in exact BIGINT
    arithmetic — a linear-IDF variant whose ordering and VALUES are
    bit-reproducible across engines and partitionings (the gate path;
    fits BIGINT up to N≈1e9 docs × tf≈1e3). Ties break (score DESC,
    token ASC). ``group_col`` generalizes the granularity: pass
    ``"source"`` for per-source distinctive vocabulary (what is THIS
    source about, relative to the corpus — df then counts sources and
    N is the source count), or a cluster-id column to label dedup
    clusters.

    df is deliberately an aggregation-over-tf + join, NOT a
    ``COUNT() OVER (PARTITION BY token)`` window: hash aggregation
    combines hot tokens map-side, while a window would funnel a
    stopword's every (doc, tf) row — up to one per corpus document —
    through a single task. The tf frame feeds both branches; df counts
    with ``count_if(tf >= 1)`` — value-identical to ``count(*)`` (tf
    is a count, always >= 1) but it keeps the tf column LIVE in this
    branch: with ``count(1)`` column pruning rewrites the branch's
    upstream aggregate to a bare distinct, the two tf exchange
    subtrees no longer canonicalize equal, and the corpus is scanned
    and exploded twice; with the column alive AQE's runtime stage
    reuse dedups the exchange and the token explode runs ONCE
    (pinned by tests/test_round12.py). ``persist=True`` (default)
    additionally caches tf — same lifetime contract as
    :func:`vocab_coverage`: the handle is exposed as
    ``result.cached_tf``; long-lived sessions should unpersist it
    after consuming the result (or pass ``persist=False``, which
    since the stage-reuse fix costs no extra corpus scan).
    """
    tok = docs.select(
        group_col, F.explode(_tokens(F.col("text"))).alias("token")
    ).filter(F.length("token") > 0)
    tf = tok.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if persist:
        tf = tf.persist()
    dfreq = tf.groupBy("token").agg(
        F.count_if(F.col("tf") >= 1).alias("df")
    )
    n_docs = docs.agg(F.countDistinct(group_col).alias("__n"))
    scored = tf.join(dfreq, "token").crossJoin(F.broadcast(n_docs))
    if mode == "ppm":
        score = F.expr("tf * __n * 1000000 div df").alias("score_ppm")
        order_col = "score_ppm"
    elif mode == "log":
        score = (
            F.col("tf") * F.log(F.col("__n") / F.col("df"))
        ).alias("score")
        order_col = "score"
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc("token")
    )
    out = (
        scored.select(group_col, "token", "tf", "df", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    # release handle for the persisted tf counts (see docstring)
    out.cached_tf = tf if persist else None
    return out


def oracle_tfidf_topk(
    table: str = "documents", k: int = 3, group_col: str = "doc_id"
) -> str:
    """DuckDB twin of tfidf_topk(mode="ppm") — all-integer scoring, so
    the hash comparison is exact by construction."""
    norm = _sql_norm("text")
    g = group_col
    return f"""
WITH tok AS (
    SELECT {g}, unnest(string_split({norm}, ' ')) AS token
    FROM {table}
),
tf AS (
    SELECT {g}, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE length(token) > 0 GROUP BY 1, 2
),
dfq AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(COUNT(DISTINCT {g}) AS BIGINT) AS __n FROM {table}),
scored AS (
    SELECT tf.{g}, tf.token, tf.tf, dfq.df,
           CAST((tf.tf * n.__n * 1000000) // dfq.df AS BIGINT)
               AS score_ppm
    FROM tf JOIN dfq USING (token) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY {g}
                 ORDER BY score_ppm DESC, token ASC) AS rank
    FROM scored
)
SELECT {g}, token, tf, df, score_ppm, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, str],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "log",
) -> DataFrame:
    """BM25 retrieval over the corpus: top-k documents per query — the
    search tier a curation pipeline uses for targeted selection (pull
    documents near a benchmark's topics, audit what a dedup cluster is
    about, build retrieval-filtered subsets à la DSIR-with-queries).

    ``queries`` maps query_id → query text (tokenized with the corpus
    tokenizer). Per-term scores are the classic Robertson/Sparck-Jones
    BM25: ``idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``.

    One corpus scan builds (doc, term) tf + doc lengths; the exploded
    stream is immediately cut to query terms (a broadcast isin filter —
    the query vocabulary is tiny), so df/score work touches only
    matching postings. avgdl joins as a 1-row broadcast scalar; the
    final per-query top-k is the rank-window partial-top-k pattern.

    ``mode="log"``: real BM25 idf ``ln((N−df+0.5)/(df+0.5)+1)``.
    ``mode="rational"``: idf = ``(N−df+0.5)/(df+0.5)`` — a monotone-
    per-term surrogate built ONLY from IEEE-exact ops (+,−,×,÷ are
    correctly rounded, so Spark and DuckDB agree bit-for-bit; ``ln`` is
    only 1-ulp-accurate and may differ between libms) — and per-term
    scores quantized to integer micro-units (``floor(s·1e6)``) before
    the cross-term sum, so the score is a BIGINT sum (order-independent
    — a float sum's partial-aggregation order varies by engine and
    partitioning) divided once at the end. The gate uses this mode;
    rankings differ from log-idf only across terms, not within one.
    """
    if mode not in ("log", "rational"):
        raise ValueError(f"unknown mode: {mode!r}")
    terms = sorted(
        {
            t
            for q in queries.values()
            for t in q.strip().split()
            if t
        }
    )
    if not terms:
        raise ValueError(
            "bm25_topk: queries contain no non-empty terms"
        )
    qmap = [
        (qid, t) for qid, q in sorted(queries.items())
        for t in sorted(set(q.strip().split())) if t
    ]
    spark = docs.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(qmap, "query_id string, token string")
    )
    # doc length is a row-local array expression — no explode, no
    # aggregation, so the full token stream is never shuffled for it
    dl_expr = F.size(
        F.filter(_tokens(F.col("text")), lambda t: F.length(t) > 0)
    ).cast("long")
    dl = docs.select("doc_id", dl_expr.alias("dl"))
    # dl rides along with tf (it is row-local, constant per doc, so
    # max() over the (doc, token) group recovers it exactly) instead
    # of joining the corpus-sized dl frame back on doc_id: at scale
    # that join broadcast one row PER CORPUS DOC — the classic
    # broadcast-the-big-side hazard — and its inferred
    # isnotnull(doc_id) filter landed in only one of the two tf
    # subtrees, defeating exchange reuse. The explicit base filter is
    # applied to BOTH branches (docs with null doc_id can never be
    # returned — doc_id is the output key).
    # two-step select: dl is computed in a Project BELOW the Generate
    # (once per doc), so the explode carries [doc_id, dl] — not the
    # full text column copied onto every token row (a single-select
    # form puts dl above the Generate and drags text through it:
    # measured +1.1 s at sf0.1)
    tf = (
        docs.filter(F.col("doc_id").isNotNull())
        .select("doc_id", dl_expr.alias("dl"), "text")
        .select(
            "doc_id",
            "dl",
            F.explode(_tokens(F.col("text"))).alias("token"),
        )
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # count_if keeps tf and dl live so the tf exchange subtrees
    # canonicalize equal and AQE stage reuse runs the corpus explode
    # once — same idiom (and same pinned test) as tfidf_topk's df
    # branch. Both conditions are tautologies on tf rows (tf is a
    # count >= 1; dl is the token count of a doc that produced at
    # least one token, so >= 1 and never null).
    dfreq = tf.groupBy("token").agg(
        F.count_if(
            (F.col("tf") >= 1) & (F.col("dl") >= 1)
        ).alias("df")
    )
    scalars = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("__n"),
            (F.sum("dl") / F.count(F.lit(1))).alias("__avgdl"),
        )
    )
    idf_raw = (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    idf = F.log(idf_raw + 1.0) if mode == "log" else idf_raw
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    # rational mode: the BIGINT micro-unit sum is exact, then ONE
    # division — a double sum would be partial-aggregation-order-
    # dependent in the last ulp
    agg_score = (
        (F.sum(F.floor(idf * sat * 1e6).cast("long")) / F.lit(1e6))
        if mode == "rational"
        else F.sum(idf * sat)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(scalars)
        .join(qdf, "token")
        .groupBy("query_id", "doc_id")
        .agg(
            agg_score.alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id",
            F.round("score", 4).alias("score"),
            F.col("n_terms").cast("int").alias("n_terms"),
            "rank",
        )
    )


def oracle_bm25_topk(
    queries: dict[str, str],
    table: str = "documents",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_topk(mode="rational") — +,−,×,÷ only, so
    both engines produce bit-identical doubles."""
    norm = _sql_norm("text")

    def esc(s: str) -> str:
        return s.replace("'", "''")

    qrows = ", ".join(
        f"('{esc(qid)}', '{esc(t)}')"
        for qid, q in sorted(queries.items())
        for t in sorted(set(q.strip().split())) if t
    )
    if not qrows:
        raise ValueError(
            "oracle_bm25_topk: queries contain no non-empty terms"
        )
    return f"""
WITH qmap(query_id, token) AS (VALUES {qrows}),
dl AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split({norm}, ' '),
                t -> length(t) > 0)) AS BIGINT) AS dl
    FROM {table}
),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split({norm}, ' ')) AS token
          FROM {table})
    WHERE token IN (SELECT DISTINCT token FROM qmap)
    GROUP BY 1, 2
),
dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS __n,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS __avgdl
    FROM dl
),
scored AS (
    -- micro-unit BIGINT sum then one division: order-independent,
    -- bit-identical to the engine (see bm25_topk rational mode).
    -- The saturation term is parenthesized as ONE quotient so the
    -- operation tree is exactly Spark's idf * (num / den) * 1e6 —
    -- IEEE rounding is per-operation, so ((idf*num)/den) could differ
    -- in the last ulp and flip the floor(x*1e6) quantization.
    SELECT q.query_id, tf.doc_id,
           CAST(SUM(CAST(FLOOR(
               ((sc.__n - dfq.df + 0.5) / (dfq.df + 0.5))
               * ((tf.tf * ({k1} + 1))
                  / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / sc.__avgdl)))
               * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score,
           CAST(COUNT(*) AS INT) AS n_terms
    FROM tf
    JOIN dfq USING (token)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN sc
    JOIN qmap q ON q.token = tf.token
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, doc_id, ROUND(score, 4) AS score, n_terms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT query_id, doc_id, score, n_terms, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def vocab_sketches(
    docs: DataFrame, group_col: str = "source", lg_k: int = 12
) -> DataFrame:
    """Mergeable per-group vocabulary sketches: one Apache DataSketches
    HLL per ``group_col`` value over the token stream — the
    incremental-cardinality primitive ``vocab_stats``'s one-shot
    ``approx_count_distinct`` can't give. The sketch COLUMN is the
    product: persist it per corpus revision / shard / source, then
    union sketches instead of re-scanning text to answer "how many
    distinct tokens across these N revisions" (``merge_vocab_sketches``)
    — at 100 TB that's a KB-sized aggregate join versus a corpus
    re-read. ~0.8% relative error at the default lg_k=12 (4 KB per
    sketch); exact counts stay available via ``vocab_stats``.
    """
    return (
        docs.select(
            F.col(group_col).alias("group"),
            F.explode(_tokens(F.col("text"))).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy("group")
        .agg(
            F.hll_sketch_agg("token", F.lit(lg_k)).alias("sketch"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            "group", "sketch", "n_tokens",
            F.hll_sketch_estimate("sketch").alias("est_distinct"),
        )
    )


def merge_vocab_sketches(sketches: DataFrame) -> DataFrame:
    """Union previously-built vocabulary sketches (any subset of
    :func:`vocab_sketches` outputs — different sources, shards, or
    corpus revisions) into one combined-cardinality row WITHOUT
    touching the original text. The whole input is |groups| rows of
    KB-sized binaries; this runs in milliseconds regardless of the
    corpus size the sketches summarize."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "est_distinct_union"
        ),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.count(F.lit(1)).alias("n_sketches"),
    )


# ------------------------------------------------------------ bigram LM
def _bigram_pairs(docs: DataFrame, id_col: str | None = None) -> DataFrame:
    """Adjacent token pairs, generated ROW-LOCALLY: each document's
    token array zips with its own 1-shift inside one projection — no
    self-join, no window over the token stream.  The single shared
    pair shape behind :func:`bigram_lm` / :func:`bigram_counts` /
    :func:`lm_score` (tokenizer or pair-shape changes happen HERE,
    once)."""
    cols = [F.col(id_col)] if id_col else []
    toks = docs.select(
        *cols,
        F.filter(
            _tokens(F.col("text")), lambda t: F.length(t) > 0
        ).alias("__ts"),
    )
    n1 = F.greatest(F.size("__ts") - 1, F.lit(0))
    out_cols = [id_col] if id_col else []
    return toks.select(
        *out_cols,
        F.explode(
            F.zip_with(
                F.slice(F.col("__ts"), 1, n1),
                F.slice(F.col("__ts"), 2, n1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(*out_cols, "bg.w1", "bg.w2")


def bigram_lm(
    docs: DataFrame, top_k: int = 200, min_count: int = 2
) -> DataFrame:
    """Corpus bigram language model: the top-``top_k`` adjacent token
    pairs with their counts and conditional probability
    ``P(w2 | w1)`` — the cheapest corpus-level LM a curation pipeline
    can hold (n-gram quality scoring à la CCNet/KenLM, but computable
    in one Spark pass with exact-integer statistics; heavier KenLM
    scoring plugs in via llm/scoring.py:model_score).

    ONE text scan: each document's token array yields its adjacent
    pairs ROW-LOCALLY (zip of the array with its own 1-shift — no
    self-join, no window over the token stream), and the exploded
    pairs collapse immediately into (w1, w2) counts — the only
    shuffle, map-side combined, output bounded by the corpus's
    distinct-bigram vocabulary (≪ corpus at 100 TB).  Context counts
    are an aggregation OVER the pair table (vocabulary-sized, never
    the token stream twice); AQE broadcasts it into the join.

    ``cond_ppm = pair_count·1e6 div ctx_count`` is exact BIGINT
    arithmetic — bit-reproducible across engines and partitionings
    (the driver-gate discipline: no float aggregation anywhere).
    Ties in the top-k break (pair_count DESC, w1 ASC, w2 ASC) — a
    total order, so the LIMIT is deterministic.
    """
    # one-shot == counts + merge by definition: the incremental path
    # and this one CANNOT drift (merge≡whole-corpus pinned by pytest)
    return merge_bigram_counts(
        bigram_counts(docs), top_k=top_k, min_count=min_count
    )


def oracle_bigram_lm(
    table: str = "documents", top_k: int = 200, min_count: int = 2
) -> str:
    """DuckDB twin of :func:`bigram_lm` — all-integer statistics, so
    the driver's hash comparison is exact by construction."""
    norm = _sql_norm("text")
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split({norm}, ' '),
                       t -> length(t) > 0) AS ts
    FROM {table}
),
idx AS (
    SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks
),
bi AS (SELECT ts[i] AS w1, ts[i + 1] AS w2 FROM idx),
pair AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM bi GROUP BY 1, 2
),
ctx AS (
    SELECT w1, CAST(SUM(pair_count) AS BIGINT) AS ctx_count
    FROM pair GROUP BY 1
)
SELECT pair.w1, pair.w2, pair.pair_count, ctx.ctx_count,
       pair.pair_count * 1000000 // ctx.ctx_count AS cond_ppm
FROM pair JOIN ctx ON pair.w1 = ctx.w1
WHERE pair.pair_count >= {min_count}
ORDER BY pair.pair_count DESC, pair.w1 ASC, pair.w2 ASC
LIMIT {top_k}
"""


def lm_score(
    docs: DataFrame, lm: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score every document under a :func:`bigram_lm` table: mean
    conditional probability (ppm) over the document's adjacent
    bigrams, unseen bigrams scoring 0 — the classic cheap fluency /
    domain-fit signal (a document whose bigrams the corpus LM has
    never seen is either novel or garbage; pair with
    :func:`vocab_coverage` to tell which).

    The LM table is top-k-bounded by construction, so it rides a
    broadcast join against the document pair stream — the corpus
    never shuffles.  All-integer output: ``n_bigrams`` (total adjacent
    pairs), ``lm_hits`` (pairs found in the LM, with multiplicity),
    ``mean_cond_ppm = Σ cond_ppm·count div n_bigrams`` (0 for
    bigram-less documents).
    """
    pairs = _bigram_pairs(docs, id_col=id_col)
    per_doc = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    joined = per_doc.join(
        F.broadcast(lm.select("w1", "w2", "cond_ppm")),
        ["w1", "w2"],
        "left",
    )
    scored = joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(
            F.when(F.col("cond_ppm").isNotNull(), F.col("cnt"))
            .otherwise(F.lit(0))
        ).alias("lm_hits"),
        F.sum(
            F.coalesce(F.col("cond_ppm"), F.lit(0)) * F.col("cnt")
        ).alias("__tot"),
    )
    out = docs.select(id_col).join(scored, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("lm_hits", F.lit(0)).alias("lm_hits"),
        F.coalesce(
            F.expr("__tot div n_bigrams"), F.lit(0)
        ).alias("mean_cond_ppm"),
    )


def oracle_lm_score(
    table: str = "documents", top_k: int = 200, min_count: int = 2
) -> str:
    """DuckDB twin of :func:`lm_score` over :func:`oracle_bigram_lm`'s
    LM — exact-integer, shares the LM definition by construction."""
    norm = _sql_norm("text")
    lm = oracle_bigram_lm(table=table, top_k=top_k, min_count=min_count)
    return f"""
WITH lm AS ({lm}),
toks AS (
    SELECT doc_id,
           list_filter(string_split({norm}, ' '),
                       t -> length(t) > 0) AS ts
    FROM {table}
),
idx AS (
    SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks
),
bi AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2 FROM idx),
per_doc AS (
    SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bi GROUP BY 1, 2, 3
),
scored AS (
    SELECT p.doc_id,
           SUM(p.cnt) AS n_bigrams,
           SUM(CASE WHEN lm.cond_ppm IS NOT NULL THEN p.cnt
                    ELSE 0 END) AS lm_hits,
           SUM(COALESCE(lm.cond_ppm, 0) * p.cnt) AS tot
    FROM per_doc p
    LEFT JOIN lm ON p.w1 = lm.w1 AND p.w2 = lm.w2
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(s.lm_hits, 0) AS BIGINT) AS lm_hits,
       CAST(COALESCE(s.tot // s.n_bigrams, 0) AS BIGINT)
           AS mean_cond_ppm
FROM {table} d LEFT JOIN scored s USING (doc_id)
"""


def bigram_counts(docs: DataFrame) -> DataFrame:
    """The mergeable half of :func:`bigram_lm`: the full (w1, w2)
    count table with NO top-k cut — persist one per corpus revision /
    shard, then :func:`merge_bigram_counts` unions them into a
    combined LM without re-scanning text (the incremental-statistics
    pattern of vocab_sketches, exact instead of sketched: bigram
    count tables are vocabulary²-bounded, so exactness is
    affordable)."""
    return (
        _bigram_pairs(docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def merge_bigram_counts(
    counts: DataFrame, top_k: int = 200, min_count: int = 2
) -> DataFrame:
    """Union any number of :func:`bigram_counts` outputs (stacked with
    unionByName) into one :func:`bigram_lm`-shaped table — counts sum,
    contexts and conditional ppm recompute over the merged totals.
    The inputs are vocabulary-sized aggregates, so this runs in
    seconds regardless of how many corpus-bytes they summarize."""
    pair = counts.groupBy("w1", "w2").agg(
        F.sum("pair_count").alias("pair_count")
    )
    ctx = pair.groupBy(F.col("w1").alias("__c")).agg(
        F.sum("pair_count").alias("ctx_count")
    )
    lm = (
        pair.join(ctx, pair["w1"] == ctx["__c"])
        .drop("__c")
        .filter(F.col("pair_count") >= min_count)
        .withColumn(
            "cond_ppm", F.expr("pair_count * 1000000 div ctx_count")
        )
    )
    return (
        lm.orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
        .select("w1", "w2", "pair_count", "ctx_count", "cond_ppm")
    )


def length_percentiles(
    docs: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Exact token-length percentiles per group (p25/p50/p75/p95) by
    EXPLICIT rank selection — the distribution profile a curation run
    reads before setting token-window filters.  Both engines pick the
    element at ``rank = floor(p·(n−1)) + 1`` of the (length, doc_id)
    sort — a concrete member of the set with a total order, so the
    result is bit-identical across engines and partitionings
    (interpolating percentile definitions differ between engines;
    rank selection doesn't).  One window over per-group sorted
    lengths; groups are independent partitions, no global sort."""
    from pyspark.sql import Window

    # NULL text coalesces to '' BEFORE tokenizing: Spark's size(NULL)
    # is -1 (sorts first) while DuckDB's len(NULL) is NULL (sorts
    # last) — uncoalesced, one NULL document shifts every percentile
    # rank differently per engine. '' tokenizes to 0 on both.
    lens = docs.select(
        F.col(group_col).alias("grp"),
        "doc_id",
        F.size(
            F.filter(
                _tokens(F.coalesce(F.col("text"), F.lit(""))),
                lambda t: F.length(t) > 0,
            )
        ).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("grp").orderBy("n_tokens", "doc_id")
    ranked = lens.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    sel = {
        f"p{int(p * 100)}": F.max(
            F.when(
                F.col("rk")
                == F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1,
                F.col("n_tokens"),
            )
        ).alias(f"p{int(p * 100)}")
        for p in (0.25, 0.5, 0.75, 0.95)
    }
    return (
        ranked.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"), *sel.values()
        )
    )


def oracle_length_percentiles(
    table: str = "documents", group_col: str = "source"
) -> str:
    """DuckDB twin of :func:`length_percentiles` — same explicit rank
    selection (and the same NULL-text coalesce), so exact by
    construction."""
    norm = _sql_norm("COALESCE(text, '')")
    g = group_col
    cols = ", ".join(
        f"CAST(MAX(CASE WHEN rk = CAST(FLOOR({p} * (n - 1)) AS BIGINT) + 1 "
        f"THEN n_tokens END) AS BIGINT) AS p{int(p * 100)}"
        for p in (0.25, 0.5, 0.75, 0.95)
    )
    return f"""
WITH lens AS (
    SELECT {g} AS grp, doc_id,
           CAST(len(list_filter(string_split({norm}, ' '),
                t -> length(t) > 0)) AS BIGINT) AS n_tokens
    FROM {table}
),
ranked AS (
    SELECT grp, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY grp
                              ORDER BY n_tokens, doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY grp) AS n
    FROM lens
)
SELECT grp AS {g}, CAST(COUNT(*) AS BIGINT) AS n_docs, {cols}
FROM ranked GROUP BY 1
"""


# ------------------------------------------------------ structure stats

# (column, needle) — structural markers counted by replace-arithmetic:
# count = (len(s) - len(replace(s, needle, ''))) / len(needle). Both
# engines replace left-to-right non-overlapping, so the counts are
# exact and dialect-free (no regex in the plan at all).
STRUCTURE_NEEDLES = [
    ("code_fences", "```"),
    ("h1_headers", "\n# "),
    ("h2_headers", "\n## "),
    ("bullet_lines", "\n- "),
    ("table_rows", "\n| "),
    ("html_tags", "</"),
]


def structure_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document structural profile for mixing/filtering decisions
    (code vs prose vs tables vs residual HTML): exact occurrence
    counts of the ``STRUCTURE_NEEDLES`` markers plus line count and raw
    length. A corpus destined for a code-capable model wants documents
    WITH fences; a clean-prose mix wants ``html_tags = 0`` — both are
    one filter over this frame.

    Shape: single scan, join-free, all counts from replace-arithmetic
    on the text column (JVM codegen, BIGINT outputs — the PLANS.md §14
    integer-determinism rule applied to text forensics). At 100 TB
    this is scan-bound and composes into the shared-expression
    single-pass plan like text_stats."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def cnt(needle: str):
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(needle))))
            / len(needle)
        ).cast("long")

    cols = [cnt(n).alias(name) for name, n in STRUCTURE_NEEDLES]
    return docs.select(
        "doc_id",
        *cols,
        (F.length(t) - F.length(F.replace(t, F.lit("\n"))) + 1)
        .cast("long")
        .alias("n_lines"),
        F.length(t).cast("long").alias("n_chars_raw"),
    )


def oracle_structure_stats(
    table: str = "documents", text_expr: str = "COALESCE(text, '')"
) -> str:
    def cnt(needle: str) -> str:
        esc = needle.replace("\n", "' || chr(10) || '")
        return (
            f"(length({text_expr}) - length(replace({text_expr}, "
            f"'{esc}', ''))) // {len(needle)}"
        )

    cols = ",\n       ".join(
        f"{cnt(n)} AS {name}" for name, n in STRUCTURE_NEEDLES
    )
    return f"""
SELECT doc_id,
       {cols},
       (length({text_expr}) - length(replace({text_expr},
            chr(10), ''))) + 1 AS n_lines,
       length({text_expr}) AS n_chars_raw
FROM {table}
"""
