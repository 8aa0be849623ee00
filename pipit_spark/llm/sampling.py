"""Corpus sampling and sequence packing — the two remaining structural
operators of a training-data pipeline (after filtering and dedup):
pick a deterministic subset, then pack documents into fixed-token
context windows.

Both are pure built-in-expression plans (no UDFs) with exact DuckDB
twins, and both are sharded so no step ever needs a global ordering:

* sampling decides per-row from an md5 of the doc id — embarrassingly
  parallel, reproducible across engines and runs, and stratification
  is just a WHERE on the strata column;
* packing orders documents *within a hash shard* (`doc_id % n_shards`)
  and runs one window cumsum per shard — at 100 TB each shard is an
  independent partition-local sort, never a global one. Packs are keyed
  (shard, pack_in_shard) so ids stay stable as shards process in any
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import stats_exprs


def sample_corpus(
    docs: DataFrame, pct: int = 10, strata: str | None = None
) -> DataFrame:
    """Deterministic ~``pct``% sample: keep rows where the first 4 hex
    digits of md5(doc_id) fall under pct% of 0xFFFF. Optionally grouped
    by a ``strata`` column, returning kept-count + total tokens per
    stratum (the sanity numbers a sampling job reports)."""
    # lexicographic compare on the lowercase-hex md5 prefix is monotone
    # in its numeric value — portable to any engine without hex→int
    # conversion quirks
    thr = format(int(0xFFFF * pct / 100), "04x")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    kept = docs.filter(bucket < thr)
    if strata is None:
        return kept
    n_tokens = stats_exprs()["n_tokens"]
    return (
        kept.select(F.col(strata), n_tokens.alias("n_tokens"))
        .groupBy(strata)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def oracle_sample_corpus(
    table: str = "documents", pct: int = 10, strata: str = "source"
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    thr = format(int(0xFFFF * pct / 100), "04x")
    return f"""
SELECT {strata},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split({norm}, ' '))) AS BIGINT) AS total_tokens
FROM {table}
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thr}'
GROUP BY {strata}
"""


def _pack_window(
    base: DataFrame, order_cols: list[str], context_len: int
) -> DataFrame:
    """The first-token packing rule, shared by every packer: within a
    shard, rows in ``order_cols`` order are laid end-to-end and a row
    belongs to the pack its FIRST token lands in. One place owns the
    rule so doc-level and chunk-level packing cannot drift."""
    w = Window.partitionBy("shard").orderBy(*order_cols)
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.withColumn(
        "pack_in_shard", F.floor(before / F.lit(context_len))
    ).withColumn("__before", before)


def pack_sequences(
    docs: DataFrame,
    context_len: int = 512,
    n_shards: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: within each hash shard, documents in
    doc_id order are laid end-to-end and a document belongs to the pack
    its FIRST token lands in (``floor(cumsum_before / context_len)``) —
    the deterministic, join-free packing rule. Returns per-pack stats
    ``(shard, pack_in_shard, n_docs, total_tokens)``.

    One shuffle (by shard), one partition-local sort per shard — no
    global ordering anywhere, so the plan is identical at 500 rows and
    100 TB; shard count is the parallelism knob.

    ``tokens_col`` names a precomputed token-count column (e.g. from an
    upstream cleaning stage) — otherwise counts derive from ``text``."""
    n_tokens = (
        F.col(tokens_col) if tokens_col else stats_exprs()["n_tokens"]
    )
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    packed = _pack_window(base, ["doc_id"], context_len)
    return packed.groupBy("shard", "pack_in_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def pack_assignments(
    docs: DataFrame,
    context_len: int = 512,
    n_shards: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """The doc-level packing manifest a shard writer consumes:
    ``(doc_id, shard, pack_in_shard, offset_in_pack, n_tokens)`` under
    the same first-token rule as :func:`pack_sequences` (whose output
    is exactly this frame aggregated). Same single-shuffle shard-local
    cumsum plan; write it partitioned by ``shard`` and each writer task
    streams its packs in (pack_in_shard, offset) order."""
    n_tokens = (
        F.col(tokens_col) if tokens_col else stats_exprs()["n_tokens"]
    )
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    packed = _pack_window(base, ["doc_id"], context_len)
    return packed.select(
        "doc_id",
        "shard",
        "pack_in_shard",
        (F.col("__before") % F.lit(context_len)).cast("long").alias(
            "offset_in_pack"
        ),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def oracle_pack_assignments(
    table: str = "documents", context_len: int = 512, n_shards: int = 64
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    return f"""
WITH base AS (
    SELECT doc_id, doc_id % {n_shards} AS shard,
           len(string_split({norm}, ' ')) AS n_tokens
    FROM {table}
),
cum AS (
    SELECT doc_id, shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS before
    FROM base
)
SELECT doc_id, shard,
       CAST(FLOOR(before / {context_len}) AS BIGINT) AS pack_in_shard,
       CAST(before % {context_len} AS BIGINT) AS offset_in_pack,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM cum
"""


def oracle_pack_sequences(
    table: str = "documents", context_len: int = 512, n_shards: int = 64
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    return f"""
WITH base AS (
    SELECT doc_id, doc_id % {n_shards} AS shard,
           len(string_split({norm}, ' ')) AS n_tokens
    FROM {table}
),
packed AS (
    SELECT shard, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {context_len}) AS BIGINT) AS pack_in_shard
    FROM base
)
SELECT shard, pack_in_shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY shard, pack_in_shard
"""


def mix_sources(
    docs: DataFrame, temperature: float = 2.0, target_frac: float = 0.5
) -> DataFrame:
    """Temperature-based source mixing (the multi-corpus weighting step
    of LLM training-data assembly): source ``s`` with share ``p_s`` of
    the corpus is sampled at a rate ∝ ``p_s^(1/T)`` (T>1 flattens the
    mix toward small sources, T=1 keeps natural proportions), scaled so
    the expected kept fraction is ``target_frac`` and clamped at 1.

    Per-source rates derive from one tiny count aggregation that is
    broadcast back onto the corpus; the keep decision is the same
    deterministic md5-bucket rule as :func:`sample_corpus`, so the
    sample is reproducible across engines and runs (rates are rounded
    to 4 decimals before thresholding to keep float `pow` differences
    between engines from moving a bucket boundary). Returns kept-count
    + token totals per source.
    """
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__total"))
    weights = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "__n",
        F.pow(F.col("__n") / F.col("__total"), 1.0 / temperature).alias(
            "__w"
        ),
    )
    wsum = weights.agg(F.sum("__w").alias("__wsum"))
    rates = weights.crossJoin(F.broadcast(wsum)).select(
        "source",
        F.round(
            F.col("__w") / F.col("__wsum") * target_frac, 4
        ).alias("__rate"),
        "__n",
    )
    # per-doc keep rate for source s = (w_s/wsum)·target_frac·N/n_s,
    # clamped to 1 — expected total kept ≈ target_frac·N
    rates = rates.crossJoin(F.broadcast(total)).select(
        "source",
        F.least(
            F.round(
                F.col("__rate") * F.col("__total") / F.col("__n"), 4
            ),
            F.lit(1.0),
        ).alias("rate"),
    )
    thr = F.format_string(
        "%04x", F.floor(F.col("rate") * 0xFFFF).cast("int")
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    n_tokens = stats_exprs()["n_tokens"]
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < thr)
        .select("source", n_tokens.alias("n_tokens"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def oracle_mix_sources(
    table: str = "documents",
    temperature: float = 2.0,
    target_frac: float = 0.5,
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    return f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n FROM {table} GROUP BY source
),
tot AS (SELECT SUM(n) AS total FROM counts),
weights AS (
    SELECT source, n, POW(CAST(n AS DOUBLE) / total, 1.0 / {temperature})
           AS w
    FROM counts, tot
),
rates AS (
    SELECT source,
           LEAST(ROUND(ROUND(w / (SELECT SUM(w) FROM weights)
                             * {target_frac}, 4)
                       * (SELECT total FROM tot) / n, 4), 1.0) AS rate
    FROM weights
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split({norm}, ' '))) AS BIGINT) AS total_tokens
FROM {table} d JOIN rates r USING (source)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(FLOOR(r.rate * 65535) AS INT))
GROUP BY d.source
"""


def _budget_select(
    feats: DataFrame, order_col: str, budget_per_source: int
) -> DataFrame:
    """The greedy per-source budget rule, shared by every selector: in
    descending ``order_col`` order (doc_id tie-break), a document is
    kept iff the tokens BEFORE it fit the budget — so the budget may be
    exceeded by at most one document. One place owns the rule.

    TWO-STAGE, because the prefix sum is a window and a window can't
    split a hot source (one source dominating a 100 TB corpus = one
    task). Stage 1 prunes within (source, salt): a row's salted prefix
    is a subset of its global prefix (tokens are non-negative), so
    ``local_before >= budget`` already proves ``global_before >=
    budget`` — survivors are a subset of the salted candidates, and
    each salt keeps at most ``budget`` docs (every doc has >= 1
    token). Stage 2 runs the EXACT global rule on the <= 64·budget
    candidates per source — a bounded window regardless of corpus
    size. Results identical to the single-window form."""
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64))
    w1 = Window.partitionBy("source", salt).orderBy(
        F.col(order_col).desc(), F.col("doc_id").asc()
    )
    cand = feats.withColumn(
        "__lb", F.sum("n_tokens").over(w1) - F.col("n_tokens")
    ).filter(F.col("__lb") < budget_per_source).drop("__lb")
    w = Window.partitionBy("source").orderBy(
        F.col(order_col).desc(), F.col("doc_id").asc()
    )
    return cand.withColumn(
        "__before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).filter(F.col("__before") < budget_per_source)


def select_by_token_budget(
    docs: DataFrame, budget_per_source: int = 5000
) -> DataFrame:
    """Quality-first curriculum selection: within each source, take
    documents in descending quality order (doc_id tie-break) until the
    source's token budget is exhausted — a document is kept iff the
    tokens BEFORE it fit the budget (so the budget may be exceeded by
    at most one document, the standard greedy rule).

    Two-stage prefix sum (see :func:`_budget_select`): the salted
    first stage bounds what reaches the exact per-source window at
    64·budget candidates, so a source that dominates the corpus
    cannot funnel its whole row set through one task (AQE splits
    skewed JOINS, not windows — the single-window form had no
    escape hatch).
    """
    se = stats_exprs()
    feats = docs.select(
        "doc_id",
        "source",
        se["n_tokens"].alias("n_tokens"),
        se["quality_score"].alias("quality_score"),
    )
    return _budget_select(feats, "quality_score", budget_per_source).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )


def oracle_select_by_token_budget(
    table: str = "documents", budget_per_source: int = 5000
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    return f"""
WITH feats AS (
    SELECT doc_id, source,
           CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_tokens,
           ROUND(LEAST(CAST(len(string_split({norm}, ' ')) AS DOUBLE)
                       / 50.0, 1.0)
                 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '',
                                                     'g')) AS DOUBLE)
                          / length(text)), 6) AS quality_score
    FROM {table}
),
ranked AS (
    SELECT *,
           SUM(n_tokens) OVER (PARTITION BY source
                               ORDER BY quality_score DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens
               AS cum_before
    FROM feats
)
SELECT doc_id, source, n_tokens, quality_score
FROM ranked WHERE cum_before < {budget_per_source}
"""


def shuffle_corpus(docs: DataFrame, seed: int = 0) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    document gets a reproducible pseudo-random rank ``md5(seed:doc_id)``
    and a dense position within its hash shard. The order is stable
    across runs, engines, and partitionings — the property a training
    job needs to resume mid-epoch.

    Shape: shard by the top hex digits of the rank (so position is a
    partition-local window, never a global sort), position densely
    within the shard. Consumers read shards in shard order; at 100 TB
    each shard sorts independently and the output is
    write-partitionable by ``shard``.
    """
    ranked = docs.withColumn(
        "__rank",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
    ).withColumn(
        # first hex digit → 16 shards; rank order within a shard is
        # rank order globally for that shard's slice
        "shard", F.conv(F.substring("__rank", 1, 1), 16, 10).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__rank", "doc_id")
    return (
        ranked.withColumn("pos_in_shard", F.row_number().over(w))
        .select("doc_id", "shard", F.col("pos_in_shard").cast("long").alias("pos_in_shard"))
    )


def oracle_shuffle_corpus(table: str = "documents", seed: int = 0) -> str:
    return f"""
WITH ranked AS (
    SELECT doc_id, md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS rk
    FROM {table}
)
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(rk, 1, 1)) - 1 AS INT)
           AS shard,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY substr(rk, 1, 1) ORDER BY rk, doc_id
       ) AS BIGINT) AS pos_in_shard
FROM ranked
"""


def sample_exact_k(
    docs: DataFrame, k: int = 100, strata: str | None = None, seed: int = 0
) -> DataFrame:
    """Exactly ``k`` documents (per stratum when ``strata`` names a
    column), chosen by deterministic md5 rank — the reproducible
    equivalent of a reservoir sample. Strata smaller than ``k`` return
    whole.

    Unstratified: orderBy+limit (Catalyst's distributed partial
    top-k). Stratified: TWO-STAGE top-k, because a window over a hot
    stratum (one source dominating the corpus) would funnel the whole
    stratum through a single task — windows can't split a hot key.
    Stage 1 ranks within (stratum, salt) and keeps ≤ k per salt (the
    global top-k of a stratum is contained in the union of its salted
    top-k's — top-k distributes over any partition of the rows);
    stage 2 re-ranks the ≤ 64·k survivors per stratum, a bounded
    window regardless of corpus size. Results identical to the
    single-window form."""
    rank = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    if strata is None:
        return docs.withColumn("__r", rank).orderBy("__r").limit(k).drop("__r")
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64))
    w1 = Window.partitionBy(strata, salt).orderBy(rank, F.col("doc_id"))
    cand = (
        docs.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(strata).orderBy(rank, F.col("doc_id"))
    return (
        cand.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def oracle_sample_exact_k(
    table: str = "documents", k: int = 100, strata: str | None = None,
    seed: int = 0,
) -> str:
    rank = f"md5('{seed}:' || CAST(doc_id AS VARCHAR))"
    if strata is None:
        return f"SELECT * FROM {table} ORDER BY {rank} LIMIT {k}"
    return f"""
SELECT * EXCLUDE (__rn) FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {strata} ORDER BY {rank}, doc_id
    ) AS __rn
    FROM {table}
) WHERE __rn <= {k}
"""


def _hex_threshold(hi: int) -> str:
    """4-hex-digit upper bound for the lexicographic bucket compare.
    A bound of 0x10000 would format to the 5-char '10000', which sorts
    BELOW most 4-char buckets and inverts the comparison — 'g' sorts
    above every hex digit, so it is the exact 'matches everything'
    sentinel."""
    return "g" if hi >= 0x10000 else format(hi, "04x")


def split_corpus(
    docs: DataFrame,
    val_pct: float = 5.0,
    test_pct: float = 5.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: the first 4 hex
    digits of md5(seed:doc_id) partition [0, 0xFFFF] into three ranges.
    Row-local (no shuffle, no sampling state), reproducible across
    engines/runs/partitionings, and stable under corpus growth — a
    document's split never changes when other documents are added,
    which is what keeps eval sets honest across dataset versions."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct > 100:
        raise ValueError(
            f"val_pct={val_pct} / test_pct={test_pct} must be >= 0 and "
            "sum to <= 100"
        )
    # lexicographic compare on the fixed-width lowercase-hex prefix is
    # monotone — the module-wide idiom (sample_corpus); no hex->int
    # conversion to keep engine-portable. concat (not concat_ws): NULL
    # doc_id must propagate to a NULL bucket -> 'train' on BOTH engines
    # (concat_ws would silently hash the bare seed on the Spark side).
    bucket = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
        1, 4,
    )
    val_hi = _hex_threshold(int(0x10000 * val_pct / 100.0))
    test_hi = _hex_threshold(
        int(0x10000 * val_pct / 100.0)
        + int(0x10000 * test_pct / 100.0)
    )
    return docs.withColumn(
        "split",
        F.when(bucket < val_hi, "val")
        .when(bucket < test_hi, "test")
        .otherwise("train"),
    )


def oracle_split_corpus(
    val_pct: float = 5.0, test_pct: float = 5.0, seed: int = 0,
    table: str = "documents",
) -> str:
    val_hi = _hex_threshold(int(0x10000 * val_pct / 100.0))
    test_hi = _hex_threshold(
        int(0x10000 * val_pct / 100.0)
        + int(0x10000 * test_pct / 100.0)
    )
    return f"""
SELECT *,
       CASE
         WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 4)
              < '{val_hi}' THEN 'val'
         WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 4)
              < '{test_hi}' THEN 'test'
         ELSE 'train'
       END AS split
FROM {table}
"""


def length_buckets(
    docs: DataFrame,
    boundaries: tuple[int, ...] = (64, 256, 1024, 4096),
    tokens_col: str | None = None,
) -> DataFrame:
    """Length-bucketed batching manifest: assign each document the
    smallest bucket whose boundary holds its token count (the padding
    -efficiency trick — batching same-bucket sequences wastes at most
    boundary/next-boundary of compute instead of max-doc-length). Pure
    row-local expression + one small per-bucket summary aggregate is
    left to the caller; output is (doc_id, n_tokens, bucket) with
    bucket = the boundary value, or 0 for docs beyond the largest
    (caller policy: truncate or drop)."""
    from .text import _tokens

    n = (
        F.col(tokens_col)
        if tokens_col
        else F.size(_tokens(F.coalesce(F.col("text"), F.lit(""))))
    ).cast("long")
    expr = F.lit(0).cast("long")
    for b in sorted(boundaries, reverse=True):
        expr = F.when(n <= b, F.lit(b).cast("long")).otherwise(expr)
    return docs.select(
        "doc_id", n.alias("n_tokens"), expr.alias("bucket")
    )


def oracle_length_buckets(
    boundaries: tuple[int, ...] = (64, 256, 1024, 4096),
    table: str = "documents",
) -> str:
    norm = "regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g')"
    n = f"CAST(len(string_split({norm}, ' ')) AS BIGINT)"
    case = "CAST(0 AS BIGINT)"
    for b in sorted(boundaries, reverse=True):
        case = f"CASE WHEN {n} <= {b} THEN CAST({b} AS BIGINT) ELSE {case} END"
    return f"""
SELECT doc_id, {n} AS n_tokens, {case} AS bucket
FROM {table}
"""


def _hashed_ngram_bucket(gram_col, buckets: int):
    """Engine-portable feature hash: first 6 md5 hex chars → int →
    mod buckets (DuckDB mirrors with CAST('0x'||substr(md5(g),1,6) AS
    BIGINT) — verified bit-identical)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram_col), 1, 6), 16, 10).cast("long"),
        F.lit(buckets),
    )


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    n: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169,
    re-expressed relationally): featurize text as hashed word
    ``n``-grams into ``buckets`` buckets, estimate smoothed bucket
    distributions over the raw corpus and the (small) target corpus,
    and score every raw document by its mean log importance ratio
    log(p_target/p_raw) — documents that look like the target domain
    score high and get up-weighted in selection.

    Scale shape: both distributions are aggregates BOUNDED by
    ``buckets`` (map-side combined, then broadcast as one joined
    ratio table), so the corpus is scanned once for its distribution
    and once for scoring, never shuffled; the target corpus is small
    by definition. Output: (doc_id, dsir_logweight, n_features) with
    NULL weight for featureless (empty) documents.
    """
    from .text import _tokens

    def grams(frame):
        toked = frame.select(
            "doc_id",
            _tokens(F.coalesce(F.col("text"), F.lit(""))).alias("__t"),
        )
        pos = toked.select(
            "doc_id",
            "__t",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("__t") - n + 1, F.lit(1))
                )
            ).alias("p"),
        )
        return pos.select(
            "doc_id",
            _hashed_ngram_bucket(
                F.concat_ws(" ", F.slice("__t", F.col("p"), F.lit(n))),
                buckets,
            ).alias("bucket"),
        )

    raw = grams(docs)
    tgt = grams(target_docs)
    raw_dist = raw.groupBy("bucket").agg(F.count("*").alias("__rc"))
    tgt_dist = tgt.groupBy("bucket").agg(F.count("*").alias("__tc"))
    raw_tot = raw_dist.agg(F.sum("__rc").alias("__rt"))
    tgt_tot = tgt_dist.agg(F.sum("__tc").alias("__tt"))
    ratio = (
        raw_dist.join(tgt_dist, "bucket", "full_outer")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("__tt") + F.lit(smoothing) * F.lit(buckets))
                )
                - F.log(
                    (F.coalesce(F.col("__rc"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("__rt") + F.lit(smoothing) * F.lit(buckets))
                )
            ).alias("__lr"),
        )
    )
    scored = (
        raw.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("__lr"), 6).alias("dsir_logweight"),
            F.count("*").cast("bigint").alias("n_features"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left")


def oracle_dsir_weights(
    table: str = "documents",
    target_pred: str = "doc_id < 50",
    n: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> str:
    """DuckDB mirror: identical tokenization, n-gram slicing, md5
    bucket hash, smoothing, and rounding; the target corpus is the
    ``target_pred`` slice of the same table (as the gate pins it)."""
    from .text import _sql_norm

    norm = _sql_norm("text")

    def grams(pred):
        return f"""
    SELECT doc_id,
           CAST(concat('0x', substr(md5(array_to_string(
                list_slice(t, p, p + {n} - 1), ' ')), 1, 6)) AS BIGINT)
               % {buckets} AS bucket
    FROM (
        SELECT doc_id, t,
               unnest(range(1, GREATEST(len(t) - {n} + 1, 1) + 1)) AS p
        FROM (SELECT doc_id, string_split(COALESCE({norm}, ''), ' ') AS t
              FROM {table} WHERE {pred})
    )"""

    return f"""
WITH raw AS ({grams('TRUE')}),
tgt AS ({grams(target_pred)}),
raw_dist AS (SELECT bucket, COUNT(*) AS rc FROM raw GROUP BY bucket),
tgt_dist AS (SELECT bucket, COUNT(*) AS tc FROM tgt GROUP BY bucket),
raw_tot AS (SELECT SUM(rc) AS rt FROM raw_dist),
tgt_tot AS (SELECT SUM(tc) AS tt FROM tgt_dist),
ratio AS (
    SELECT COALESCE(r.bucket, g.bucket) AS bucket,
           LN((COALESCE(g.tc, 0) + {smoothing})
              / (tgt_tot.tt + {smoothing} * {buckets}))
           - LN((COALESCE(r.rc, 0) + {smoothing})
                / (raw_tot.rt + {smoothing} * {buckets})) AS lr
    FROM raw_dist r
    FULL OUTER JOIN tgt_dist g ON r.bucket = g.bucket
    CROSS JOIN raw_tot CROSS JOIN tgt_tot
),
scored AS (
    SELECT raw.doc_id, ROUND(AVG(ratio.lr), 6) AS dsir_logweight,
           CAST(COUNT(*) AS BIGINT) AS n_features
    FROM raw JOIN ratio ON raw.bucket = ratio.bucket
    GROUP BY raw.doc_id
)
SELECT d.doc_id, s.dsir_logweight, s.n_features
FROM {table} d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""




def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Sliding token-window chunking — the step between cleaning and
    packing when documents exceed the context window: each doc becomes
    ``ceil((n - overlap) / stride)`` chunks of ``chunk_tokens``
    whitespace tokens, consecutive chunks sharing ``overlap`` tokens
    (stride = chunk_tokens - overlap); the final chunk is short rather
    than padded.

    Pure built-in expressions (split → sequence → explode → slice →
    array_join): narrow, no shuffle, no UDF — per-row work at 100 TB.
    Tokenization is the engine-wide whitespace normalizer
    (:func:`..text._tokens`) so chunk boundaries agree with every other
    token count in the library and with the DuckDB twin.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from .text import _tokens

    stride = chunk_tokens - overlap
    toks = _tokens(F.col("text"))
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", toks.alias("__t")
    )
    n = F.size(F.col("__t"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int")
    )
    exploded = base.select(
        "doc_id",
        "__t",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("__t"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def oracle_chunk_documents(
    table: str = "documents", chunk_tokens: int = 64, overlap: int = 16
) -> str:
    from .text import _sql_norm

    norm = _sql_norm("text")
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
    SELECT doc_id, string_split({norm}, ' ') AS t
    FROM {table} WHERE text IS NOT NULL
),
meta AS (
    SELECT doc_id, t,
           GREATEST(1, CAST(CEIL((len(t) - {overlap}) / {stride}.0) AS INT))
               AS n_chunks
    FROM toks
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       array_to_string(t[i*{stride}+1 : i*{stride}+{chunk_tokens}], ' ')
           AS chunk_text,
       CAST(len(t[i*{stride}+1 : i*{stride}+{chunk_tokens}]) AS BIGINT)
           AS n_tokens
FROM meta, UNNEST(range(0, n_chunks)) AS u(i)
"""


def select_by_dsir(
    docs: DataFrame,
    target_docs: DataFrame,
    budget_per_source: int = 5000,
    n: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Domain-targeted curriculum selection — the DSIR paper's actual
    end use: rank the raw corpus by importance weight toward a target
    domain and keep, per source, the highest-weight documents within a
    token budget (greedy rule of :func:`select_by_token_budget`, keyed
    on the DSIR score instead of the heuristic quality score).

    Plan: the bounded bucket-ratio table scores the corpus in one scan
    (:func:`dsir_weights`), the per-doc token count rides the same
    projection, and the budget window is one shuffle by source — the
    corpus text itself is never shuffled.
    """
    w = dsir_weights(
        docs, target_docs, n=n, buckets=buckets, smoothing=smoothing
    )
    se = stats_exprs()
    feats = docs.select(
        "doc_id", "source", se["n_tokens"].alias("n_tokens")
    ).join(w.select("doc_id", "dsir_logweight"), "doc_id")
    return _budget_select(feats, "dsir_logweight", budget_per_source).select(
        "doc_id", "source", "n_tokens", "dsir_logweight"
    )


def oracle_select_by_dsir(
    table: str = "documents",
    target_pred: str = "doc_id < 50",
    budget_per_source: int = 5000,
    n: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> str:
    from .text import _sql_norm

    w = oracle_dsir_weights(
        table, target_pred=target_pred, n=n, buckets=buckets,
        smoothing=smoothing,
    )
    norm = _sql_norm("text")
    return f"""
WITH w AS ({w}),
feats AS (
    SELECT doc_id, source,
           CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_tokens
    FROM {table}
),
j AS (
    SELECT f.doc_id, f.source, f.n_tokens, w.dsir_logweight
    FROM feats f JOIN w USING (doc_id)
),
cum AS (
    SELECT *,
           SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY dsir_logweight DESC, doc_id ASC
           ) - n_tokens AS before
    FROM j
)
SELECT doc_id, source, n_tokens, dsir_logweight
FROM cum WHERE before < {budget_per_source}
"""


def perplexity_buckets(
    docs: DataFrame,
    top_k: int = 50_000,
    head: tuple[int, int] = (1, 3),
    middle: tuple[int, int] = (2, 3),
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail quality buckets (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): per language, rank documents by LM fluency (their
    perplexity, sign-flipped — the engine's unigram
    :func:`~pipit_spark.llm.text.fluency_score`) and cut the ranking at
    fractions of the CUMULATIVE TOKEN MASS, not document count — the
    head bucket is "the most fluent third of the tokens", which is what
    a training-data budget actually buys.

    Determinism: boundaries compare exact integers —
    ``cum_tokens · q ≤ p · total_tokens`` for fraction p/q — never a
    float share, so the bucket labels are engine- and
    partitioning-independent (ranking ties break by doc_id).

    Scale shape: fluency's frequency table is top-K-capped and
    broadcasts; the ranking is ONE window per language over
    (doc_id, fluency, n_tokens)-width rows — the same per-language sort
    CCNet itself performs, with single-language skew bounded by that
    narrow payload. Returns
    ``(doc_id, lang, fluency, n_scored_tokens, bucket)``.
    """
    from .text import fluency_score

    scored = fluency_score(docs, top_k=top_k)
    j = docs.select("doc_id", F.col(lang_col).alias("lang")).join(
        scored, "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("fluency"), F.asc("doc_id")
    )
    wt = Window.partitionBy("lang")
    cum = j.withColumn(
        "__cum", F.sum("n_scored_tokens").over(w)
    ).withColumn("__total", F.sum("n_scored_tokens").over(wt))
    hp, hq = head
    mp, mq = middle
    return cum.select(
        "doc_id",
        "lang",
        "fluency",
        "n_scored_tokens",
        F.when(
            F.col("__cum") * F.lit(hq) <= F.lit(hp) * F.col("__total"),
            "head",
        )
        .when(
            F.col("__cum") * F.lit(mq) <= F.lit(mp) * F.col("__total"),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )


def oracle_perplexity_buckets(
    table: str = "documents",
    top_k: int = 50_000,
    head: tuple[int, int] = (1, 3),
    middle: tuple[int, int] = (2, 3),
) -> str:
    from .text import oracle_fluency_score

    hp, hq = head
    mp, mq = middle
    fl = oracle_fluency_score(table=table, top_k=top_k).strip()
    return f"""
WITH fl AS ({fl}),
j AS (
    SELECT d.doc_id, d.lang, fl.fluency, fl.n_scored_tokens
    FROM {table} d JOIN fl USING (doc_id)
),
cum AS (
    SELECT *,
           SUM(n_scored_tokens) OVER (
               PARTITION BY lang ORDER BY fluency DESC, doc_id ASC
           ) AS cum_toks,
           SUM(n_scored_tokens) OVER (PARTITION BY lang) AS total_toks
    FROM j
)
SELECT doc_id, lang, fluency, n_scored_tokens,
       CASE WHEN cum_toks * {hq} <= {hp} * total_toks THEN 'head'
            WHEN cum_toks * {mq} <= {mp} * total_toks THEN 'middle'
            ELSE 'tail' END AS bucket
FROM cum
"""
