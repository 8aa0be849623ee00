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
    w = Window.partitionBy("shard").orderBy("doc_id")
    packed = base.withColumn(
        "pack_in_shard",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(context_len)
        ),
    )
    return packed.groupBy("shard", "pack_in_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


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
