"""Composed training-data cleaning pipeline.

The north-star use case: take a raw document corpus and produce the
cleaned training set — language filter, quality filter, exact dedup —
as ONE lazy DataFrame plan. Each stage is an existing first-class
operator (:mod:`pipit_spark.llm.text`, :mod:`pipit_spark.llm.dedup`);
composing them stays declarative, so Catalyst collapses the whole
pipeline into a handful of stages:

* the three per-document feature sets (stats, language scores,
  fingerprint) are all narrow projections over the same scan — Catalyst
  fuses them into one pass over the text (no join materializes: the
  "joins" below are on ``doc_id`` against projections of the SAME scan,
  which the self-join planner turns into a single read at scale when
  the corpus is bucketed by ``doc_id``; even unbucketed it is one
  shuffle per side of ~3 small columns, never the text);
* the dedup keep-first rule is the usual min-id-per-fingerprint
  aggregation + semi join — one shuffle on the 32-byte fingerprint.

At 100 TB the dominant cost is the text scan; this plan reads the text
exactly twice (feature pass + fingerprint pass share the scan via
column pruning) and shuffles only ``(doc_id, fingerprint, 3 numerics)``
rows, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import (
    lang_id,
    oracle_doc_fingerprint,
    oracle_lang_id,
    oracle_text_stats,
    text_stats,
)


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """Cleaned corpus: predicted-``lang`` documents inside the token
    window with quality ≥ ``min_quality``, exact-deduped keep-first
    (min ``doc_id`` per normalized-text fingerprint *within the
    surviving set* — dedup runs after the filters, the cheap order).

    Returns ``(doc_id, n_tokens, quality_score)`` for the survivors.
    """
    stats = text_stats(docs)
    langs = lang_id(docs).select("doc_id", "pred_lang")
    keep = (
        stats.join(langs, "doc_id")
        .filter(
            (F.col("pred_lang") == lang)
            & F.col("n_tokens").between(min_tokens, max_tokens)
            & (F.col("quality_score") >= min_quality)
        )
        .select("doc_id", "n_tokens", "quality_score")
    )
    fp = docs.select(
        "doc_id",
        F.md5(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    )
    kfp = keep.join(fp, "doc_id")
    reps = kfp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return kfp.join(reps, ["fingerprint", "doc_id"]).select(
        "doc_id", "n_tokens", "quality_score"
    )


def oracle_clean_corpus(
    table: str = "documents",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> str:
    """DuckDB twin of :func:`clean_corpus`, composed from the same
    per-stage oracles so any drift in a stage shows up here too."""
    return f"""
WITH stats AS ({oracle_text_stats(table)}),
langs AS ({oracle_lang_id(table)}),
fp AS ({oracle_doc_fingerprint(table)}),
keep AS (
    SELECT s.doc_id, s.n_tokens, s.quality_score
    FROM stats s JOIN langs l USING (doc_id)
    WHERE l.pred_lang = '{lang}'
      AND s.n_tokens BETWEEN {min_tokens} AND {max_tokens}
      AND s.quality_score >= {min_quality}
),
kfp AS (SELECT k.*, f.fingerprint FROM keep k JOIN fp f USING (doc_id)),
reps AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM kfp GROUP BY fingerprint)
SELECT k.doc_id, k.n_tokens, k.quality_score
FROM kfp k JOIN reps r ON k.fingerprint = r.fingerprint AND k.doc_id = r.doc_id
"""
