"""Skew-resilient aggregation patterns.

AQE splits skewed *join* partitions automatically, but a skewed
``groupBy`` key still funnels one key's stream through one task in the
final stage. For algebraic aggregates (sum/count/min/max) Spark's
map-side partial aggregation already absorbs the skew; the patterns
here cover the cases it can't:

* ``salted_count_distinct`` — exact distinct counts per key: the
  distinct set of a hot key is hash-split across ``salt`` sub-keys
  (partitioning by ``hash(value) % salt`` keeps each distinct value in
  exactly one sub-key, so the per-sub-key counts add up exactly), then
  summed. Two ordinary hash aggregations, no single-task hotspot.
* ``salted_collect_list`` — the same split for order-insensitive
  collect workloads whose per-key payload would overflow one task.

SURVEY §4 key decision 3 (skew: salting for the hot-rank groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str] | str,
    col: str,
    salt: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact ``COUNT(DISTINCT col)`` per key group, skew-split across
    ``salt`` sub-aggregations. Equivalent to
    ``df.groupBy(keys).agg(count_distinct(col))`` but the heavy first
    stage groups on ``(keys, hash(col) % salt)`` so a hot key fans out
    over ``salt`` tasks instead of one."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sub = F.pmod(F.hash(F.col(col)), F.lit(salt)).alias("__salt")
    return (
        df.groupBy(*keys, sub)
        .agg(F.count_distinct(F.col(col)).alias("__part"))
        .groupBy(*keys)
        .agg(F.sum("__part").cast("long").alias(out_col))
    )


def salted_collect_list(
    df: DataFrame,
    keys: list[str] | str,
    col: str,
    salt: int = 32,
    out_col: str = "values",
) -> DataFrame:
    """Per-key ``collect_list`` (order-insensitive) with the gather
    split over ``salt`` sub-keys, then flattened — bounds any single
    task's buffer to ~1/salt of the hottest key's payload."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sub = F.pmod(F.hash(F.col(col)), F.lit(salt)).alias("__salt")
    return (
        df.groupBy(*keys, sub)
        .agg(F.collect_list(F.col(col)).alias("__part"))
        .groupBy(*keys)
        .agg(F.flatten(F.collect_list("__part")).alias(out_col))
    )
