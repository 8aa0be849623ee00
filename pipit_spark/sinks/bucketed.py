"""Bucketed-table persistence for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join (events ⋈ events,
documents ⋈ pair-table, lineitem ⋈ orders) is the shuffle of both sides.
Bucketing pre-shuffles ONCE at write time: each side is hash-partitioned
into ``num_buckets`` files per partition on the join key and recorded in
the session catalog, so every later join or aggregation on that key
reads co-located buckets and plans with **no Exchange on either side**
(`spark.sql.sources.bucketing.enabled`, on by default). Sorting within
buckets additionally removes the Sort under a sort-merge join.

This is the persistence-layer counterpart of SURVEY §4's design rule
"partition by (Process, Thread)" — the same idea for keys that outlive
one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str] | str,
    num_buckets: int = 64,
    sort_keys: list[str] | str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table in the session catalog. ``num_buckets`` should be
    sized so one bucket of one input split fits an executor core
    (rule of thumb at scale: total size / num_buckets ≈ 128–512 MB).
    """
    keys = [bucket_keys] if isinstance(bucket_keys, str) else list(bucket_keys)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *keys
    )
    if sort_keys:
        sk = [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
        w = w.sortBy(*sk)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along, so downstream
    joins/aggregations on the bucket key skip their Exchange."""
    return spark.table(table)
