"""Input-parallelism guard shared by compute-dense operators.

Operators whose per-row cost is large (all-pairs cosine scoring,
per-character winnowing, Arrow kernels) get their parallelism from the
INPUT split, not from any shuffle they perform — a corpus packed into
few files (or a 1-file test fixture) silently serializes the whole
operator onto one core. ``spread_input`` widens an under-split source
to the cluster's default parallelism and no-ops when the file sharding
already provides the splits (the normal case at scale, where the
repartition's shuffle of raw bytes would be pure cost).

Measured on the 1-file sf0.1 fixtures: winnow fingerprints 12 s→1.7 s,
brute-force cosine pairs 27 s→2 s — the operators were single-task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to default parallelism iff its current split
    is narrower — the guard for compute-dense per-row operators.

    Streaming frames pass through untouched: ``.rdd`` is illegal on a
    streaming source, and a micro-batch's parallelism is the stream
    source's file/partition granularity anyway."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
