"""Distributed Bloom filter over a DataFrame column.

Spark ships a BloomFilter sketch (``DataFrameStatFunctions.bloomFilter``
and the runtime bloom-join filter) but neither is reachable from PySpark
expressions in this build (``bloom_filter_agg`` is not a registered SQL
routine), so this module builds the same structure out of relational
primitives:

- **build**: k bit positions per row, all computed JVM-side as
  ``pmod(xxhash64(col, lit(i)), m)`` — no Python hashing. Positions fold
  into m/64 words via one ``bit_or`` aggregation; after map-side combine
  the shuffle carries at most ``min(k*n, m/64)`` tiny (word, mask) rows,
  and the compact word table (m/64 longs — 16 KiB of rows at m = 2^20)
  collects into a numpy bitmap on the driver.
- **probe**: the bitmap broadcasts; a vectorized Arrow UDF tests the
  same k JVM-computed positions per row.

Standard Bloom guarantees: NO false negatives (membership of every
inserted value always reports True — the exactness-preserving property
pre-filters rely on), tunable false positives ≈ ``(1 - e^(-kn/m))^k``.

The 100 TB shape this enables: an incremental batch probing a bounded
seen-set filter locally (map-side, zero shuffle) so only the
``might-contain`` sliver reaches the exact anti-join — see
``llm.pipeline.incremental_new_docs(method="bloom")``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


@dataclass
class BloomBitmap:
    """A built filter: the bit array plus the hash-family parameters
    that must match between build and probe."""

    words: np.ndarray  # uint64, length num_bits // 64
    num_bits: int
    num_hashes: int
    _bc: object = field(default=None, repr=False)

    def broadcast(self, spark):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.words)
        return self._bc

    @property
    def set_bits(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())

    def fp_rate(self) -> float:
        """Empirical false-positive rate from the realized bit density
        (tighter than the n-based formula when inserts collide)."""
        return float((self.set_bits / self.num_bits) ** self.num_hashes)


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # per-hash literal salt varies xxhash64's input, giving k independent
    # draws; pmod keeps positions in [0, m) for negative hashes
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> BloomBitmap:
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # SQL form: F.shiftleft only accepts a literal shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    arr = np.zeros(num_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["word_idx"]] = r["word"]
    return BloomBitmap(arr.view(np.uint64), num_bits, num_hashes)


def might_contain(bloom: BloomBitmap, col: Column, spark) -> Column:
    """Boolean column: could ``col``'s value have been inserted?

    Hashing stays JVM-side (the same salted-xxhash64 family as the
    build); the Arrow UDF only gathers bits from the broadcast bitmap —
    a (batch × k) numpy index + shift, no per-row Python.
    """
    bc = bloom.broadcast(spark)
    k = np.uint64(63)

    @F.pandas_udf(T.BooleanType())
    def probe(ps: pd.Series) -> pd.Series:
        w = bc.value
        mat = np.stack(ps.to_numpy()).astype(np.uint64)  # (n, num_hashes)
        bits = (w[(mat >> np.uint64(6)).astype(np.int64)] >> (mat & k)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return probe(F.array(*_positions(col, bloom.num_bits, bloom.num_hashes)))


def save_bloom(bloom: BloomBitmap, spark, table: str) -> None:
    """Persist a built filter as a one-row catalog table (words +
    hash-family parameters) — the seen-set summary an incremental
    ingest job carries BETWEEN runs: KBs per corpus revision, loaded
    in milliseconds, instead of re-scanning the corpus to rebuild the
    filter every batch."""
    spark.createDataFrame(
        [(
            [int(w) for w in bloom.words.view(np.int64)],
            bloom.num_bits,
            bloom.num_hashes,
        )],
        "words array<long>, num_bits long, num_hashes int",
    ).write.mode("overwrite").saveAsTable(table)


def load_bloom(spark, table: str) -> BloomBitmap:
    """Load a :func:`save_bloom` filter ready for
    :func:`might_contain` — the probe job never touches the corpus
    the filter summarizes."""
    r = spark.table(table).collect()[0]
    arr = np.array(r["words"], dtype=np.int64).view(np.uint64)
    return BloomBitmap(arr, int(r["num_bits"]), int(r["num_hashes"]))


def merge_blooms(a: BloomBitmap, b: BloomBitmap) -> BloomBitmap:
    """Union two filters built with IDENTICAL parameters (bitwise OR
    of the bit arrays): membership in either input survives — so
    per-shard / per-revision filters build independently and combine
    without any rescan. The no-false-negative guarantee composes:
    the union can only over-approximate."""
    if (a.num_bits, a.num_hashes) != (b.num_bits, b.num_hashes):
        raise ValueError(
            "merge_blooms: filters must share num_bits/num_hashes "
            f"(got {a.num_bits}/{a.num_hashes} vs {b.num_bits}/{b.num_hashes})"
        )
    return BloomBitmap(a.words | b.words, a.num_bits, a.num_hashes)
