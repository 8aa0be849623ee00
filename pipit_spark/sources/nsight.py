"""Nsight CSV source (reference pipit/readers/nsight_reader.py:1-111).

Nsight reports one row per *interval* with ``Start (ns)``/``End (ns)``;
the reference unpivots each row into an Enter and a Leave
(nsight_reader.py:58-77) and dense-renumbers PID/TID
(nsight_reader.py:29-56). Spark form: ``stack(2, ...)`` lateral unpivot
(one narrow pass, no shuffle) + ``dense_rank`` windows for renumbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import schema as S
from .csv_source import canonicalize


def read_nsight(spark: SparkSession, path: str, **options) -> DataFrame:
    df = spark.read.csv(path, header=True, inferSchema=True, **options)

    name_col = "Name" if "Name" in df.columns else df.columns[0]
    has_pid = "PID" in df.columns
    has_tid = "TID" in df.columns

    if has_pid:
        # dense renumber (nsight_reader.py:29-46); ranks are few → window
        # over a tiny distinct set would be ideal, but dense_rank over the
        # full frame is a single pass and AQE-coalesced.
        df = df.withColumn(
            "__process", F.dense_rank().over(Window.orderBy("PID")) - 1
        )
    else:
        df = df.withColumn("__process", F.lit(0))
    if has_tid:
        df = df.withColumn(
            "__thread",
            F.dense_rank().over(
                Window.partitionBy("__process").orderBy("TID")
            ) - 1,
        )

    df = df.withColumn("__seq", F.monotonically_increasing_id())

    # unpivot interval → Enter + Leave rows (nsight_reader.py:58-77)
    both = df.select(
        F.expr(
            "stack(2, 'Enter', cast(`Start (ns)` as long), "
            "'Leave', cast(`End (ns)` as long))"
        ).alias(S.EVENT_TYPE, S.TIMESTAMP),
        F.col(name_col).alias(S.NAME),
        F.col("__process").alias(S.PROCESS),
        *([F.col("__thread").alias(S.THREAD)] if has_tid else []),
        F.col("__seq").alias(S.SEQ),
    )
    both = both.withColumn(
        S.SEQ,
        F.col(S.SEQ) * 2 + F.when(F.col(S.EVENT_TYPE) == "Leave", 1).otherwise(0),
    ).withColumn(S.EVENT_ID, F.col(S.SEQ))
    return canonicalize(both)
