"""CSV source for canonical-schema traces (reference pipit/trace.py:69-97).

Accepts both the reference's pipit-style headers (``Timestamp (s)`` /
``Timestamp (ns)``, ``Event Type``, ``Name``, ``Process``, optional
``Thread``, ``Attributes``) and already-canonical snake_case headers.
Seconds are converted to ns (×1e9, pipit/trace.py:74-78); the file's row
order becomes the ``seq`` tie-breaker (replacing the pandas index,
pipit/trace.py:92-95); ``event_id`` is assigned stably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S

_PIPIT_RENAMES = {
    "Timestamp (ns)": S.TIMESTAMP,
    "Event Type": S.EVENT_TYPE,
    "Name": S.NAME,
    "Process": S.PROCESS,
    "Thread": S.THREAD,
    "Attributes": S.ATTRIBUTES,
}


def canonicalize(df: DataFrame) -> DataFrame:
    """Rename/convert a raw frame to the canonical events schema and
    assign ``event_id``/``seq`` in source order."""
    for old, new in _PIPIT_RENAMES.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    # seconds → ns (reference pipit/trace.py:74-78)
    sec_cols = [c for c in df.columns if c.strip() == "Timestamp (s)"]
    if sec_cols:
        df = df.withColumn(
            S.TIMESTAMP,
            (F.col(f"`{sec_cols[0]}`").cast("double") * F.lit(1e9)).cast("long"),
        ).drop(sec_cols[0])
    df = df.withColumn(S.TIMESTAMP, F.col(S.TIMESTAMP).cast("long"))
    df = df.withColumn(S.PROCESS, F.col(S.PROCESS).cast("int"))
    if S.THREAD in df.columns:
        df = df.withColumn(S.THREAD, F.col(S.THREAD).cast("int"))
    for c in (S.EVENT_TYPE, S.NAME):
        df = df.withColumn(c, F.trim(F.col(c)))

    # monotonically_increasing_id is increasing in file order within and
    # across input partitions → a stable per-location tie-breaker, the
    # Spark replacement for pandas positional index identity
    # (pipit/trace.py:180-184).
    if S.SEQ not in df.columns:
        df = df.withColumn(S.SEQ, F.monotonically_increasing_id())
    if S.EVENT_ID not in df.columns:
        df = df.withColumn(S.EVENT_ID, F.col(S.SEQ))

    # attributes is part of the canonical schema — synthesize a null map
    # when the source lacks it so downstream operators (comm suite)
    # resolve without branching on presence
    if S.ATTRIBUTES not in df.columns:
        df = df.withColumn(
            S.ATTRIBUTES, F.lit(None).cast("map<string,string>")
        )

    core = [S.EVENT_ID, S.TIMESTAMP, S.SEQ, S.EVENT_TYPE, S.NAME, S.PROCESS]
    if S.THREAD in df.columns:
        core.append(S.THREAD)
    core.append(S.ATTRIBUTES)
    extras = [c for c in df.columns if c not in core]
    return df.select(*core, *extras)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    raw = spark.read.csv(
        path, header=True, inferSchema=True, ignoreLeadingWhiteSpace=True,
        ignoreTrailingWhiteSpace=True, **options
    )
    # strip stray header whitespace (the reference fixture has
    # "Timestamp (s), Event Type, ..." with leading spaces)
    for c in raw.columns:
        if c != c.strip():
            raw = raw.withColumnRenamed(c, c.strip())
    return canonicalize(raw)
