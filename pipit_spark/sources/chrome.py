"""Chrome Tracing JSON source — the inverse of
:mod:`pipit_spark.sinks.chrome`, so traces exported for the Chrome
viewer (by this engine or any other tool emitting the trace-event
format) round-trip back into the canonical events schema.

Accepts both layouts the sink produces: a single JSON array file
(``multiLine``) and a directory of JSONL part files. Phase mapping is
the sink's inverse (``B``→Enter, ``E``→Leave, everything else→Instant
— complete-event ``X`` rows are split upstream by the emitting tool,
matching the reference's Enter/Leave model), µs→ns, and
``event_id``/``seq`` are re-assigned in file order via
:func:`pipit_spark.sources.csv_source.canonicalize`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S
from .csv_source import canonicalize


def read_chrome(
    spark: SparkSession, path: str, multi_line: bool | None = None
) -> DataFrame:
    """Read Chrome trace events at ``path`` into the canonical events
    frame. ``multi_line=None`` auto-detects: a lone ``.json`` file is
    assumed to be one JSON array (the viewer format); a directory is
    read as JSONL part files."""
    import os

    if multi_line is None:
        multi_line = os.path.isfile(path)
    reader = spark.read
    if multi_line:
        reader = reader.option("multiLine", "true")
    raw = reader.json(path)

    etype = (
        F.when(F.col("ph") == "B", F.lit(S.ENTER))
        .when(F.col("ph") == "E", F.lit(S.LEAVE))
        .otherwise(F.lit(S.INSTANT))
    )
    cols = [
        F.col("name").alias(S.NAME),
        etype.alias(S.EVENT_TYPE),
        (F.col("ts").cast("long") * 1000).alias(S.TIMESTAMP),
        F.col("pid").cast("int").alias(S.PROCESS),
    ]
    if "tid" in raw.columns:
        cols.append(F.col("tid").cast("int").alias(S.THREAD))
    if "args" in raw.columns:
        # args arrives as a struct of whatever keys appear in the file;
        # re-map to the canonical map<string,string> attributes column
        args = F.col("args")
        fields = [
            f.name for f in raw.schema["args"].dataType.fields
        ] if hasattr(raw.schema["args"].dataType, "fields") else []
        if fields:
            cols.append(
                F.map_filter(
                    F.create_map(
                        *[
                            x
                            for name in fields
                            for x in (
                                F.lit(name),
                                args[name].cast("string"),
                            )
                        ]
                    ),
                    lambda _, v: v.isNotNull(),
                ).alias(S.ATTRIBUTES)
            )
    return canonicalize(raw.select(*cols))
