"""JSONL corpus interchange for the LLM-data operators.

Training corpora ship as sharded ``*.jsonl`` / ``*.jsonl.gz`` — one JSON
object per line. Spark's JSON source handles this natively (including
gzip decompression and multi-file globs), but two defaults are wrong at
100 TB and are overridden here:

* **schema inference** triggers a full extra pass over the data before
  the real scan — readers take an explicit schema instead (defaulting
  to the canonical documents schema) and route malformed lines to a
  ``_corrupt_record`` column rather than failing the job;
* **output sharding**: one output file per partition is the scalable
  default (a single .jsonl file would serialize through one task);
  ``write_jsonl`` keeps that and exposes ``num_shards`` for explicit
  control (a repartition, the only shuffle in the sink).

No reference counterpart (pipit reads traces, not corpora); extends
SURVEY.md §7 step 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a (sharded, possibly gzipped) JSONL corpus with an explicit
    schema — no inference pass. Malformed lines are dropped at the
    source (DROPMALFORMED — no post-filter needed, and no
    ``_corrupt_record`` pseudo-column, which Spark forbids as the sole
    referenced column of a query). Pass ``keep_corrupt=True`` to switch
    to PERMISSIVE mode and retain the raw line of each parse failure in
    ``_corrupt_record`` for quarantine pipelines.
    """
    schema = schema or DOCUMENTS_SCHEMA
    if not keep_corrupt:
        return (
            spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    docs: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a corpus as sharded JSONL. ``num_shards`` repartitions to a
    target shard count (omit to keep the upstream partitioning — no
    shuffle); ``compression='gzip'`` for .jsonl.gz shards."""
    if num_shards is not None:
        docs = docs.repartition(num_shards)
    w = docs.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
