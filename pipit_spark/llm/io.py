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

from pyspark.sql import DataFrame, SparkSession, functions as F
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


def write_training_shards(
    docs: DataFrame,
    path: str,
    context_len: int = 512,
    n_shards: int = 64,
    tokens_col: str | None = None,
) -> None:
    """End of the training-data pipeline: join the packing manifest
    (:func:`~pipit_spark.llm.sampling.pack_assignments`) back onto the
    documents and write JSONL partitioned by ``shard`` — each shard
    directory holds its documents tagged with (pack_in_shard,
    offset_in_pack, n_tokens), in the layout a data loader streams
    pack-by-pack.

    The manifest join is on doc_id (both sides already carry it; AQE
    picks the strategy) and the write's partitionBy reuses the
    manifest's shard key — one shuffle total beyond the manifest's own
    cumsum."""
    from .sampling import pack_assignments

    manifest = pack_assignments(
        docs, context_len=context_len, n_shards=n_shards,
        tokens_col=tokens_col,
    )
    out = docs.join(manifest, "doc_id")
    (
        out.repartition("shard")
        .sortWithinPartitions("pack_in_shard", "offset_in_pack")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read an ORC corpus. ORC is self-describing (schema rides in the
    file footer — no inference pass to suppress, unlike JSONL); an
    explicit ``schema`` acts as projection + type check, which keeps
    column pruning exact when callers only need a subset. Predicate
    pushdown into ORC stripe/row-group indexes comes free from the
    native source."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    docs: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str = "zstd",
) -> None:
    """Write a corpus as sharded ORC (columnar interchange for
    warehouses that speak ORC rather than parquet). Same sharding
    contract as :func:`write_jsonl`: one file per partition by default,
    ``num_shards`` repartitions for explicit control."""
    if num_shards is not None:
        docs = docs.repartition(num_shards)
    docs.write.mode("overwrite").option("compression", compression).orc(path)


def write_partitioned_corpus(
    docs: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("source", "lang"),
    fmt: str = "parquet",
    files_per_partition: int = 8,
) -> None:
    """Hive-layout corpus lake: directory-partitioned by low-cardinality
    routing columns (source/lang are the natural pruning axes of a
    training corpus — per-source reprocessing and per-language selection
    are the two most common scoped reads). A read filtered on the
    partition columns then prunes whole directories BEFORE any IO
    (PartitionFilters in the scan, contract-tested), which at 100 TB is
    the difference between touching one source's shard and listing the
    whole lake.

    The write repartitions on (partition columns, content bucket) —
    partition columns alone would collapse parallelism to the number
    of distinct (source, lang) combos and write one giant file per
    directory; without any repartition every task appends a file into
    every directory (task_count × n_partitions small files). The
    bucket term keeps directory locality while fanning each directory
    across ``files_per_partition`` tasks/files."""
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in docs.columns]),
        F.lit(files_per_partition),
    )
    w = (
        docs.repartition(*[F.col(c) for c in partition_cols], bucket)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
    )
    getattr(w, fmt)(path)


def read_partitioned_corpus(
    spark: SparkSession, path: str, fmt: str = "parquet", **filters: str
) -> DataFrame:
    """Read back a partitioned corpus lake, with optional equality
    filters on partition columns passed as kwargs (``source="web"``) —
    expressed as ordinary ``filter`` calls so Catalyst turns them into
    partition pruning."""
    df = getattr(spark.read, fmt)(path)
    for c, v in filters.items():
        df = df.filter(F.col(c) == v)
    return df


# --------------------------------------------------------------------- #
# WARC / WET — Common Crawl ingestion
# --------------------------------------------------------------------- #
WET_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _parse_warc_records(blob: bytes):
    """Yield (headers: dict, payload: bytes) per WARC/1.x record.

    WARC framing (ISO 28500): a ``WARC/1.x`` version line, CRLF header
    block terminated by an empty line, exactly ``Content-Length``
    payload bytes, then CRLF CRLF. A truncated trailing record (torn
    shard upload) stops the scan instead of raising — the records
    before it are good and the tail loss is the uploader's bug to fix.
    """
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate stray separators between records
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not blob[pos : pos + 5] == b"WARC/":
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break
        yield headers, blob[body_start : body_start + clen]
        pos = body_start + clen


def _maybe_gunzip(name: str, content: bytes) -> bytes:
    if name.endswith(".gz") or content[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(content)
    return content


def _wet_shard_parser():
    """One shared per-shard WET parse loop (a mapInPandas generator) —
    the batch and streaming readers MUST stay byte-identical, so there
    is exactly one copy of the record walk."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows = []
                blob = _maybe_gunzip(fname, bytes(content))
                for h, body in _parse_warc_records(blob):
                    if h.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            fname,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            len(body),
                            body.decode("utf-8", "replace"),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WET_SCHEMA.fields]
                )

    return gen


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WET ingestion: sharded ``*.warc.wet(.gz)`` files of
    ``conversion`` records (pre-extracted page text) → one row per page,
    ready for the documents pipeline (add ``doc_id`` via
    ``monotonically_increasing_id`` or a content fingerprint).

    Partitioning IS the file sharding: ``binaryFile`` gives one row —
    one task — per shard, exactly how Common Crawl distributes the
    corpus (~1 GB gzip segments, ~100k of them per crawl ≈ 100 TB), so
    a 1000-executor cluster reads 1000 shards at a time with zero
    shuffle. Parsing is one Python pass per shard inside mapInPandas
    (Arrow-batched, record framing is byte arithmetic, not regex).
    Memory envelope: whole-shard decompress, ~3× the .gz size — the
    same envelope any WARC tool (warcio et al.) needs per stream;
    Spark's binary source caps files at 2 GB which the CC segment
    convention (<1.2 GB) already satisfies.
    """
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _wet_shard_parser(), WET_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Raw WARC ingestion (``response`` records): one row per capture
    with the HTTP status/content-type split out and the body kept as an
    opaque ``binary`` payload — the multimodal-column convention
    (llm/multimodal.py): planning and filtering never decode the blob;
    downstream HTML→text / image decode runs in its own narrow pass.
    Same sharding/memory model as :func:`read_wet`.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def gen(batches):
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows = []
                blob = _maybe_gunzip(fname, bytes(content))
                for h, body in _parse_warc_records(blob):
                    if h.get("warc-type") != "response":
                        continue
                    status, ctype, payload = None, None, body
                    split = body.find(b"\r\n\r\n")
                    first = body[: body.find(b"\r\n")]
                    if split >= 0 and first[:5] == b"HTTP/":
                        payload = body[split + 4 :]
                        parts = first.split(b" ")
                        if len(parts) >= 2 and parts[1].isdigit():
                            status = int(parts[1])
                        for line in body[:split].split(b"\r\n")[1:]:
                            k, _, v = line.partition(b":")
                            if k.strip().lower() == b"content-type":
                                ctype = v.strip().decode(
                                    "utf-8", "replace"
                                )
                    rows.append(
                        (
                            fname,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            ctype,
                            payload,
                            len(payload),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WARC_SCHEMA.fields]
                )

    return files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)


def read_wet_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming WET ingestion: the same parser as :func:`read_wet`
    over a ``binaryFile`` file-source stream — new Common Crawl
    segments landing in ``path`` flow through as they arrive (the
    production shape for continuous crawl ingestion; compose with
    llm/pipeline.incremental_new_docs or the streaming near-dup screen
    for dedup-on-arrival). File-granular tasks and checkpointed file
    tracking come from the source; one shard is parsed exactly once
    across restarts."""
    # the binaryFile source's schema is fixed but must be stated
    # explicitly for streaming (no inference pass on a stream)
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _wet_shard_parser(), WET_SCHEMA
    )


def write_arrow_ipc(
    df: DataFrame, path: str, shards: int | None = None
) -> DataFrame:
    """Write the frame as sharded Arrow IPC (Feather V2) files — the
    zero-copy interchange format ML dataloaders mmap directly
    (PyTorch/JAX readers, DuckDB, polars all open it without a Spark
    runtime). One file per partition, written executor-side inside
    mapInPandas — no driver collect, no shuffle beyond the optional
    ``shards`` repartition; the returned manifest (one row per shard:
    path, rows, bytes) is the only thing that crosses to the driver.

    The parquet sinks stay the system of record; IPC is the
    training-loop hand-off (column-major, no decode on read)."""
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc

    os.makedirs(path, exist_ok=True)
    if shards is not None:
        df = df.repartition(shards)
    # the Arrow schema comes from the SPARK schema (an empty pandas
    # frame infers object/null types that from_pandas can't convert)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)

    def gen(batches):
        import uuid

        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        n = 0
        if pdfs:
            with ipc.new_file(fname, arrow_schema) as w:
                for p in pdfs:
                    t = pa.Table.from_pandas(
                        p, schema=arrow_schema, preserve_index=False
                    )
                    w.write_table(t)
                    n += len(p)
            yield pd.DataFrame(
                {
                    "shard": [fname],
                    "n_rows": [n],
                    "n_bytes": [os.path.getsize(fname)],
                }
            )

    out = df.mapInPandas(
        gen, "shard string, n_rows long, n_bytes long"
    )
    # materialize the writes NOW (the manifest is the action)
    manifest = out.collect()
    return df.sparkSession.createDataFrame(
        manifest, "shard string, n_rows long, n_bytes long"
    )


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read sharded Arrow IPC files back into a DataFrame: one task
    per shard (the ``binaryFile`` convention of the WARC readers), the
    IPC payload decoded zero-copy by pyarrow inside mapInPandas.
    Schema comes from the first shard's embedded Arrow schema."""
    import glob as _glob

    import pyarrow.ipc as ipc

    first = sorted(_glob.glob(f"{path}/part-*.arrow"))
    if not first:
        raise FileNotFoundError(f"no part-*.arrow shards under {path}")
    from pyspark.sql.pandas.types import from_arrow_schema

    with ipc.open_file(first[0]) as r:
        schema = from_arrow_schema(r.schema)

    files = spark.read.format("binaryFile").load(f"{path}/part-*.arrow")

    def gen(batches):
        import io as _io

        for pdf in batches:
            for blob in pdf["content"]:
                with ipc.open_file(_io.BytesIO(bytes(blob))) as r:
                    yield r.read_all().to_pandas()

    return files.select("content").mapInPandas(gen, schema)
