"""Structured Streaming operators over the canonical events schema.

The reference has no streaming at all (SURVEY §2.7) — its
``comm_over_time`` / ``time_profile`` are batch tumbling windows over a
closed trace. These operators re-express that family for unbounded
event streams the Spark-native way: event-time windows + watermarks for
late data, ``session_window`` for gap-based grouping, and
``availableNow`` triggers so the same code does incremental batch
backfill at 100 TB.

All operators take/return streaming DataFrames; sources/sinks stay with
the caller (``spark.readStream.schema(...).parquet(dir)`` for the
canonical store, any sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import schema as S


def with_event_time(events: DataFrame, col: str = "event_time") -> DataFrame:
    """Attach a TimestampType event-time column derived from the ns-long
    canonical timestamp (µs precision — Spark's timestamp granularity)."""
    return events.withColumn(
        col, F.timestamp_micros(F.expr(f"{S.TIMESTAMP} div 1000"))
    )


def streaming_comm_over_time(
    events: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    output: str = "count",
    message_type: str = "send",
) -> DataFrame:
    """Streaming twin of ``comm_over_time`` (batch: pipit/trace.py:457-496):
    per event-time tumbling window, count (or byte volume) of MPI
    send/recv Instants. The watermark bounds state: windows older than
    it are finalized and emitted (append mode)."""
    names = S.SEND_NAMES if message_type == "send" else S.RECV_NAMES
    ev = with_event_time(events)
    msgs = ev.filter(
        (F.col(S.EVENT_TYPE) == S.INSTANT) & F.col(S.NAME).isin(*names)
    )
    agg_col = (
        F.count(F.lit(1)).alias("volume")
        if output == "count"
        else F.sum(
            F.element_at(F.col(S.ATTRIBUTES), S.ATTR_MSG_LENGTH).cast("double")
        ).alias("volume")
    )
    return (
        msgs.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"))
        .agg(agg_col)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "volume",
        )
    )


def streaming_event_rates(
    events: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per-(process, window) event throughput — the live-monitoring
    counterpart of the batch time profile's binning."""
    ev = with_event_time(events)
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col(S.PROCESS))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES), 1).otherwise(0)
            ).alias("n_enters"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            S.PROCESS,
            "n_events",
            "n_enters",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming exact dedup with bounded state: drop rows whose ``keys``
    already arrived within the watermark horizon
    (``dropDuplicatesWithinWatermark``).

    Two intended uses: (a) exactly-once re-ingestion of trace events from
    at-least-once collectors — keys = [event_id]; (b) streaming document
    dedup for a training-data pipeline — compute a content fingerprint
    upstream (e.g. ``md5(text)``) and pass it as the key. Unlike plain
    ``dropDuplicates`` on a stream, state is evicted once the watermark
    passes, so it runs indefinitely at constant memory."""
    keys = list(keys or [S.EVENT_ID])
    ev = with_event_time(events)
    return ev.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "60 seconds",
) -> DataFrame:
    """Gap-based session windows per process via the native
    ``session_window`` — merges events separated by < ``gap`` into one
    session row (start, end, n_events). State is bounded by the
    watermark; sessions close once the watermark passes their gap."""
    ev = with_event_time(events)
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", gap).alias("sess"), F.col(S.PROCESS)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            S.PROCESS,
            "n_events",
        )
    )


def streaming_clean_corpus(
    docs: DataFrame,
    time_col: str = "ingest_time",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming twin of :func:`pipit_spark.llm.pipeline.clean_corpus`
    for live corpus ingestion: the language / token-window / quality
    stages are the SAME narrow expressions as the batch pipeline
    (shared factories in :mod:`pipit_spark.llm.text`, so batch and
    stream cannot drift) and run stateless per micro-batch; the exact
    dedup stage becomes ``dropDuplicatesWithinWatermark`` on the
    content fingerprint — bounded state, evicted as the watermark
    passes, so the stream runs indefinitely at constant memory.

    Semantics difference vs batch, inherent to streaming: batch keeps
    the *min doc_id* per fingerprint; the stream keeps the *first
    arrival* within the watermark horizon (and a duplicate arriving
    after eviction would re-emit — size the watermark to the
    redelivery window of the upstream collector).

    ``docs`` must carry an event-time column ``time_col``.
    """
    from ..llm.text import fingerprint_expr, pred_lang_expr, stats_exprs

    se = stats_exprs()
    keep = docs.select(
        "doc_id",
        F.col(time_col),
        se["n_tokens"].alias("n_tokens"),
        se["quality_score"].alias("quality_score"),
        pred_lang_expr().alias("pred_lang"),
        fingerprint_expr().alias("fingerprint"),
    ).filter(
        (F.col("pred_lang") == lang)
        & F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("quality_score") >= min_quality)
    )
    return (
        keep.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("doc_id", "n_tokens", "quality_score")
    )


def streaming_ann_topk(
    queries: DataFrame,
    index,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming twin of :func:`pipit_spark.llm.similarity.ivf_search`
    — online retrieval: a stream of query embeddings scored against a
    pre-built static :class:`IVFIndex`.

    The batch plan broadcasts the *query* side, which a stream cannot
    be, and per-query top-k needs a window, which streaming forbids —
    so the streaming shape inverts it the way an online ANN shard
    actually serves: the index (centroids + cell-bucketed corpus
    matrices) replicates to every executor once, and each micro-batch
    of queries is scored in a stateless ``mapInPandas`` BLAS pass
    (probe ``nprobe`` cells, concat their member matrices, top-k
    argpartition). Narrow, append-mode, no watermark, constant state.
    At corpus scale the index shards by cell range across a
    stream-static join instead; this operator is the
    replicated-index tier — the index must fit in driver and executor
    memory (~10⁷ float32 vectors at dim 256; further with int8
    quantization via ``quantize_embeddings``).

    Output matches ``ivf_search``: (query_id, neighbor_id, cosine
    rounded to 4, rank) — test-verified identical at nprobe=nlist.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # Arrow-path collection straight into numpy (Row objects would cost
    # ~10-20x the final float footprint in Python-object overhead), one
    # O(n log n) sort groups cells without a per-cell rescan
    pdf = index.assigned.select("neighbor_id", "__vc", "__cell").toPandas()
    pdf = pdf.sort_values("__cell", kind="mergesort")
    all_ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
    all_mat = np.stack(pdf["__vc"].to_numpy()).astype(np.float64)
    all_mat /= np.linalg.norm(all_mat, axis=1, keepdims=True)
    cell_arr = pdf["__cell"].to_numpy()
    del pdf
    by_cell: dict[int, tuple] = {}
    starts = np.flatnonzero(np.r_[True, cell_arr[1:] != cell_arr[:-1]])
    for s, e in zip(starts, np.r_[starts[1:], len(cell_arr)]):
        by_cell[int(cell_arr[s])] = (all_ids[s:e], all_mat[s:e])
    spark = queries.sparkSession
    bc_index = spark.sparkContext.broadcast((index.centroids, by_cell))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def gen(batches):
        cent, cells = bc_index.value
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"query_id": [], "neighbor_id": [], "cosine": [], "rank": []}
            for qid, vec in zip(pdf[id_col], pdf[vec_col]):
                q = np.asarray(vec, dtype=np.float64)
                q /= np.linalg.norm(q)
                probes = np.argsort(-(cent @ q))[:nprobe]
                hit = [int(c) for c in probes if int(c) in cells]
                if not hit:
                    # every probed cell is empty (k-means can strand
                    # centroids with zero members) — no neighbors, same
                    # as batch ivf_search yielding zero rows
                    continue
                ids = np.concatenate([cells[c][0] for c in hit])
                mats = np.concatenate([cells[c][1] for c in hit])
                sims = mats @ q
                # self excluded before ranking, then desc cosine with
                # asc neighbor_id tie-break — the batch window's exact
                # ordering
                ranked = sorted(
                    (i for i in range(len(ids)) if ids[i] != qid),
                    key=lambda i: (-sims[i], ids[i]),
                )[:k]
                for rk, i in enumerate(ranked, start=1):
                    out["query_id"].append(qid)
                    out["neighbor_id"].append(int(ids[i]))
                    out["cosine"].append(round(float(sims[i]), 4))
                    out["rank"].append(rk)
            yield pd.DataFrame(out)

    return queries.select(id_col, vec_col).mapInPandas(gen, schema)


def streaming_near_dup_screen(
    docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    portable: bool = False,
    base_hash: str = "xxhash64",
    time_col: str = "ingest_time",
    watermark: str = "30 seconds",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of
    :func:`pipit_spark.llm.dedup.incremental_near_dups`: each arriving
    document is screened for NEAR-duplicates against a pre-built static
    LSH corpus index, live.

    Streaming shape: signatures come from the row-local
    :func:`~pipit_spark.llm.dedup.minhash_sig_expr` (array_min over the
    per-row shingle array — the batch signer's explode + groupBy MIN is
    a shuffle a stream cannot run), band keys from the SAME
    ``band_key_expr`` the index builder uses, then a stream-static
    equi-join on ``bucket`` — the corpus side is the compact index,
    replicated/bucketed however it was persisted, never the corpus
    text. Signature agreement (``zip_with``) estimates Jaccard; a pair
    colliding in several bands is emitted once via
    ``dropDuplicatesWithinWatermark`` (bounded state, evicted with the
    watermark).

    Semantics difference vs the batch screen, inherent to streaming:
    the batch op returns each doc's single BEST match (a per-doc
    window); the stream emits EVERY match ≥ threshold as it is found —
    a per-doc argmax would need the doc's matches "complete", which an
    unbounded stream never promises. Callers wanting drop-decisions
    take any-match as the signal.

    Parameter compatibility with the index is validated driver-side
    from its ``lsh_params`` metadata (a stream cannot run the data
    probe the batch guard falls back to).
    """
    from ..llm.dedup import band_key_expr, minhash_sig_expr

    params = getattr(corpus_index, "lsh_params", None)
    want = {
        "num_hashes": num_hashes, "bands": bands,
        "shingle_n": shingle_n, "portable": portable,
        # r06: an md5int-built index has portable-FORMAT buckets and a
        # different base hash — without this key the guard would pass
        # and the stream-static join would silently match NOTHING
        "base_hash": base_hash,
    }
    if params is not None:
        bad = {k: (params.get(k), v) for k, v in want.items()
               if params.get(k) != v}
        if bad:
            raise ValueError(
                "corpus_index parameters do not match this stream: "
                + ", ".join(
                    f"{k}: index={iv} call={cv}"
                    for k, (iv, cv) in sorted(bad.items())
                )
            )
    rows_per_band = num_hashes // bands

    sig = minhash_sig_expr(
        F.col(text_col), num_hashes=num_hashes, shingle_n=shingle_n,
        portable=portable, base_hash=base_hash,
    )
    replayable = portable or base_hash == "md5int"
    signed = docs.select(
        "doc_id", time_col, sig.alias("__sb")
    ).withColumn(
        "bucket",
        F.explode(
            F.array(
                *[
                    band_key_expr(
                        F.col("__sb"), b, rows_per_band, replayable
                    )
                    for b in range(bands)
                ]
            )
        ),
    )
    joined = signed.join(
        corpus_index.select(
            "bucket",
            F.col("doc_id").alias("match_id"),
            F.col("sig").alias("__sc"),
        ),
        "bucket",
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("__sb", "__sc", lambda p, q: p == q),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(num_hashes),
        6,
    )
    return (
        joined.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["doc_id", "match_id"])
        .select("doc_id", "match_id", "est_jaccard", time_col)
    )


def streaming_cms_cells(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    time_col: str = "ingest_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of :func:`pipit_spark.llm.sketches.cms_build`:
    per event-time window, the SAME portable md5 cell increments (the
    shared ``_cell`` factory, so batch and stream cannot drift)
    aggregated with map-side combine. Append mode emits each window's
    sketch when the watermark closes it; closed-window sketches roll
    up into hourly/daily horizons via
    :func:`~pipit_spark.llm.sketches.merge_cms` (cell-wise SUM) — the
    constant-memory frequency monitor for a live corpus feed.

    In-flight state is bounded: windows-in-flight × depth×width cells,
    independent of stream volume."""
    from ..llm.sketches import _cell
    from ..llm.text import _tokens

    toks = docs.select(
        F.col(time_col),
        F.explode(
            F.filter(
                _tokens(F.coalesce(F.col(text_col), F.lit(""))),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    cells = toks.select(
        F.col(time_col),
        F.posexplode(
            F.array(*[_cell(i, F.col("tok"), width) for i in range(depth)])
        ).alias("row", "col"),
    )
    return (
        cells.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window).alias("win"), "row", "col"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"), "row", "col", "cnt"
        )
    )
