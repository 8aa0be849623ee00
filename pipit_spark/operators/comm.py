"""Communication analysis operators (reference pipit/trace.py:367-512).

All are single-pass filter + groupBy aggregations over Instant send/recv
events — the reference's driver-side numpy accumulation loops
(pipit/trace.py:434-442) disappear into hash aggregations. Results are
long-form DataFrames (sparse); densification to a ranks×ranks matrix is a
display concern done on collect (rank count is small even at 100 TB).

Attribute access: the canonical schema keeps ``attributes`` as
map<string,string>; hot keys (receiver, msg_length) may also be promoted
to typed top-level columns at ingest (SURVEY §4) — these operators use
the promoted column when present, else the map lookup (still columnar,
no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import schema as S


def _receiver_col(df: DataFrame):
    if S.ATTR_RECEIVER in df.columns:
        return F.col(S.ATTR_RECEIVER).cast("int")
    return F.element_at(F.col(S.ATTRIBUTES), S.ATTR_RECEIVER).cast("int")


def _msg_length_col(df: DataFrame):
    if S.ATTR_MSG_LENGTH in df.columns:
        return F.col(S.ATTR_MSG_LENGTH).cast("double")
    return F.element_at(F.col(S.ATTRIBUTES), S.ATTR_MSG_LENGTH).cast("double")


def comm_matrix(events: DataFrame, output: str = "size") -> DataFrame:
    """Long-form P2P communication matrix: (sender, receiver, volume).

    Reference: pipit/trace.py:367-444 — filter to MpiSend/MpiIsend
    Instants, receiver from attributes, volume = msg_length ('size') or
    message count ('count').
    """
    sends = events.filter(F.col(S.NAME).isin(*S.SEND_NAMES))
    proj = sends.select(
        F.col(S.PROCESS).alias("sender"),
        _receiver_col(sends).alias("receiver"),
        _msg_length_col(sends).alias("__len"),
    )
    vol = (F.sum("__len") if output == "size" else F.count(F.lit(1))).cast("double")
    return proj.groupBy("sender", "receiver").agg(vol.alias("volume"))


def comm_matrix_numpy(events: DataFrame, output: str = "size"):
    """Dense ranks×ranks numpy matrix for display parity with the
    reference's return type (pipit/trace.py:434-444)."""
    import numpy as np

    nranks = events.agg(F.max(S.PROCESS)).collect()[0][0] + 1
    mat = np.zeros((nranks, nranks))
    for row in comm_matrix(events, output=output).collect():
        mat[row["sender"], row["receiver"]] = row["volume"]
    return mat


def comm_by_process(events: DataFrame, output: str = "size") -> DataFrame:
    """Total sent/received volume per process (pipit/trace.py:498-512):
    row/col sums of the long-form comm matrix via two aggregations and a
    full-outer join (both sides tiny — one row per rank)."""
    cm = comm_matrix(events, output=output)
    sent = cm.groupBy(F.col("sender").alias(S.PROCESS)).agg(
        F.sum("volume").alias("sent")
    )
    recv = cm.groupBy(F.col("receiver").alias(S.PROCESS)).agg(
        F.sum("volume").alias("received")
    )
    return (
        sent.join(recv, S.PROCESS, "full_outer")
        .select(
            S.PROCESS,
            F.coalesce("sent", F.lit(0.0)).alias("sent"),
            F.coalesce("received", F.lit(0.0)).alias("received"),
        )
    )


def _fixed_width_histogram(
    df: DataFrame,
    value_col,
    bins: int,
    weight_col=None,
    range_df: DataFrame | None = None,
) -> DataFrame:
    """np.histogram semantics (pipit/trace.py:455,487): `bins` equal
    intervals over [min, max] (of `range_df` if given, else of the
    values); right-closed last bin. Returns every bin (including empty)
    as (bin_idx, bin_start, bin_end, count).

    Two-job shape: one tiny agg for min/max (collected — 2 scalars), then
    one hash aggregation; the bin table is built with ``spark.range`` and
    broadcast-joined so empty bins appear.
    """
    spark = df.sparkSession
    src = range_df if range_df is not None else df
    lo, hi = src.agg(
        F.min(value_col).cast("double"), F.max(value_col).cast("double")
    ).collect()[0]
    lo = float(lo)
    hi = float(hi)
    width = (hi - lo) / bins if hi > lo else 1.0

    bucket = F.least(
        F.floor((value_col.cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(bins - 1),
    ).alias("bin_idx")
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    counts = (
        df.filter(value_col.isNotNull()
                  & (value_col >= F.lit(lo)) & (value_col <= F.lit(hi)))
        .groupBy(bucket)
        .agg(w.cast("double").alias("count"))
    )
    bins_df = spark.range(bins).select(
        F.col("id").alias("bin_idx"),
        (F.lit(lo) + F.col("id") * F.lit(width)).alias("bin_start"),
        (F.lit(lo) + (F.col("id") + 1) * F.lit(width)).alias("bin_end"),
    )
    # broadcast the AGGREGATED side: a left-outer BHJ can only build its
    # right input, and `counts` is ≤ `bins` rows post-aggregation —
    # broadcasting `bins_df` (the preserved side) is rejected by the
    # planner and silently degrades to a shuffle join
    return (
        bins_df
        .join(F.broadcast(counts), "bin_idx", "left")
        .select(
            "bin_idx", "bin_start", "bin_end",
            F.coalesce("count", F.lit(0.0)).alias("count"),
        )
    )


def message_histogram(events: DataFrame, bins: int = 20) -> DataFrame:
    """Histogram of message sizes (pipit/trace.py:446-455)."""
    sends = events.filter(F.col(S.NAME).isin(*S.SEND_NAMES))
    return _fixed_width_histogram(sends, _msg_length_col(sends), bins)


def comm_over_time(
    events: DataFrame,
    output: str = "size",
    message_type: str = "send",
    bins: int = 50,
) -> DataFrame:
    """Histogram of communication volume over time
    (pipit/trace.py:457-496). Bin range spans the WHOLE trace's
    [min ts, max ts], matching the reference's ``range=`` argument."""
    names = S.SEND_NAMES if message_type == "send" else S.RECV_NAMES
    msgs = events.filter(F.col(S.NAME).isin(*names))
    weight = _msg_length_col(msgs) if output == "size" else None
    return _fixed_width_histogram(
        msgs, F.col(S.TIMESTAMP), bins, weight_col=weight, range_df=events
    )


def comm_by_function(
    matched: DataFrame, output: str = "size", message_type: str = "send"
) -> DataFrame:
    """Communication volume attributed to the CALLING function: which
    functions send (or receive, ``message_type="recv"``) the bytes —
    beyond the reference's process-level views. Requires the matched
    frame — the matching kernel stamps every Instant with its enclosing
    call's name (``parent_name``), so the attribution is a plain filter
    + hash aggregation, no join back to the call rows. Instants outside
    any call group under NULL."""
    names = S.SEND_NAMES if message_type == "send" else S.RECV_NAMES
    msgs = matched.filter(F.col(S.NAME).isin(*names))
    vol = (
        F.sum(_msg_length_col(msgs)) if output == "size"
        else F.count(F.lit(1)).cast("double")
    )
    return (
        msgs.groupBy(F.col(S.PARENT_NAME).alias("function"))
        .agg(vol.cast("double").alias("volume"))
    )


def comm_locality(
    events: DataFrame, block_size: int = 4, output: str = "size"
) -> DataFrame:
    """Topology-mapping health number: what fraction of communication
    volume stays within a ``block_size``-rank block (nodes, NUMA
    domains, racks — whatever the block models). One conditional
    aggregation over the long-form comm matrix; the standard metric a
    rank-reordering exercise optimizes."""
    cm = comm_matrix(events, output=output)
    local = F.floor(F.col("sender") / block_size) == F.floor(
        F.col("receiver") / block_size
    )
    return cm.agg(
        F.sum("volume").cast("double").alias("total_volume"),
        F.sum(F.when(local, F.col("volume")).otherwise(0.0))
        .cast("double")
        .alias("local_volume"),
    ).select(
        "total_volume",
        "local_volume",
        F.round(
            F.try_divide(F.col("local_volume"), F.col("total_volume")), 6
        ).alias("locality"),
    )
