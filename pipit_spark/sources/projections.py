"""Charm++ Projections source (reference
pipit/readers/projections_reader.py, 808 LoC).

Spark-native shape:
* the tiny ``.sts`` metadata file (chares, entry methods, user
  events/stats — reference STSReader, projections_reader.py:84-221) is
  parsed on the driver and broadcast as plain dicts;
* the per-PE gzipped text logs are read with ``spark.read.text`` (Spark
  decompresses ``.log.gz`` natively, one partition per file — the same
  per-PE parallelism the reference gets from its multiprocessing pool,
  projections_reader.py:285-341, but across executors);
* line dispatch over the ~25 record types
  (projections_reader.py:352-795) runs as a grouped-map pandas UDF per
  PE, emitting canonical events; timestamps are µs→ns (×1000,
  projections_reader.py:361) and a trailing synthetic ``Computation``
  Leave is appended when missing (projections_reader.py:792-795).
"""

from __future__ import annotations

import glob
import os
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .. import schema as S

# record-type tags (reference ProjectionsConstants,
# projections_reader.py:13-80)
CREATION = 1
BEGIN_PROCESSING = 2
END_PROCESSING = 3
ENQUEUE = 4
DEQUEUE = 5
BEGIN_COMPUTATION = 6
END_COMPUTATION = 7
BEGIN_INTERRUPT = 8
END_INTERRUPT = 9
MESSAGE_RECV = 10
BEGIN_TRACE = 11
END_TRACE = 12
USER_EVENT = 13
BEGIN_IDLE = 14
END_IDLE = 15
BEGIN_PACK = 16
END_PACK = 17
BEGIN_UNPACK = 18
END_UNPACK = 19
CREATION_BCAST = 20
CREATION_MULTICAST = 21
USER_SUPPLIED = 26
MEMORY_USAGE = 27
USER_SUPPLIED_NOTE = 28
USER_EVENT_PAIR = 100
BEGIN_USER_EVENT_PAIR = 98
END_USER_EVENT_PAIR = 99
USER_STAT = 32


def parse_sts(path: str) -> dict:
    """Driver-side parse of the .sts metadata (reference STSReader,
    projections_reader.py:135-223). Returns plain broadcastable dicts."""
    chares: dict[int, str] = {}
    entries: dict[int, tuple[str, int]] = {}
    user_events: dict[int, str] = {}
    user_stats: dict[int, str] = {}
    papi_names: list[str] = []
    num_pes = 0
    with open(path) as f:
        for line in f:
            arr = line.split()
            if not arr:
                continue
            if arr[0] == "PROCESSORS":
                num_pes = int(arr[1])
            elif arr[0] == "CHARE":
                chares[int(arr[1])] = " ".join(arr[2:-1]).strip('"')
            elif arr[0] == "ENTRY" and len(arr) > 3:
                # ENTRY CHARE <id> "<name>" <chare_id> <msg_id>
                m = re.match(r"ENTRY\s+\w+\s+(\d+)\s+\"?(.*?)\"?\s+(\d+)\s+\d+\s*$",
                             line.strip())
                if m:
                    entries[int(m.group(1))] = (m.group(2), int(m.group(3)))
            elif arr[0] == "EVENT" and len(arr) >= 3:
                user_events[int(arr[1])] = " ".join(arr[2:]).strip('"')
            elif arr[0] == "STAT" and len(arr) >= 3:
                user_stats[int(arr[1])] = " ".join(arr[2:]).strip('"')
            elif arr[0] == "PAPI_EVENT" and len(arr) >= 3:
                papi_names.append(arr[2])
    return {
        "chares": chares,
        "entries": entries,
        "user_events": user_events,
        "user_stats": user_stats,
        "num_perf_counts": len(papi_names),
        "num_pes": num_pes,
    }


def _entry_name(meta: dict, entry_id: int) -> str:
    # Observable reference behavior (projections_reader.py:100-109): the
    # chare-prefix branch tests `chare_id in self.chares` where chares is
    # a LIST of tuples, which an int id never matches — so entry names
    # are emitted bare, and unknown ids map to "".
    ent = meta["entries"].get(entry_id)
    if ent is None:
        return ""
    return ent[0]


def _parse_pe_lines(
    pe: int, lines: list[str], meta: dict, fixup: bool = True
) -> pd.DataFrame:
    """Line-tag dispatch for one PE's log (semantics of
    projections_reader.py:352-795; µs→ns ×1000).

    ``fixup=False`` skips the trailing-Computation repair — used when
    the caller parses a file in CHUNKS and applies the repair itself
    at true end-of-file (read_projections), since mid-file chunks
    must not invent Leave events."""
    names: list[str] = []
    types: list[str] = []
    times: list[int] = []
    attrs: list[dict | None] = []

    def emit(name: str, etype: str, t: int, a: dict | None = None) -> None:
        names.append(name)
        types.append(etype)
        times.append(t)
        attrs.append(a)

    for line in lines:
        arr = line.split()
        if not arr or not arr[0].lstrip("-").isdigit():
            continue
        tag = int(arr[0])
        if tag in (BEGIN_IDLE, END_IDLE):
            emit("Idle", "Enter" if tag == BEGIN_IDLE else "Leave",
                 int(arr[1]) * 1000, {"from_pe": arr[2]})
        elif tag in (BEGIN_PACK, END_PACK):
            emit("Pack", "Enter" if tag == BEGIN_PACK else "Leave",
                 int(arr[1]) * 1000, {"from_pe": arr[2]})
        elif tag in (BEGIN_UNPACK, END_UNPACK):
            emit("Unpack", "Enter" if tag == BEGIN_UNPACK else "Leave",
                 int(arr[1]) * 1000, {"from_pe": arr[2]})
        elif tag == BEGIN_PROCESSING:
            emit(_entry_name(meta, int(arr[2])), "Enter", int(arr[3]) * 1000,
                 {"from_pe": arr[5], "msg_length": arr[6], "event_id": arr[4]})
        elif tag == END_PROCESSING:
            emit(_entry_name(meta, int(arr[2])), "Leave", int(arr[3]) * 1000, None)
        elif tag == CREATION:
            # CREATION_BCAST (20) is intentionally NOT handled: the
            # reference has no branch for it (projections_reader.py
            # handles only CREATION and CREATION_MULTICAST) and its
            # golden counts (77/68 Instants) depend on skipping it
            emit(_entry_name(meta, int(arr[2])), "Instant", int(arr[3]) * 1000,
                 {"from_pe": arr[5], "msg_length": arr[6],
                  "send_time": str(int(arr[7]) * 1000), "entry_type": "Create"})
        elif tag == CREATION_MULTICAST:
            emit(_entry_name(meta, int(arr[2])), "Instant", int(arr[3]) * 1000,
                 {"from_pe": arr[5], "msg_length": arr[6],
                  "entry_type": "Multicast", "num_procs": arr[8]})
        elif tag == MESSAGE_RECV:
            emit("Message Receive", "Instant", int(arr[2]) * 1000,
                 {"from_pe": arr[4], "msg_length": arr[5]})
        elif tag == ENQUEUE:
            emit("Enque", "Instant", int(arr[2]) * 1000, {"from_pe": arr[4]})
        elif tag == DEQUEUE:
            emit("Deque", "Instant", int(arr[2]) * 1000, {"from_pe": arr[4]})
        elif tag in (BEGIN_INTERRUPT, END_INTERRUPT):
            emit("Interrupt", "Enter" if tag == BEGIN_INTERRUPT else "Leave",
                 int(arr[1]) * 1000, {"event_id": arr[2]})
        elif tag == BEGIN_COMPUTATION:
            emit("Computation", "Enter", int(arr[1]) * 1000, None)
        elif tag == END_COMPUTATION:
            emit("Computation", "Leave", int(arr[1]) * 1000, None)
        elif tag in (BEGIN_TRACE, END_TRACE):
            emit("Trace", "Enter" if tag == BEGIN_TRACE else "Leave",
                 int(arr[1]) * 1000, None)
        elif tag == USER_EVENT:
            emit(meta["user_events"].get(int(arr[1]), f"User Event {arr[1]}"),
                 "Instant", int(arr[2]) * 1000, {"event_id": arr[3]})
        elif tag == USER_EVENT_PAIR:
            emit(meta["user_events"].get(int(arr[1]), f"User Event {arr[1]}"),
                 "Instant", int(arr[2]) * 1000,
                 {"event_id": arr[3], "nested_id": arr[5]})
        elif tag in (BEGIN_USER_EVENT_PAIR, END_USER_EVENT_PAIR):
            emit("User Event Pair",
                 "Enter" if tag == BEGIN_USER_EVENT_PAIR else "Leave",
                 int(arr[2]) * 1000, {"event_id": arr[3], "nested_id": arr[5]})
        elif tag == USER_STAT:
            emit(meta["user_stats"].get(int(arr[5]), f"User Stat {arr[5]}"),
                 "Instant", int(arr[1]) * 1000, {"stat": arr[3]})
        elif tag == USER_SUPPLIED:
            emit("User Supplied", "Instant", -1, {"value": arr[1]})
        elif tag == USER_SUPPLIED_NOTE:
            emit("User Supplied Note", "Instant", int(arr[1]) * 1000,
                 {"note": " ".join(arr[2:])})
        elif tag == MEMORY_USAGE:
            emit("Memory Usage", "Instant", int(arr[2]) * 1000,
                 {"memory_usage": arr[1]})

    # trailing Computation Leave if missing (projections_reader.py:792-795)
    if fixup and names and names[-1] != "Computation":
        emit("Computation", "Leave", times[-1] if times else 0, None)

    # explicit dtypes: an EMPTY (or eventless) chunk must not let
    # pandas infer float64 columns — Arrow can't convert float64 to
    # string/map and the mapInPandas serializer would throw
    return pd.DataFrame(
        {
            S.NAME: pd.Series(names, dtype=object),
            S.EVENT_TYPE: pd.Series(types, dtype=object),
            S.TIMESTAMP: pd.array(times, dtype="int64"),
            S.PROCESS: pd.array([pe] * len(names), dtype="int32"),
            S.ATTRIBUTES: pd.Series(attrs, dtype=object),
        }
    )


# Max buffered raw lines per parse chunk (~30 MB of Python strings).
# Bounds task memory independent of PE-log size; measured at the 120M
# ladder rung: whole-file buffering (8M lines/task) cost 2.7x parse
# rate in GC pressure alone.
_CHUNK_LINES = 262_144

_OUT_SCHEMA = T.StructType(
    [
        T.StructField(S.EVENT_ID, T.LongType()),
        T.StructField(S.TIMESTAMP, T.LongType()),
        T.StructField(S.SEQ, T.LongType()),
        T.StructField(S.EVENT_TYPE, T.StringType()),
        T.StructField(S.NAME, T.StringType()),
        T.StructField(S.PROCESS, T.IntegerType()),
        T.StructField(S.ATTRIBUTES, T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_projections(spark: SparkSession, dirname: str) -> DataFrame:
    """Distributed read of a Projections log directory — SHUFFLE-FREE.

    Gzip logs are non-splittable, so ``spark.read.text`` already
    delivers each PE file's lines, in file order, inside one input
    partition (several small files may share a partition, still
    contiguous and ordered). The per-PE parse therefore runs as
    ``mapInPandas`` directly over those partitions, parsing in BOUNDED
    CHUNKS (``_CHUNK_LINES``) with per-file carried state — the line
    dispatch is stateless, so only the sequence offset and the last
    emitted (name, time) cross a chunk boundary, the latter feeding
    the trailing-Computation repair applied exactly once at true
    end-of-file. Peak task memory is therefore ~chunk-sized however
    large one PE's log grows (a multi-GB PE log at real scale), not
    file-sized: the 120M-event ladder rung measured the whole-file
    formulation at 2.7x lower per-core parse rate purely from
    list/GC pressure at ~8M buffered lines per task (SCALING.md
    ingestion rung).

    The previous ``groupBy(file).applyInPandas`` formulation shuffled
    EVERY RAW LINE across the cluster just to regroup what the scan
    had already grouped — at the 12M-event ladder rung that exchange
    was the measured constraint (throughput dropped 2x; SCALING.md
    ingestion rung). Parallelism is unchanged: one task per PE file,
    the reference's own fan-out axis (its mp.Pool over PEs,
    projections_reader.py:285-341) spread across executors."""
    sts_files = glob.glob(os.path.join(dirname, "*.sts"))
    if not sts_files:
        raise FileNotFoundError(f"no .sts file in {dirname}")
    meta = parse_sts(sts_files[0])
    bmeta = spark.sparkContext.broadcast(meta)

    logs = spark.read.text(os.path.join(dirname, "*.log.gz")).select(
        F.col("value"),
        F.input_file_name().alias("__file"),
    )
    return logs.mapInPandas(_make_parse_partition(bmeta), schema=_OUT_SCHEMA)


def _make_parse_partition(bmeta):
    """The per-partition chunked parse, shared verbatim by the batch
    reader above and the streaming reader below (a micro-batch's scan
    partitions have the same per-file contiguity guarantee — the
    stream source is file-granular, so a .log.gz never splits across
    triggers)."""

    def parse_partition(batches):
        cur_file: str | None = None
        pe = 0
        shard_k: int | None = None  # 1-based shard index, None=whole file
        shard_n = 1
        lines: list[str] = []
        n_emitted = 0  # events emitted so far for cur_file
        last_name: str | None = None
        last_time = 0

        def flush(final: bool) -> pd.DataFrame:
            nonlocal n_emitted, last_name, last_time
            out = _parse_pe_lines(pe, lines, bmeta.value, fixup=False)
            lines.clear()
            if len(out):
                last_name = out[S.NAME].iloc[-1]
                last_time = int(out[S.TIMESTAMP].iloc[-1])
            if (
                final
                and (shard_k is None or shard_k == shard_n)
                and (n_emitted or len(out))
                and last_name != "Computation"
            ):
                # trailing repair, once per PE LOG (reference
                # projections_reader.py:792-795) — for pre-split
                # shards (.{k}of{n}.log.gz) that means the LAST
                # shard only: a mid-shard ends mid-stream by
                # construction, not at the PE's true end-of-trace
                out = pd.concat(
                    [out, pd.DataFrame({
                        S.NAME: ["Computation"],
                        S.EVENT_TYPE: ["Leave"],
                        S.TIMESTAMP: pd.array([last_time], dtype="int64"),
                        S.PROCESS: pd.array([pe], dtype="int32"),
                        S.ATTRIBUTES: [None],
                    })],
                    ignore_index=True,
                )
            n = len(out)
            # per-PE id space: pe << 40 (same scheme as the OTF2
            # reader's (process << 40) | seq) — a multi-GB PE log can
            # exceed any decimal base chosen by eye, and a silent
            # collision into the next PE's ids corrupts the matching
            # join. 2^40 events per PE is the loud, guarded limit.
            # Pre-split shards subdivide it as (pe<<40)+((k-1)<<28)+i:
            # per-PE order is preserved across shards (shards are
            # line-order slices) and each shard is bounded at 2^28
            # events, 4096 shards per PE.
            if shard_k is None:
                if n_emitted + n > (1 << 40):
                    raise ValueError(
                        f"PE {pe} exceeds 2^40 events — packed event "
                        "ids would collide; widen the id scheme"
                    )
                base = (pe << 40) + n_emitted
            else:
                if n_emitted + n > (1 << 28):
                    raise ValueError(
                        f"PE {pe} shard {shard_k} exceeds 2^28 events "
                        "— packed event ids would collide; re-split "
                        "into more shards"
                    )
                base = (pe << 40) + ((shard_k - 1) << 28) + n_emitted
            out[S.SEQ] = pd.array(range(base, base + n), dtype="int64")
            out[S.EVENT_ID] = out[S.SEQ]
            n_emitted += n
            return out[[f.name for f in _OUT_SCHEMA.fields]]

        for pdf in batches:
            for fname, grp in pdf.groupby("__file", sort=False):
                if fname != cur_file:
                    if cur_file is not None:
                        yield flush(final=True)
                    base_name = os.path.basename(fname)
                    ms = re.search(r"\.(\d+)\.(\d+)of(\d+)\.log", base_name)
                    if ms:  # pre-split shard (tools/split_pe_log.py)
                        pe = int(ms.group(1))
                        shard_k, shard_n = int(ms.group(2)), int(ms.group(3))
                        if shard_n > 4096 or not 1 <= shard_k <= shard_n:
                            raise ValueError(
                                f"bad shard name {base_name}: need "
                                "1 <= k <= n <= 4096"
                            )
                    else:
                        m = re.search(r"\.(\d+)\.log", base_name)
                        pe = int(m.group(1)) if m else 0
                        shard_k, shard_n = None, 1
                    cur_file = fname
                    n_emitted, last_name, last_time = 0, None, 0
                lines.extend(grp["value"].tolist())
                if len(lines) >= _CHUNK_LINES:
                    yield flush(final=False)
        if cur_file is not None:
            yield flush(final=True)

    return parse_partition


def stream_projections(
    spark: SparkSession,
    dirname: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAMING ingest of a growing Projections log directory — the
    live-run twin of :func:`read_projections` for a Charm++ job that
    is still writing PE logs (or an object store receiving them).

    ``spark.readStream.text`` discovers complete ``*.log.gz`` files as
    they land; each micro-batch runs the SAME chunked per-file parse
    as the batch reader (file-granular source: a log never splits
    across triggers, so per-file carried state stays within one
    micro-batch). Downstream, write to the canonical parquet table
    with ``.writeStream.trigger(availableNow=True)`` for incremental
    catch-up runs or a processing-time trigger for continuous tail —
    the sink's checkpoint gives exactly-once file-level ingest, which
    is the property a 100 TB backfill actually needs (re-running the
    job ingests only new PE files).

    ``max_files_per_trigger`` bounds micro-batch size (files, i.e. PE
    logs) so a backfill over thousands of PEs paces itself instead of
    one giant first batch. The ``.sts`` metadata must already exist
    (it is written at job start, before any log data)."""
    sts_files = glob.glob(os.path.join(dirname, "*.sts"))
    if not sts_files:
        raise FileNotFoundError(f"no .sts file in {dirname}")
    meta = parse_sts(sts_files[0])
    bmeta = spark.sparkContext.broadcast(meta)

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    logs = (
        reader.text(os.path.join(dirname, "*.log.gz"))
        .select(
            F.col("value"),
            F.input_file_name().alias("__file"),
        )
    )
    return logs.mapInPandas(_make_parse_partition(bmeta), schema=_OUT_SCHEMA)
