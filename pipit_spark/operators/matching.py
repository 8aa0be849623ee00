"""Enter/Leave matching — the core trace operator.

Semantics reproduced from the reference's three sequential stack passes
(pipit/trace.py:106-191 ``_match_events``, pipit/trace.py:193-292
``_match_caller_callee``, pipit/util/cct.py:9-118 ``create_cct``), fused
into ONE Arrow-vectorized mapInPandas pass per shuffle partition, where
each partition holds complete (process, thread) locations and the kernel
resets its stacks at location boundaries:

* a Leave pops the nearest stack entry with the same name, tolerating
  unbalanced traces by scanning the stack downward
  (pipit/trace.py:170-186);
* depth/parent are assigned to *matched Enter* rows only, walking a second
  stack over matched rows (pipit/trace.py:210-292);
* the calling-context node id is a stable hash chain over the name path,
  replacing the reference's object graph (pipit/util/cct.py:73-93);
* inclusive metrics (value at Leave minus value at Enter,
  pipit/trace.py:294-327) are computed in the same pass, which removes the
  reference's positional self-lookup — and in Spark would otherwise be a
  full self-join shuffle.

Scale design: events are shuffled once, by (process, thread); each location
is processed independently (Arrow-batched), so the pass parallelizes over
locations exactly like the reference's multiprocessing pool but across
executors. A per-location partition must fit in executor memory — same
envelope the reference needs per worker.

A pure-SQL window-function fast path for well-nested traces is provided in
:func:`well_nested_matching_sql` (used by tests and the DuckDB oracle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .. import schema as S


def _encode_map_cols(events: DataFrame) -> tuple[DataFrame, dict]:
    """Re-encode MapType columns as JSON strings for the worker round
    trip. Spark's Arrow map (de)serialization is ~27× slower than the
    rest of the row put together — an all-null map column alone took an
    identity mapInArrow pass at 18M rows from 5.6 s to 150 s. The
    matching kernel never reads these columns, so they tunnel through as
    opaque strings (to_json/from_json are JVM-side codegen, and null
    maps stay null)."""
    map_cols = {
        f.name: f.dataType
        for f in events.schema.fields
        if isinstance(f.dataType, T.MapType)
    }
    enc = events
    for c in map_cols:
        enc = enc.withColumn(c, F.to_json(F.col(c)))
    return enc, map_cols


def _decode_map_cols(df: DataFrame, map_cols: dict) -> DataFrame:
    for c, dt in map_cols.items():
        df = df.withColumn(c, F.from_json(F.col(c), dt))
    return df


def _md5_i64(s: str) -> int:
    """Stable signed-int64 hash (first 8 bytes of md5, big-endian)."""
    h = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big", signed=True)


def _stack_match_multi(
    pdf: pd.DataFrame, group_cols: list[str], metric_cols: list[str]
) -> pd.DataFrame:
    """Fused matching pass over a partition holding MANY complete
    locations: one sort + two stack passes over the whole frame, with the
    stacks reset at every (process[, thread]) boundary.

    Identical semantics to running the pass one location at a time, but
    the pandas fixed costs (sort, copy, nullable-array assembly) are paid
    once per *partition* instead of once per *location* — at sf0.1 that is
    32 calls instead of 1,500, a ~2.5× wall-clock win on the whole pass.
    """
    pdf = pdf.sort_values(
        [*group_cols, S.TIMESTAMP, S.SEQ], kind="mergesort"
    ).reset_index(drop=True)
    n = len(pdf)
    evt = pdf[S.EVENT_TYPE].to_numpy()
    names = pdf[S.NAME].to_numpy()
    ts = pdf[S.TIMESTAMP].to_numpy()
    event_ids = pdf[S.EVENT_ID].to_numpy()

    # group-boundary mask; factorize maps nulls to one sentinel code so a
    # nullable thread column still groups its null rows together
    new_group = np.zeros(n, dtype=bool)
    if n:
        new_group[0] = True
        for c in group_cols:
            codes, _ = pd.factorize(pdf[c], use_na_sentinel=True)
            new_group[1:] |= codes[1:] != codes[:-1]

    is_enter = np.isin(evt, S.ENTER_TYPES)
    is_leave = np.isin(evt, S.LEAVE_TYPES)
    match_pos = np.full(n, -1, dtype=np.int64)

    # pass 1: nearest-same-name stack matching (pipit/trace.py:154-186)
    stack: list[int] = []
    for i in range(n):
        if new_group[i]:
            stack.clear()
        if is_enter[i]:
            stack.append(i)
        elif is_leave[i]:
            for k in range(len(stack) - 1, -1, -1):
                if names[stack[k]] == names[i]:
                    j = stack.pop(k)
                    match_pos[i] = j
                    match_pos[j] = i
                    break

    # pass 2: depth/parent/node for matched rows (pipit/trace.py:240-292).
    # node_memo keys on (parent node id, name) — a pure-function memo, so
    # it safely persists across group boundaries.
    depth = np.full(n, -1, dtype=np.int64)
    parent_pos = np.full(n, -1, dtype=np.int64)
    node_of = np.zeros(n, dtype=np.int64)
    has_node = np.zeros(n, dtype=bool)
    node_memo: dict[tuple[int, str], int] = {}
    call_stack: list[int] = []
    for i in range(n):
        if new_group[i]:
            call_stack.clear()
        if match_pos[i] < 0:
            # true Instants (sends/recvs/markers) inherit their ENCLOSING
            # call: depth/parent of the innermost open Enter. The
            # reference leaves these NaN (pipit/trace.py:240-292 walks
            # Enter/Leave only) — carrying them here is free in the same
            # pass and enables per-function attribution of communication
            # (comm_by_function) without any join back to the call rows.
            # Unmatched Enter/Leave (malformed traces) stay NaN.
            if not is_enter[i] and not is_leave[i] and call_stack:
                top = call_stack[-1]
                depth[i] = depth[top] + 1
                parent_pos[i] = top
            continue
        if is_enter[i]:
            depth[i] = len(call_stack)
            pid = -1
            if call_stack:
                parent_pos[i] = call_stack[-1]
                pid = node_of[call_stack[-1]]
            key = (pid, names[i])
            nid = node_memo.get(key)
            if nid is None:
                nid = _md5_i64(f"{pid}->{names[i]}")
                node_memo[key] = nid
            node_of[i] = nid
            has_node[i] = True
            call_stack.append(i)
        else:
            ep = match_pos[i]
            if call_stack and call_stack[-1] == ep:
                call_stack.pop()
            else:
                try:
                    call_stack.remove(ep)
                except ValueError:
                    pass
            depth[i] = depth[ep]
            parent_pos[i] = parent_pos[ep]
            node_of[i] = node_of[ep]
            has_node[i] = has_node[ep]

    matched = match_pos >= 0
    safe_match = np.where(matched, match_pos, 0)

    out = pdf.copy()
    out[S.MATCHING_EVENT] = pd.array(
        np.where(matched, event_ids[safe_match], 0), dtype="Int64"
    )
    out.loc[~matched, S.MATCHING_EVENT] = pd.NA
    out[S.MATCHING_TS] = pd.array(np.where(matched, ts[safe_match], 0), dtype="Int64")
    out.loc[~matched, S.MATCHING_TS] = pd.NA

    hasd = depth >= 0
    out[S.DEPTH] = pd.array(np.where(hasd, depth, 0), dtype="Int32")
    out.loc[~hasd, S.DEPTH] = pd.NA

    hasp = parent_pos >= 0
    safe_par = np.where(hasp, parent_pos, 0)
    out[S.PARENT] = pd.array(np.where(hasp, event_ids[safe_par], 0), dtype="Int64")
    out.loc[~hasp, S.PARENT] = pd.NA
    out[S.PARENT_NAME] = np.where(hasp, names[safe_par], None)

    out[S.NODE_ID] = pd.array(node_of, dtype="Int64")
    out.loc[~has_node, S.NODE_ID] = pd.NA
    # caller's node id (root calls keep NA): parents are matched Enters,
    # so node_of[parent] is always populated when parent_pos >= 0
    out[S.PARENT_NODE] = pd.array(node_of[safe_par], dtype="Int64")
    out.loc[~hasp, S.PARENT_NODE] = pd.NA

    enter_matched = matched & is_enter
    out[S.TIME_INC] = np.where(
        enter_matched, (ts[safe_match] - ts).astype("float64"), np.nan
    )
    for m in metric_cols:
        vals = pdf[m].to_numpy(dtype="float64", na_value=np.nan)
        out[f"{m}_inc"] = np.where(enter_matched, vals[safe_match] - vals, np.nan)
    return out


def match_events(
    events: DataFrame,
    metric_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run the fused matching pass over the whole trace.

    Returns the input columns plus ``matching_event_id``,
    ``matching_timestamp_ns``, ``depth``, ``parent_event_id``, ``node_id``,
    ``time_inc`` and ``<metric>_inc`` for each requested metric column.

    Physical plan: ONE hash shuffle by (process[, thread]) into
    ``num_partitions`` tasks (default: cluster parallelism), then a single
    ``mapInPandas`` pass per partition running the multi-location kernel —
    every location is complete within its partition, and the per-location
    pandas fixed costs are amortized across the whole partition. This
    replaces the earlier ``groupBy().applyInPandas`` plan, which paid one
    Arrow round-trip + pandas sort/copy per location (2.5× slower with
    1,500 locations at sf0.1; the gap widens with location count, which is
    exactly the axis traces grow along).

    Scale envelope: a partition (several complete locations) must fit in
    executor memory — raise ``num_partitions`` to shrink partitions toward
    one location each; the limit is then the reference's own per-worker
    envelope (one location's events in RAM).
    """
    metric_cols = list(metric_cols or [])
    enc, map_cols = _encode_map_cols(events)
    out_schema = S.matched_schema(enc.schema, metric_cols)
    group_cols = [S.PROCESS]
    if S.THREAD in events.columns:
        group_cols.append(S.THREAD)
    n_part = num_partitions or events.sparkSession.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if not pdf.empty:
            yield _stack_match_multi(pdf, group_cols, metric_cols)

    out = enc.repartition(n_part, *group_cols).mapInPandas(
        gen, schema=out_schema
    )
    return _decode_map_cols(out, map_cols)


def match_events_iter(
    events: DataFrame, metric_cols: list[str] | None = None
) -> DataFrame:
    """mapInPandas variant for traces already partitioned by location on
    disk — avoids the shuffle entirely (zero-exchange plan when the
    parquet layout matches). Same multi-location kernel as
    :func:`match_events`, minus the repartition.
    """
    metric_cols = list(metric_cols or [])
    enc, map_cols = _encode_map_cols(events)
    out_schema = S.matched_schema(enc.schema, metric_cols)
    group_cols = [S.PROCESS] + ([S.THREAD] if S.THREAD in events.columns else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if not pdf.empty:
            yield _stack_match_multi(pdf, group_cols, metric_cols)

    return _decode_map_cols(enc.mapInPandas(gen, schema=out_schema), map_cols)


def well_nested_matching_sql(events_rel: str = "events") -> str:
    """ANSI-SQL window-function form of the matching pass, valid for
    WELL-NESTED traces (every Leave closes the most recent open Enter of
    the same name). Used as the DuckDB oracle for the pandas path and as
    documentation of the Catalyst-native alternative.

    depth(Enter) = running sum(+1/-1) - 1; the k-th Enter of a (location,
    name, depth) pairs with its k-th Leave.
    """
    return f"""
WITH el AS (
    SELECT *,
           SUM(CASE WHEN event_type = 'Enter' THEN 1
                    WHEN event_type = 'Leave' THEN -1 ELSE 0 END)
               OVER (PARTITION BY process ORDER BY timestamp_ns, seq
                     ROWS UNBOUNDED PRECEDING) AS cum
    FROM {events_rel}
    WHERE event_type IN ('Enter', 'Leave')
),
keyed AS (
    SELECT *,
           CASE WHEN event_type = 'Enter' THEN cum - 1 ELSE cum END AS d,
           ROW_NUMBER() OVER (
               PARTITION BY process, name,
                   CASE WHEN event_type = 'Enter' THEN cum - 1 ELSE cum END,
                   event_type
               ORDER BY timestamp_ns, seq) AS rn
    FROM el
)
SELECT e.event_id            AS event_id,
       e.process             AS process,
       e.name                AS name,
       CAST(e.d AS INTEGER)  AS depth,
       l.event_id            AS matching_event_id,
       CAST(l.timestamp_ns - e.timestamp_ns AS DOUBLE) AS time_inc
FROM keyed e
JOIN keyed l
  ON e.process = l.process AND e.name = l.name AND e.d = l.d AND e.rn = l.rn
 AND e.event_type = 'Enter' AND l.event_type = 'Leave'
"""
