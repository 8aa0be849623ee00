"""Stateful streaming Enter/Leave matching.

The batch engine fuses the reference's stack passes into one grouped-map
per location (operators/matching.py). This module is the *streaming*
form: ``applyInPandasWithState`` keeps each (process, thread) location's
open-Enter stack as group state across micro-batches, emitting one
matched interval row per completed call — live trace analysis the
reference (batch pandas, SURVEY §2.7) has no counterpart for.

Semantics per location (same as the batch pass): events are processed in
(timestamp, seq) order; a Leave pops the nearest open Enter with the
same name (unbalanced-trace tolerance, pipit/trace.py:170-186);
inclusive time = leave_ts − enter_ts. Events may arrive across batch
boundaries — the stack survives in state. Late events inside a batch are
ordered by sort; cross-batch reordering is the caller's watermark
responsibility (trace streams are per-location monotone in practice).

State size = open-call depth per location (bounded by call depth, not
trace length).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import schema as S

MATCHED_INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField(S.PROCESS, T.IntegerType()),
        T.StructField("enter_event_id", T.LongType()),
        T.StructField("leave_event_id", T.LongType()),
        T.StructField(S.NAME, T.StringType()),
        T.StructField("enter_ts", T.LongType()),
        T.StructField("leave_ts", T.LongType()),
        T.StructField("time_inc", T.DoubleType()),
        T.StructField("depth", T.IntegerType()),
    ]
)

# state: one row per open Enter — (event_id, name, ts) triples kept as
# parallel lists (state schema must be a flat struct of simple types)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("names", T.ArrayType(T.StringType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
    ]
)


def streaming_match(events: DataFrame) -> DataFrame:
    """events stream → matched-interval stream (one row per completed
    call), state = per-location open-Enter stack."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, names, tss = state.get
            stack = [list(ids), list(names), list(tss)]
        else:
            stack = [[], [], []]
        process = int(key[0])

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([S.TIMESTAMP, S.SEQ], kind="mergesort")
            for eid, ts, etype, name in zip(
                pdf[S.EVENT_ID], pdf[S.TIMESTAMP],
                pdf[S.EVENT_TYPE], pdf[S.NAME],
            ):
                if etype in S.ENTER_TYPES:
                    stack[0].append(int(eid))
                    stack[1].append(name)
                    stack[2].append(int(ts))
                elif etype in S.LEAVE_TYPES:
                    for k in range(len(stack[1]) - 1, -1, -1):
                        if stack[1][k] == name:
                            out_rows.append(
                                (
                                    process,
                                    stack[0].pop(k),
                                    int(eid),
                                    stack[1].pop(k),
                                    (ets := stack[2].pop(k)),
                                    int(ts),
                                    float(int(ts) - ets),
                                    k,
                                )
                            )
                            break

        state.update((stack[0], stack[1], stack[2]))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[f.name for f in MATCHED_INTERVAL_SCHEMA.fields],
            )

    # project to the consumed columns before the worker boundary — extra
    # columns (esp. the MapType attributes, whose Arrow serialization is
    # ~27× the rest of the row) would otherwise ride through Python
    events = events.select(
        S.PROCESS, S.EVENT_ID, S.TIMESTAMP, S.SEQ, S.EVENT_TYPE, S.NAME
    )
    return events.groupBy(S.PROCESS).applyInPandasWithState(
        fn,
        outputStructType=MATCHED_INTERVAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
