"""Chrome Tracing JSON sink (reference pipit/writers/chrome_writer.py:18-50).

Projection + rename + conditional phase mapping (Enter→'B', Leave→'E',
Instant→'i'), ns→µs. For cluster-scale traces the natural output is a
directory of JSON part files (``single_file=False``); the Chrome viewer
wants one file, so the default collects through ``toJSON`` — only
appropriate for display-sized traces, exactly like the reference's
driver-side ``to_json``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from .. import schema as S


def chrome_frame(events: DataFrame) -> DataFrame:
    ph = (
        F.when(F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES), "B")
        .when(F.col(S.EVENT_TYPE).isin(*S.LEAVE_TYPES), "E")
        .otherwise("i")
    )
    cols = [
        F.col(S.NAME).alias("name"),
        ph.alias("ph"),
        (F.col(S.TIMESTAMP) / 1000).cast("long").alias("ts"),
        F.col(S.PROCESS).alias("pid"),
    ]
    if S.THREAD in events.columns:
        cols.append(F.col(S.THREAD).alias("tid"))
    if S.ATTRIBUTES in events.columns:
        cols.append(F.col(S.ATTRIBUTES).alias("args"))
    return events.select(*cols).orderBy("ts")


def write_chrome(events: DataFrame, path: str, single_file: bool = True):
    cf = chrome_frame(events)
    if single_file:
        rows = [json.loads(r) for r in cf.toJSON().collect()]
        with open(path, "w") as f:
            json.dump(rows, f)
        return path
    cf.write.mode("overwrite").json(path)
    return path
