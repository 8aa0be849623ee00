"""Schema-adaptive timestamp ingestion (queries.load_events).

A user's events parquet may carry ``ts`` as TIMESTAMP(NANOS),
timestamp[us], timestamp[ms], or a plain epoch-ns long — the engine must
produce the identical long-ns column for all of them (reference
normalizes units per reader the same way: reference/pipit/trace.py:74-78).
Regression test for the round-2 fixture drift that zeroed 18 gates.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pipit_spark.queries import load_events

# epoch ns values, µs-aligned so every physical precision represents
# them exactly
TS_NS = [1704067200000000000, 1704067201500000000, 1704070000250000000]
EVIDS = [1, 2, 3]


def _write(tmp_path, name, ts_array):
    path = str(tmp_path / name)
    tbl = pa.table({"event_id": pa.array(EVIDS, pa.int64()), "ts": ts_array})
    pq.write_table(tbl, path)
    return path


@pytest.mark.parametrize(
    "typ",
    ["ns", "us", "ms", "long"],
)
def test_ts_physical_types_identical(spark, tmp_path, typ):
    if typ == "long":
        arr = pa.array(TS_NS, pa.int64())
    else:
        unit_div = {"ns": 1, "us": 1_000, "ms": 1_000_000}[typ]
        arr = pa.array(
            [t // unit_div for t in TS_NS], pa.timestamp(typ)
        )
    path = _write(tmp_path, f"events_{typ}.parquet", arr)
    df = load_events(spark, path)
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS_NS


def test_ts_absent_column_passthrough(spark, tmp_path):
    path = str(tmp_path / "no_ts.parquet")
    pq.write_table(pa.table({"event_id": pa.array(EVIDS, pa.int64())}), path)
    df = load_events(spark, path)
    assert df.columns == ["event_id"]
    assert df.count() == 3
