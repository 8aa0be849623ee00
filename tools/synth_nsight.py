"""Synthesize an Nsight-style interval CSV report at arbitrary row
volume — the scale fixture for read_nsight (the golden traces carry no
Nsight report; the reference's own tests build toy frames inline,
pipit/readers/nsight_reader.py:58-77).

One row per kernel/range interval: Name, Start (ns), End (ns), PID,
TID — the column set the reader unpivots to Enter/Leave and
dense-renumbers. Written as MULTIPLE plain-text CSV shards (plain CSV
is splittable, and shard generation parallelizes across processes),
deterministic per shard id.

Usage: python tools/synth_nsight.py OUTDIR N_ROWS [N_SHARDS]
"""

from __future__ import annotations

import os
import sys

import numpy as np

N_NAMES = 24
N_PIDS = 8
N_TIDS = 4


def write_shard(args) -> int:
    outdir, shard, rows = args
    rng = np.random.default_rng(0xA51 + shard)
    start = (
        np.int64(1_000_000) * shard
        + np.cumsum(rng.integers(1, 50, size=rows, dtype=np.int64))
    )
    dur = rng.integers(10, 5_000, size=rows, dtype=np.int64)
    names = rng.integers(0, N_NAMES, size=rows)
    pids = 1000 + rng.integers(0, N_PIDS, size=rows) * 7
    tids = pids + rng.integers(0, N_TIDS, size=rows)

    import pyarrow as pa
    from pyarrow import csv as pacsv

    tbl = pa.table({
        "Name": pa.array([f"kernel_{i}" for i in range(N_NAMES)])
        .take(pa.array(names)),
        "Start (ns)": pa.array(start),
        "End (ns)": pa.array(start + dur),
        "PID": pa.array(pids),
        "TID": pa.array(tids),
    })
    pacsv.write_csv(
        tbl, os.path.join(outdir, f"report_{shard:03d}.csv")
    )
    return rows


def synthesize(outdir: str, n_rows: int, n_shards: int = 16) -> int:
    os.makedirs(outdir, exist_ok=True)
    per = n_rows // n_shards
    jobs = [
        (outdir, s, per if s < n_shards - 1 else n_rows - per * (n_shards - 1))
        for s in range(n_shards)
    ]
    from concurrent.futures import ProcessPoolExecutor

    if n_shards <= 2:
        return sum(write_shard(j) for j in jobs)
    with ProcessPoolExecutor(max_workers=min(16, n_shards)) as ex:
        return sum(ex.map(write_shard, jobs))


if __name__ == "__main__":
    outdir, n_rows = sys.argv[1], int(sys.argv[2])
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n = synthesize(outdir, n_rows, n_shards)
    print(f"{outdir}: {n} interval rows in {n_shards} shards")
