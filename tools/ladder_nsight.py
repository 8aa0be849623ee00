"""Nsight ingestion ladder — the last reader without one (OTF2 126M,
Projections 120M, HPCToolkit 107M rungs all exist in SCALING.md).

Unlike the binary readers, Nsight reports are plain CSV: splittable,
so read parallelism is byte-range based (maxPartitionBytes), not
one-task-per-file — the ladder should show near-linear scaling with
no skew exposure. Each rung synthesizes sharded interval CSVs
(tools/synth_nsight.py), reads through read_nsight (unpivot to
Enter/Leave = 2 events/row + distinct-set dense renumber), and times
TWO full read→count passes, reporting the second (steady-state).

An explicit schema is passed at the top rungs the way a production
caller would (inferSchema is an extra full scan — measured below as
its own variant at the top rung so the cost is a recorded number,
not folklore).

Usage: PYTHONPATH=. python tools/ladder_nsight.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.synth_nsight import synthesize  # noqa: E402

# (tag, interval rows) — events = 2x rows (Enter + Leave)
RUNGS = [
    ("x10k", 600_000),
    ("x100k", 6_000_000),
    ("x1m", 60_000_000),
]

NSIGHT_SCHEMA = (
    "`Name` STRING, `Start (ns)` BIGINT, `End (ns)` BIGINT, "
    "`PID` BIGINT, `TID` BIGINT"
)


def main() -> None:
    keep = "--keep" in sys.argv

    from pipit_spark.session import get_spark
    from pipit_spark.sources.nsight import read_nsight

    spark = get_spark(app_name="ladder-nsight")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = []
    for tag, rows in RUNGS:
        outdir = f"/tmp/synth_nsight_{tag}"
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(outdir, "report_000.csv")):
            synthesize(outdir, rows)
        gen_s = time.perf_counter() - t0

        n = sec = None
        for _ in (1, 2):
            t0 = time.perf_counter()
            n = read_nsight(spark, outdir, schema=NSIGHT_SCHEMA).count()
            sec = time.perf_counter() - t0
        results.append((tag, n, sec))
        print(json.dumps({
            "rung": tag, "rows": rows, "events": n,
            "gen_sec": round(gen_s, 2), "read_sec": round(sec, 3),
            "events_per_sec": round(n / sec),
        }))

        if tag == RUNGS[-1][0]:
            # record the inferSchema tax at the top rung
            t0 = time.perf_counter()
            n2 = read_nsight(spark, outdir).count()
            sec2 = time.perf_counter() - t0
            print(json.dumps({
                "rung": f"{tag}_inferschema", "events": n2,
                "read_sec": round(sec2, 3),
                "vs_explicit_schema": round(sec2 / sec, 2),
            }))
        if not keep:
            shutil.rmtree(outdir, ignore_errors=True)

    base = results[0]
    print("# linearity vs first rung:", file=sys.stderr)
    for tag, n, sec in results[1:]:
        print(
            f"#   {tag}: events x{n / base[1]:.0f}, time x"
            f"{sec / base[2]:.1f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
