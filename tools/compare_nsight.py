"""Nsight ingestion head-to-head: reference pandas NsightReader vs
read_nsight on the SAME interval data, same machine — completing the
per-reader comparison set (analysis + Projections + OTF2 rungs live
in COMPARE.json already).

The reference reader takes ONE csv (pandas read_csv → per-PID python
renumber loop → frame copy → concat → global sort,
pipit/readers/nsight_reader.py:25-77), so the fixture is written both
ways: a single concatenated CSV for the reference, the sharded
directory for us (shards are also what a real exporter rotation
produces; Spark reads either splittably).

Appends a rung entry to COMPARE.json.

Usage: PYTHONPATH=. python tools/compare_nsight.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.synth_nsight import synthesize  # noqa: E402

NSIGHT_SCHEMA = (
    "`Name` STRING, `Start (ns)` BIGINT, `End (ns)` BIGINT, "
    "`PID` BIGINT, `TID` BIGINT"
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    outdir = "/tmp/cmp_nsight_shards"
    single = "/tmp/cmp_nsight_single.csv"

    if not os.path.exists(os.path.join(outdir, "report_000.csv")):
        synthesize(outdir, n_rows)
    if not os.path.exists(single):
        with open(single, "w") as out:
            first = True
            for f in sorted(os.listdir(outdir)):
                with open(os.path.join(outdir, f)) as src:
                    header = src.readline()
                    if first:
                        out.write(header)
                        first = False
                    shutil.copyfileobj(src, out)

    # ours
    from pipit_spark.session import get_spark
    from pipit_spark.sources.nsight import read_nsight

    spark = get_spark(app_name="compare-nsight")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ours = n = None
    for _ in (1, 2):  # steady-state pass 2
        t0 = time.perf_counter()
        n = read_nsight(spark, outdir, schema=NSIGHT_SCHEMA).count()
        ours = time.perf_counter() - t0

    # reference (its own single-process path, same box)
    sys.path.insert(0, "/root/reference")
    from pipit.readers.nsight_reader import NsightReader

    t0 = time.perf_counter()
    ref_df = NsightReader(single).read()
    ref = time.perf_counter() - t0
    ref_events = len(ref_df.events) if hasattr(ref_df, "events") else None

    entry = {
        "rung": "ingestion_nsight_x1m",
        "n_events": n,
        "pipit_spark_sec": {"read": round(ours, 2), "n_events": n},
        "reference_pandas_sec": {"read": round(ref, 2),
                                 "n_events": ref_events},
        "speedup_total": round(ref / ours, 2),
        "note": (
            "round-8 head-to-head on the same synthetic interval data "
            "(tools/synth_nsight.py). Reference = pandas read_csv + "
            "per-PID python renumber + concat + global sort on one "
            "core (its only mode, single csv); ours = splittable-CSV "
            "scan + stack unpivot + distinct-set broadcast renumber "
            "across local[32] (SCALING.md round-8 Nsight rung)."
        ),
    }
    print(json.dumps(entry))
    data = json.load(open("COMPARE.json"))
    data = [e for e in data if e.get("rung") != "ingestion_nsight_x1m"]
    data.append(entry)
    json.dump(data, open("COMPARE.json", "w"), indent=1)


if __name__ == "__main__":
    main()
