"""Ingestion scale ladder: synthesize N-PE Projections fixtures at
10x-1000x the golden ping-pong volume and measure the binary-reader
fan-out (sources/projections.py:read_projections — spark.read.text
over per-PE .log.gz + one applyInPandas parse per file).

Reference behavior to beat: the reference parses PE logs with a
multiprocessing pool on one node (pipit/readers/otf2_reader.py:436-452
is the same pattern for OTF2); our axis of parallelism is the same
(one task per PE file — gzip is non-splittable) but spread across
executors, so throughput scales with min(PE count, cluster cores).

Each rung: generate (cached), then time TWO full read->count passes
and report the second (steady-state; pass 1 pays codegen). Emits one
JSON line per rung with events/s, then a linearity summary.

Usage: PYTHONPATH=. python tools/ladder_ingest.py [--keep]
       [--otf2|--hpct] [--x10m]
(--otf2 / --hpct run the same ladder over synthetic OTF2 archives /
HPCToolkit v4.0 databases through their Arrow-batched readers;
--x10m appends the billion-event rung from SCALING.md round 8.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.synth_hpctoolkit import synthesize as synthesize_hpct  # noqa: E402
from tools.synth_otf2 import synthesize as synthesize_otf2  # noqa: E402
from tools.synth_projections import synthesize  # noqa: E402

# (tag, num_pes, frames_per_pe) — events ~= frames*4.4 + idle pairs
# (projections); frames*3 (otf2: send + enter + leave per frame)
RUNGS = [
    ("x10", 4, 70),
    ("x100", 8, 350),
    ("x1k", 16, 1_700),
    ("x10k", 32, 8_500),
    ("x100k", 32, 85_000),
    ("x1m", 64, 425_000),
]

# --x10m appends the billion-event rung recorded in SCALING.md round 8
# (~1.2B projections / ~1.26B otf2 / ~1.07B hpctoolkit events). Heavy:
# 8-30 GB fixture per reader, ~5 min synth + ~5 min per read pass on a
# 32-core box — kept opt-in so the default ladder stays CI-sized.
X10M_RUNG = ("x10m", 128, 2_125_000)


def main() -> None:
    keep = "--keep" in sys.argv
    otf2 = "--otf2" in sys.argv
    hpct = "--hpct" in sys.argv
    if "--x10m" in sys.argv:
        RUNGS.append(X10M_RUNG)
    from pipit_spark.session import get_spark
    from pipit_spark.sources.hpctoolkit import read_hpctoolkit
    from pipit_spark.sources.otf2_native import read_otf2_native
    from pipit_spark.sources.projections import read_projections

    spark = get_spark(app_name="ladder-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = []
    for tag, pes, frames in RUNGS:
        if hpct:
            outdir = f"/tmp/synth_hpct_{tag}"
            t0 = time.perf_counter()
            if not os.path.exists(os.path.join(outdir, "trace.db")):
                # ~1 event per 2 samples (4-sample dwell, depth-2 tree)
                synthesize_hpct(outdir, pes, frames * 9)
            gen_s = time.perf_counter() - t0
        elif otf2:
            outdir = f"/tmp/synth_otf2_{tag}"
            t0 = time.perf_counter()
            if not os.path.exists(os.path.join(outdir, "traces.def")):
                # scale frames so event counts match the projections
                # ladder's rungs (~4.6 events/frame there vs 3 here)
                synthesize_otf2(outdir, pes, frames * 31 // 20)
            gen_s = time.perf_counter() - t0
        else:
            outdir = f"/tmp/synth_proj_{tag}"
            t0 = time.perf_counter()
            if not os.path.exists(os.path.join(outdir, "synth.prj.sts")):
                synthesize(outdir, pes, frames)
            gen_s = time.perf_counter() - t0
        n = read_sec = None
        for _ in (1, 2):
            t0 = time.perf_counter()
            if hpct:
                n = read_hpctoolkit(spark, outdir).count()
            elif otf2:
                n = read_otf2_native(spark, outdir)[0].count()
            else:
                n = read_projections(spark, outdir).count()
            read_sec = time.perf_counter() - t0
        rate = n / read_sec
        results.append((tag, pes, n, read_sec, rate))
        print(
            json.dumps(
                {
                    "rung": tag,
                    "pes": pes,
                    "events": n,
                    "gen_sec": round(gen_s, 2),
                    "read_sec": round(read_sec, 3),
                    "events_per_sec": round(rate),
                }
            )
        )
        if not keep:
            shutil.rmtree(outdir, ignore_errors=True)

    base = results[0]
    print("# linearity vs first rung (events x, time x):", file=sys.stderr)
    for tag, pes, n, sec, rate in results[1:]:
        print(
            f"#   {tag}: events x{n / base[2]:.0f}, time x"
            f"{sec / base[3]:.1f}, rate {rate / base[4]:.1f}x",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
