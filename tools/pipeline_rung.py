"""End-to-end pipeline rung: raw trace ingest → canonical parquet →
fused matching checkpoint → profile queries, timed per stage at the
120M-event scale — the production shape a 100 TB deployment runs
(SCALING.md round-4 guidance: checkpoint derived state, reload
analysis-ready), now measured as one pipeline instead of isolated
rungs.

Stages:
  1. ingest:    read_projections over the x1m fixture → canonical
                parquet partitioned by process
  2. match:     Trace.from_parquet → fused matching pass →
                to_parquet(include_derived=True) checkpoint
  3. analyze:   Trace.from_parquet(derived checkpoint — seeds the
                matched frame, NO re-match) → flat_profile +
                load_imbalance, timed warm

Usage: PYTHONPATH=. SPARK_GRAFT_MATCH_PARTITIONS=256 \
         python tools/pipeline_rung.py [fixture_dir]

Sizing (the r04 rung's guidance, re-confirmed here): match partitions
~500k rows/task. The r07 runs additionally needed
SPARK_GRAFT_DRIVER_MEM raised by hand because ingest + matching run
in ONE local JVM whose Arrow direct buffers accumulate across stages
(PLANS.md §21 Trap 1); since r08 the session builder caps direct
memory explicitly (-XX:MaxDirectMemorySize, decoupled from heap), so
the STOCK session runs this rung end-to-end — measured at 120M:
ingest 54.1 s / match 163.6 s / profile 5.1 s + 1.6 s, no env vars.
On a real cluster each executor has its own direct pool, so the
binding constraint is per-task batch size (the partitions knob).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_proj_x1m"
    ev_path = "/tmp/pipe_rung_events.parquet"
    ck_path = "/tmp/pipe_rung_matched.parquet"

    from pipit_spark.session import get_spark
    from pipit_spark.trace import Trace

    spark = get_spark(app_name="pipeline-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def stage(name, fn):
        t0 = time.perf_counter()
        extra = fn() or {}
        sec = round(time.perf_counter() - t0, 2)
        print(json.dumps({"stage": name, "sec": sec, **extra}))
        return extra

    # 1. ingest → canonical parquet
    def ingest():
        t = Trace.from_projections(spark, fixture)
        t.to_parquet(ev_path)
        n = spark.read.parquet(ev_path).count()
        return {"events": n}

    stage("ingest_to_parquet", ingest)

    # 2. fused matching pass → derived checkpoint
    def match():
        t = Trace.from_parquet(spark, ev_path)
        t._cache = False  # single-consumer pipeline (SCALING.md r04)
        t.to_parquet(ck_path, include_derived=True)
        return {"partitions": t._match_partitions}

    stage("match_checkpoint", match)

    # 3. analysis on the reloaded checkpoint (no re-match)
    t = Trace.from_parquet(spark, ck_path)
    assert t._matched is not None, "checkpoint did not seed matched"
    stage(
        "flat_profile",
        lambda: {"rows": t.flat_profile(
            metrics=["time_inc", "time_exc"]).count()},
    )
    stage(
        "load_imbalance",
        lambda: {"rows": t.load_imbalance(metric="time_exc").count()},
    )


if __name__ == "__main__":
    main()
