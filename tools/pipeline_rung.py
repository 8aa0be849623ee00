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
         SPARK_GRAFT_DRIVER_MEM=48g \
         python tools/pipeline_rung.py [fixture_dir]

Sizing (the r04 rung's guidance, re-confirmed here): match partitions
~500k rows/task, and the local-mode JVM needs headroom beyond the 8g
default because ingest + matching run in ONE JVM whose Arrow direct
buffers accumulate across stages — at 120M events the default heap
aborts the match stage with Arrow OutOfMemoryException (task retries
then job failure), while a clean JVM running ONLY match+write passes
at 8g. On a real cluster each executor has its own direct pool, so
the binding constraint is per-task batch size (the partitions knob),
not this single-JVM artifact.
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
