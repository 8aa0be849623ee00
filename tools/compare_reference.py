"""Head-to-head throughput: this engine vs the reference's pandas
engine on the SAME canonical CSV trace.

Usage: PYTHONPATH=. python tools/compare_reference.py [n_events]

Exports the sf0.1-derived canonical trace (~283k events) to a
pipit-style CSV, then times the same pipeline in both engines:
read → enter/leave matching (+ caller/callee) → exclusive metrics →
flat profile → 50-bin time profile. Reference runs single-threaded
pandas (its design); ours runs local[$SPARK_GRAFT_CPUS].
Prints one JSON line with both timing dicts.
"""

from __future__ import annotations

import json
import os
import sys
import time


def export_csv(path: str, replicate: int = 1) -> int:
    """Export the sf0.1-derived trace, replicated ``replicate``× with
    shifted process ids — the way real traces grow (more ranks), which
    is also the matching pass's parallelism axis."""
    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pyspark.sql import functions as F

    spark = get_spark(app_name="export")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = Q.trace_events_frame(spark, sf_dir)
    nproc = 150
    rep = ev.select(
        "timestamp_ns", "event_type", "name", "process",
        F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("__r"),
    ).select(
        F.col("timestamp_ns").alias("Timestamp (ns)"),
        F.col("event_type").alias("Event Type"),
        F.col("name").alias("Name"),
        (F.col("process") + F.col("__r") * nproc).alias("Process"),
    )
    if os.environ.get("SPARK_GRAFT_OURS_ONLY"):
        # reference (pandas) skipped -> no single-file requirement:
        # write sharded CSV with Spark (spark.read.csv reads the dir),
        # avoiding a driver-side toPandas of the whole replicate
        n = rep.count()
        rep.write.mode("overwrite").option("header", True).csv(path)
        spark.stop()
        return n
    pdf = rep.orderBy("Timestamp (ns)").toPandas()
    pdf.to_csv(path, index=False)
    spark.stop()
    return len(pdf)


def time_reference(csv_path: str) -> dict:
    sys.path.insert(0, "/root/reference")
    import pipit

    out = {}
    t0 = time.perf_counter()
    tr = pipit.Trace.from_csv(csv_path)
    out["read_csv"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr._match_events()
    tr._match_caller_callee()
    out["matching"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.calc_exc_metrics()
    out["exc_metrics"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.flat_profile()
    out["flat_profile"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.time_profile(num_bins=50)
    out["time_profile"] = round(time.perf_counter() - t0, 2)

    out["total"] = round(sum(out.values()), 2)
    return out


def time_ours(csv_path: str) -> dict:
    from pipit_spark.session import get_spark
    from pipit_spark.trace import Trace
    from pipit_spark import schema as S

    spark = get_spark(app_name="compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    t0 = time.perf_counter()
    tr = Trace.from_csv(spark, csv_path)
    n = tr.events.count()
    out["read_csv"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.matched.count()  # fused pass: matching + caller/callee + inc
    out["matching"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.calc_exc_metrics().select(S.TIME_EXC).count()
    out["exc_metrics"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.flat_profile().count()
    out["flat_profile"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tr.time_profile(num_bins=50).count()
    out["time_profile"] = round(time.perf_counter() - t0, 2)

    out["total"] = round(sum(out.values()), 2)
    out["n_events"] = n
    return out


def main() -> None:
    scales = [int(s) for s in (sys.argv[1:] or ["1", "4", "16"])]
    results = []
    ours_only = bool(os.environ.get("SPARK_GRAFT_OURS_ONLY"))
    for k in scales:
        csv_path = f"/tmp/compare_trace_x{k}.csv"
        n = export_csv(csv_path, replicate=k)
        ours = time_ours(csv_path)
        row = {"replicate": k, "n_events": n, "pipit_spark_sec": ours}
        if not ours_only:
            ref = time_reference(csv_path)
            row["reference_pandas_sec"] = ref
            row["speedup_total"] = round(ref["total"] / ours["total"], 2)
        results.append(row)
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
