"""Time EVERY registry gate once (steady-state: trace memo warmed by
the first trace gate, caches cleared between gates exactly like
bench.py) and write one JSON object {gate: seconds} plus totals.

The 34-query bench is the round-over-round headline; this is the
full-breadth per-operator profile — the artifact that shows no gate
hides a pathological plan behind the bench's selection.

Usage: PYTHONPATH=. python tools/time_registry.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "REGISTRY_TIMES.json"

    from pipit_spark import queries as Q
    from pipit_spark.session import get_spark

    spark = get_spark(app_name="time-registry")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    registry = Q.queries()
    timings: dict[str, float] = {}
    # pass 1 warms JVM/JIT and the IO cache; pass 2 is the record
    for pass_no in (1, 2):
        Q.clear_state(spark)
        for name, fn in registry.items():
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# pass{pass_no} {name}: {timings[name]:.3f}s ({n} rows)",
                file=sys.stderr,
            )
    total = round(sum(timings.values()), 3)
    doc = {
        "sf_dir": sf_dir,
        "gates": len(timings),
        "total_sec": total,
        "timings": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"gates": len(timings), "total_sec": total}))


if __name__ == "__main__":
    main()
