"""Time EVERY registry gate once (steady-state: trace memo warmed by
the first trace gate, caches cleared between gates exactly like
bench.py) and write one JSON object {gate: seconds} plus totals.

The 34-query bench is the round-over-round headline; this is the
full-breadth per-operator profile — the artifact that shows no gate
hides a pathological plan behind the bench's selection.

A per-gate TIME BUDGET tripwire guards the sweep as the registry
grows: any single gate above BUDGET_SEC (steady-state, sf0.1) fails
the run loudly — a future quadratic gate cannot hide inside a growing
total. Known-slow gates with an audited reason carry an explicit
allowance in BUDGET_EXCEPTIONS rather than a raised global budget.

Usage: PYTHONPATH=. python tools/time_registry.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

# steady-state per-gate ceiling at sf0.1 (seconds). The registry's
# p99 sits near 5 s on an idle box; 8 s holds headroom for noise
# without letting a new O(n^2) gate pass unnoticed.
BUDGET_SEC = 8.0
BUDGET_EXCEPTIONS: dict[str, float] = {
    # EMPTY since r11 — every gate holds the global budget.
    # Graveyard (so nobody re-adds these without reading why they
    # left): doc_simhash_pairs 14 s removed r11 (winnow-style reform:
    # count-first bucket filter, streaming self-join instead of
    # collect_list buffers, packed-word hamming verified BEFORE the
    # pair-dedup shuffle — 3.3 s steady at sf0.1);
    # emb_pq_topk_exact / emb_ivfpq_topk_exact 12 s removed r11
    # (stale headroom: both measured 3.7-4.7 s in the r10 AND r11
    # sweeps — the lossless |corpus|-LUT configs never actually
    # exceeded the budget after the r07 compressed-path reform);
    # profile_lineitem 12 s removed r08 (bounded column subset).
}


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
    # pass 1 warms JVM/JIT and the IO cache; the record is the MIN
    # over both passes — the same noise-floor estimator bench.py's
    # queries_min uses (r12; recording pass 2 alone let a
    # mid-sweep box slowdown masquerade as per-gate regressions:
    # the budget tripwire must fire on plans, not on box weather)
    for pass_no in (1, 2):
        Q.clear_state(spark)
        for name, fn in registry.items():
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            print(
                f"# pass{pass_no} {name}: {dt:.3f}s ({n} rows)",
                file=sys.stderr,
            )
    total = round(sum(timings.values()), 3)
    over = {
        name: t
        for name, t in timings.items()
        if t > BUDGET_EXCEPTIONS.get(name, BUDGET_SEC)
    }
    doc = {
        "sf_dir": sf_dir,
        "gates": len(timings),
        "total_sec": total,
        "budget_sec": BUDGET_SEC,
        "over_budget": dict(sorted(over.items(), key=lambda kv: -kv[1])),
        "timings": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"gates": len(timings), "total_sec": total,
                      "over_budget": sorted(over)}))
    if over:
        print(
            f"BUDGET EXCEEDED: {over} — audit the plan or add an "
            "explicit exception with its reason",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
