"""End-to-end trace analysis walkthrough — the reference's CSV-reader
example (reference docs/examples/csv_reader.py) grown into the full
analysis session this engine supports. Run from the repo root:

    PYTHONPATH=. python examples/trace_analysis.py [trace.csv]

Defaults to the bundled foo-bar golden trace (tests/data/foo-bar.csv).
"""

from __future__ import annotations

import sys


def main() -> None:
    from pipit_spark import Trace, get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/foo-bar.csv"
    spark = get_spark(app_name="trace-analysis-example")
    spark.sparkContext.setLogLevel("ERROR")

    t = Trace.from_csv(spark, path)
    print("== summary ==")
    print(t.summary())

    print("== flat profile (inclusive / exclusive ns) ==")
    t.flat_profile(metrics=["time_inc", "time_exc"]).orderBy(
        "time_exc", ascending=False
    ).show(truncate=False)

    print("== load imbalance ==")
    t.load_imbalance(metric="time_inc").show(truncate=False)

    print("== time profile (first bins) ==")
    t.time_profile(num_bins=10, pivot=True).show(5)

    print("== communication matrix ==")
    t.comm_matrix().show()

    print("== per-channel message latency (FIFO-matched) ==")
    t.message_latency().show(5)

    t.to_chrome("/tmp/trace_example.json")
    t.to_folded("/tmp/trace_example.folded")
    print("wrote /tmp/trace_example.json (chrome://tracing) and "
          "/tmp/trace_example.folded (flamegraph.pl)")


if __name__ == "__main__":
    main()
