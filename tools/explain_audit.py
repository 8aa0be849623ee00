"""Regenerate the physical-plan evidence behind PLANS.md.

Usage: PYTHONPATH=. python tools/explain_audit.py [sf_dir]
Prints the formatted plan tree + scan details (PushedFilters/ReadSchema)
for each flagship operator.
"""

from __future__ import annotations

import contextlib
import io
import sys


def cap(df, label: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    print(f"==== {label} ====")
    print(txt.split("\n\n")[0])
    for line in txt.splitlines():
        if "PushedFilters" in line or "ReadSchema" in line:
            print(line.strip())
    print()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pipit_spark.llm import dedup as D

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    cap(Q.q6_forecast_revenue(spark, sf), "q6 selective scan")
    t = Q.derived_trace(spark, sf)
    cap(t.matched, "fused matching pass")
    cap(t.comm_matrix(), "comm_matrix")
    cap(t.time_profile(num_bins=20), "time_profile")
    cap(t.flat_profile(), "flat_profile")
    cap(D.minhash_lsh_pairs(Q.load(spark, sf, "documents"), 16, 8), "minhash_lsh")

    from pipit_spark.llm import quality as QL
    from pipit_spark.llm import similarity as V
    from pipit_spark.operators.relational import funnel, percentile_outliers

    docs = Q.load(spark, sf, "documents")
    cap(QL.heuristic_filter(docs), "heuristic_filter (single scan)")
    cap(QL.pii_redact(docs), "pii_redact (narrow map)")
    cap(
        percentile_outliers(Q.load(spark, sf, "events")),
        "percentile_outliers (broadcast threshold)",
    )
    cap(
        funnel(Q.load(spark, sf, "events"), ["view", "click", "purchase"]),
        "funnel (per-step pushdown)",
    )
    cap(
        V.quantize_embeddings(Q.load(spark, sf, "embeddings")),
        "quantize_embeddings (no shuffle)",
    )
    cap(
        D.remove_repeated_spans(docs),
        "remove_repeated_spans (3 shuffles, conditional-agg reassembly)",
    )
    cap(
        V.semantic_dedup(Q.load(spark, sf, "embeddings"), nlist=4),
        "semantic_dedup (one cell shuffle + per-cell kernel)",
    )
    cap(Q.q21_waiting_orders(spark, sf), "q21 (window decorrelation)")


if __name__ == "__main__":
    main()
