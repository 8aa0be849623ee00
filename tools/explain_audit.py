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




def audit_round3(sf: str = "/root/testdata/sf0.01") -> None:
    """Round-3 additions (run after main(), same session)."""
    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pipit_spark.llm import sampling as SP
    from pipit_spark.llm import text as X
    from pipit_spark.llm import dedup as D

    spark = get_spark(app_name="explain-audit")
    docs = Q.load(spark, sf, "documents")
    cap(SP.chunk_documents(docs), "chunk_documents (narrow, no shuffle)")
    cap(X.vocab_coverage(docs), "vocab_coverage (TakeOrdered + BHJ probe)")
    cap(
        D.edit_verified_pairs(docs, cand_threshold=0.15, edit_threshold=0.3),
        "edit_verified_pairs (candidates only)",
    )
    t = Q.derived_trace(spark, sf)
    cap(t.slow_calls(), "slow_calls (broadcast threshold)")
    cap(t.folded_stacks(), "folded_stacks (node-table broadcast)")


def audit_round5(sf: str = "/root/testdata/sf0.01") -> None:
    """Round-5 session-4 additions (run after main(), same session)."""
    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pipit_spark.llm import dedup as D
    from pipit_spark.llm import quality as QL
    from pipit_spark.llm import sketches as SK

    spark = get_spark(app_name="explain-audit")
    docs = Q.load(spark, sf, "documents")
    cap(QL.license_filter(docs), "license_filter (single scan)")
    cap(
        D.kmv_source_similarity(docs, k=64),
        "kmv_source_similarity (two-phase k-min, broadcast pair stage)",
    )
    cap(
        SK.cms_build(docs, width=1024, depth=4),
        "cms_build (one scan, map-side combine)",
    )
    t = Q.derived_trace(spark, sf)
    cap(t.late_senders(), "late_senders (id joins + channel agg)")


if __name__ == "__main__":
    main()
    audit_round5()
    audit_round3(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
