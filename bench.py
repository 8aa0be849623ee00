"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed to full materialization (count of the result —
results are small aggregates, so the count forces the whole plan without
driver-transfer noise).

Methodology (reformed in r07 — the r06 artifact was recorded under
session contention and overstated costs by up to 2x on some queries):

- Pass 0 (cold): one full sequence with a state reset first; pays JVM
  JIT / whole-stage-codegen compilation. Timings go to stderr only —
  a real cluster amortizes compilation once per executor lifetime
  while the data work scales with input size.
- Passes 1..R (steady, R >= 3): each preceded by a full engine-state
  reset (``queries.clear_state``: trace memo unpersisted, portable ANN
  caches released, ``spark.catalog.clearCache()``), so every steady
  pass repeats ALL data work — derivation, shuffles, matching,
  persists — and differs from the cold pass only in warm compilation.
  The REPORTED per-query number is the MEDIAN across the steady
  passes: robust to a one-off GC pause or a competing process on the
  box, which a single pass is not.
- Contamination tripwire (the PLANS.md §19 "pass2 > pass1 was the
  tell"): passes get FASTER as compilation tiers warm — a later pass
  running SLOWER than an earlier one means something else was using
  the box. The JSON carries ``pass_totals`` (cold first) and
  ``contaminated: true`` whenever the median steady total exceeds the
  cold total or the LAST steady pass exceeds the fastest steady pass
  by >25% — a contaminated artifact says so instead of silently
  poisoning the round-over-round comparison. (Monotone speed-up
  across steady passes is normal tiered-JIT behavior, not
  contamination; the median absorbs it.)
- Cooling-box tripwire (r11 verdict: the driver bench inflated 25%/10%
  two rounds running with ``contaminated: false`` — pass totals were
  STILL declining at the last rep, i.e. the box was cooling down from
  prior heavy load and every pass, median included, was inflated; the
  median-vs-cold and last-vs-fastest checks cannot see that shape).
  ``cooling: true`` fires when steady totals decline monotonically AND
  the last is >5% below the first — the run has not reached steady
  state and the median overstates the engine. The JSON also always
  carries ``queries_min`` (per-query minimum across steady passes) and
  ``min_total`` — the quiet-box reference number — so one artifact
  holds both readings and a driver comparing medians across rounds can
  cross-check against the floor.

Within a pass, state flows exactly as the engine runs in production:
the first trace query pays the fused matching pass and later trace
queries reuse the memoized frame (the reference memoizes the same way,
pipit/trace.py:111,202).

Env knobs: SPARK_GRAFT_BENCH_REPS (steady passes, default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


HEADLINE = [
    # trace engine core path: derivation + fused stack-match applyInPandas
    "trace_match_inc",
    "trace_flat_profile",
    "trace_session_stats",
    "trace_comm_matrix",
    "trace_time_profile",
    # relational layer
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q14_promo_revenue",
    "q18_large_volume",
    "window_topk_orders",
    "sessionize_events",
    "asof_attribution",
    # LLM-data operators
    "doc_training_set",
    "doc_clean_corpus",
    "doc_text_stats",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "doc_despan",
    "doc_bpe",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_semantic_dedup",
    "q21_waiting_orders",
    # round-4 session-2 additions
    "trace_message_latency",
    "doc_tfidf",
    "emb_hamming_topk",
    "doc_bm25",
    # round-5 additions
    "doc_bigram_lm",
    "web_dedup_urls",
    "emb_isolation",
    "trace_caller_callee",
    # round-5 session-3: real codec + portable ANN ensemble
    "media_decode_real",
    "emb_rrf_fusion",
    # round-6: build-once/search-many — fused search over the
    # persisted LSH band + IVF cell indexes (built in setup, untimed:
    # at 100 TB the build runs once per corpus revision, this is what
    # every query batch pays)
    "emb_rrf_fusion_indexed",
]


def cooling_box(steady_totals: list[float]) -> bool:
    """True when steady pass totals are STILL falling monotonically by
    >5% at the last rep — the cooling-box shape the r10/r11 driver
    benches showed (25%/10% inflation with ``contaminated: false``):
    the box has not reached steady state, so every pass, the median
    included, overstates the engine. Needs >= 3 steady passes (two
    points cannot distinguish cooldown from normal JIT warm-up)."""
    return bool(
        len(steady_totals) >= 3
        and all(
            steady_totals[i + 1] < steady_totals[i]
            for i in range(len(steady_totals) - 1)
        )
        and steady_totals[-1] < 0.95 * steady_totals[0]
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    reps = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q

    spark = get_spark(app_name="pipit-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM codegen, parquet reader init, Arrow + python worker
    # pool spin-up — so per-query timings measure plans, not process
    # startup (a real cluster amortizes these once per executor)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").applyInPandas(
        lambda pdf: pdf.head(1), schema=warm.schema
    ).count()

    registry = Q.queries()
    names = sys.argv[1:] or HEADLINE
    # the bench measures the library's scale path under the operator's
    # stable label: doc_minhash_lsh times the xxhash64 fast mode (the
    # registry's doc_minhash_lsh / _fast entries both run
    # oracle-replayable hash families that exist for the correctness
    # gate; xxhash64 is what a production corpus runs)
    from pipit_spark.llm import dedup as _D

    def _minhash_xxh(s, d):
        return _D.minhash_lsh_pairs(
            Q.load(s, d, "documents"), num_hashes=16, bands=8
        )

    extras = {"doc_minhash_lsh": _minhash_xxh}
    # index-build setup, untimed (build-once/search-many: the indexed
    # fusion gate measures the per-batch search cost)
    Q.ensure_portable_ann_indexes(spark, sf_dir)

    # per_pass[p][name] = sec; pass 0 is the cold (compile) pass
    per_pass: list[dict[str, float]] = []
    for pass_no in range(reps + 1):
        Q.clear_state(spark)
        cur: dict[str, float] = {}
        for name in names:
            fn = extras.get(name) or registry[name]
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            cur[name] = round(time.perf_counter() - t0, 3)
            tag = "cold" if pass_no == 0 else f"steady{pass_no}"
            print(
                f"# {tag} {name}: {cur[name]:.3f}s ({n} rows)",
                file=sys.stderr,
            )
        per_pass.append(cur)

    steady = per_pass[1:]
    timings = {
        name: round(statistics.median(p[name] for p in steady), 3)
        for name in names
    }
    pass_totals = [round(sum(p.values()), 3) for p in per_pass]
    steady_totals = pass_totals[1:]
    total = round(sum(timings.values()), 3)
    contaminated = bool(
        total > pass_totals[0]
        or steady_totals[-1] > 1.25 * min(steady_totals)
    )
    cooling = cooling_box(steady_totals)
    queries_min = {
        name: round(min(p[name] for p in steady), 3) for name in names
    }
    min_total = round(sum(queries_min.values()), 3)
    if contaminated:
        print(
            "# WARNING: contaminated run — steady median "
            f"{total}s vs cold {pass_totals[0]}s, steady spread "
            f"{min(steady_totals)}..{max(steady_totals)}s; the box was "
            "not idle, re-run for a trustworthy artifact",
            file=sys.stderr,
        )
    if cooling:
        print(
            "# WARNING: cooling box — steady totals still declining "
            f"monotonically ({'->'.join(str(t) for t in steady_totals)}s, "
            f"last {100 * (1 - steady_totals[-1] / steady_totals[0]):.0f}% "
            "below first); the median overstates the engine — prefer "
            f"min_total={min_total}s or re-run on an idle box",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "pass_totals": pass_totals,
                "contaminated": contaminated,
                "cooling": cooling,
                "queries_min": queries_min,
                "min_total": min_total,
            }
        )
    )


if __name__ == "__main__":
    main()
