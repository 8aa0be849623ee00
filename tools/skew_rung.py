"""Adversarial-skew rung for the MinHash-LSH band join: a
boilerplate-heavy corpus where ONE template dominates, so every copy
lands in the SAME bucket of every band — the 100 TB failure mode AQE
skew-splitting can re-balance but not shrink (B identical docs emit
B²/2 join rows per band regardless of partitioning).

Corpus: the sf0.1 documents table replicated Nx with disjoint shingle
sets (the lsh_rung construction), then `boiler_pct`% of docs
overwritten with one constant template string. Measures
minhash_lsh_pairs with max_bucket=None (exact semantics — pair volume
quadratic in the boilerplate count) and max_bucket=64 (the escape
hatch: oversized buckets counted first and dropped before the
self-join). Uncapped runs are skipped above `uncapped_limit` docs of
boilerplate — the measured small-rung quadratic already extrapolates
(pairs ≈ bands·B²/2), no need to burn an hour proving it.

Usage: PYTHONPATH=. python tools/skew_rung.py [replicates ...]
Prints one JSON line per (rung, mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

BOILER_PCT = 1  # % of docs sharing the dominant template
UNCAPPED_LIMIT = 5_000  # max boilerplate docs for an uncapped run

BOILER_TEXT = (
    "terms of service all rights reserved cookie policy privacy "
    "notice subscribe to our newsletter follow us on social media "
) * 3


def main() -> None:
    reps = [int(s) for s in (sys.argv[1:] or ["10", "50", "300"])]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pipit_spark.llm import dedup as D

    spark = get_spark(app_name="skew-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = Q.load(spark, sf_dir, "documents")
    for k in reps:
        path = f"/tmp/skew_rung_x{k}.parquet"
        rep = docs.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__r"),
        ).select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.when(
                F.col("doc_id") % (100 // BOILER_PCT) == 0,
                F.lit(BOILER_TEXT),
            ).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1r"), F.col("__r").cast("string")),
                )
            ).alias("text"),
        )
        rep.write.mode("overwrite").parquet(path)
        inp = spark.read.parquet(path)
        n = inp.count()
        n_boiler = inp.filter(F.col("text") == BOILER_TEXT).count()

        for mode, cap in (("uncapped", None), ("capped64", 64)):
            if cap is None and n_boiler > UNCAPPED_LIMIT:
                print(json.dumps({
                    "rung": f"x{k}", "mode": mode, "docs": n,
                    "boiler_docs": n_boiler, "skipped": True,
                    "extrapolated_pairs": n_boiler * (n_boiler - 1) // 2,
                }))
                continue
            Q.clear_state(spark)
            t0 = time.perf_counter()
            n_pairs = D.minhash_lsh_pairs(inp, max_bucket=cap).count()
            sec = round(time.perf_counter() - t0, 2)
            print(json.dumps({
                "rung": f"x{k}", "mode": mode, "docs": n,
                "boiler_docs": n_boiler, "pairs": n_pairs, "sec": sec,
            }))


if __name__ == "__main__":
    main()
