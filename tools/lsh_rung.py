"""MinHash-LSH dedup ladder rung: time the full band-bucket pipeline
(signatures → banding → bucket join → pair emission) on the sf0.1
documents table replicated Nx.

Each replica's words are suffixed with the replica id, so replica
shingle sets are DISJOINT — the corpus grows Nx with the same per-doc
near-dup structure repeated N times, instead of every replica of a doc
colliding with every other replica (which would grow bucket sizes — and
pair counts — quadratically in N and measure a different workload).
The replicated corpus is materialized to parquet first so the timing
covers the dedup pipeline, not the replication transform.

Usage: PYTHONPATH=. python tools/lsh_rung.py [replicates ...]
Prints one JSON line per rung.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    reps = [int(s) for s in (sys.argv[1:] or ["1", "10"])]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q
    from pipit_spark.llm import dedup as D

    spark = get_spark(app_name="lsh-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = Q.load(spark, sf_dir, "documents")
    for k in reps:
        path = f"/tmp/lsh_rung_x{k}.parquet"
        rep = docs.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__r"),
        ).select(
            (
                F.col("doc_id").cast("long")
                + F.col("__r").cast("long") * 1_000_000
            ).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1r"), F.col("__r").cast("string")),
            ).alias("text"),
        )
        rep.write.mode("overwrite").parquet(path)
        inp = spark.read.parquet(path)
        n = inp.count()

        t0 = time.perf_counter()
        pairs = D.minhash_lsh_pairs(inp)
        n_pairs = pairs.count()
        elapsed = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "replicate": k,
                    "n_docs": n,
                    "lsh_pairs_sec": elapsed,
                    "n_pairs": n_pairs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
