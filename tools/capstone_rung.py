"""Capstone ladder rung: the full prepare_training_set pipeline
(clean -> decontaminate -> pack) on the sf0.1 documents table
replicated Nx — the composed plan a production corpus refresh runs,
timed end-to-end at growing corpus sizes.

Replication follows tools/lsh_rung.py: replica words are suffixed with
the replica id so fingerprints and n-gram sets stay disjoint across
replicas (the dedup/decontamination structure repeats Nx instead of
exploding quadratically). Lang markers survive suffixing? No — the
suffix would break the marker-word language ID and zero the survivor
set, so the suffix goes on a DIGIT-prefixed token variant: every word
gains a replica-id PREFIX token appended at the end of the text
instead, leaving the original words (and the cleaning semantics)
intact while making each replica's fingerprint and 5-gram set unique.

Usage: PYTHONPATH=. python tools/capstone_rung.py [replicates ...]
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
    from pipit_spark.llm.pipeline import prepare_training_set

    spark = get_spark(app_name="capstone-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = Q.load(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    for k in reps:
        path = f"/tmp/capstone_rung_x{k}.parquet"
        rep = docs.select(
            "doc_id", "text", "lang", "source",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__r"),
        ).select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" replicatoken"),
                F.col("__r").cast("string"),
            ).alias("text"),
            "lang", "source",
        )
        rep.write.mode("overwrite").parquet(path)
        inp = spark.read.parquet(path)
        n = inp.count()

        t0 = time.perf_counter()
        packs = prepare_training_set(inp, eval_docs)
        n_packs = packs.count()
        elapsed = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "replicas": k, "docs": n, "packs": n_packs,
            "pipeline_sec": elapsed,
        }))
        Q.clear_state(spark)


if __name__ == "__main__":
    main()
