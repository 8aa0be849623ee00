"""Bigram-LM ladder rung: time the full count→context→conditional
pipeline on the sf0.1 documents table replicated Nx.

Replica words are suffixed with the replica id, so each replica
contributes a DISJOINT bigram vocabulary — the corpus grows Nx in
bytes AND the pair table (the op's only growing state) grows Nx,
which is the worst case for this operator: a same-vocabulary
replication would grow only the counts, not the aggregation state.
The replicated corpus is materialized to parquet first so the timing
covers the LM pipeline, not the replication transform.

Usage: PYTHONPATH=. python tools/bigram_rung.py [replicates ...]
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

    from pipit_spark import queries as Q
    from pipit_spark.llm.text import bigram_lm
    from pipit_spark.session import get_spark

    spark = get_spark(app_name="bigram-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = Q.load(spark, sf_dir, "documents")
    for k in reps:
        path = f"/tmp/bigram_rung_x{k}.parquet"
        rep = docs.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__r"),
        ).select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1r"), F.col("__r").cast("string")),
            ).alias("text"),
        )
        rep.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        n_docs = corpus.count()

        t0 = time.perf_counter()
        lm = bigram_lm(corpus, top_k=10_000, min_count=2)
        n_rows = lm.count()
        wall = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "rung": f"x{k}", "docs": n_docs, "lm_rows": n_rows,
            "wall_s": wall,
        }))


if __name__ == "__main__":
    main()
