"""Scale rung for the 1-bit ANN tier: replicate the sf0.1 embeddings
table Nx (fresh vec_ids; sign patterns perturbed per replica by a
deterministic per-replica dimension flip so codes stay distinct),
materialize to parquet, then time hamming_topk end-to-end (quantize +
scan + partial top-k) against cosine_topk on the same corpus.

Usage: PYTHONPATH=. python tools/hamming_rung.py [replicas ...]
Default replicas: 1 10 100.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pipit_spark.session import get_spark
    from pipit_spark.llm import similarity as V

    spark = get_spark(app_name="hamming-rung")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = base.count()
    # warmup: JVM + codegen on the same operator shape
    V.hamming_topk(base, k=5, query_max_id=5).count()

    with tempfile.TemporaryDirectory() as d:
        for r in reps:
            # per-replica perturbation: negate dimension (replica mod dim)
            # so replicas are near- but not exact-duplicates in code space
            rep = (
                base.crossJoin(
                    spark.range(r).withColumnRenamed("id", "__rep")
                )
                .select(
                    (F.col("vec_id") + F.col("__rep") * n0).alias("vec_id"),
                    F.expr(
                        "transform(embedding, (x, i) -> CASE WHEN i = __rep % size(embedding) THEN -x ELSE x END)"
                    ).alias("embedding"),
                    "label",
                )
            )
            path = os.path.join(d, f"emb_x{r}")
            rep.write.mode("overwrite").parquet(path)
            emb = spark.read.parquet(path)
            n = emb.count()

            t0 = time.time()
            cnt = V.hamming_topk(emb, k=5, query_max_id=10).count()
            t_ham = time.time() - t0

            t0 = time.time()
            V.cosine_topk(emb, k=5, query_max_id=10).count()
            t_cos = time.time() - t0

            print(
                f"x{r}: {n} vectors  hamming_topk={t_ham:.2f}s  "
                f"cosine_topk={t_cos:.2f}s  rows={cnt}"
            )


if __name__ == "__main__":
    main()
