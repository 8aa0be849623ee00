"""Build-once/search-many ANN ladder: replicate the sf0.1 embeddings
Nx (deterministic per-replica sign flips keep vectors distinct),
persist the portable LSH index ONCE per rung (timed as the build),
then time the per-batch search cost both ways:

  - inline (`lsh_topk_portable` — re-signs the corpus per batch: what
    a deployment WITHOUT a persisted index pays), and
  - indexed (`lsh_topk_portable_indexed` over the persisted band/vecs
    tables: what every query batch pays after one build).

The query batch is FIXED (the sf0.1 batch, 80 queries) across rungs —
the production retrieval shape is "corpus grows, batch doesn't" — and
`num_planes` SCALES with the corpus (4/6/9 at x1/x10/x100, keeping
per-table bucket size roughly constant), exactly as a deployment
re-tunes banding when the corpus grows 10×: with CONSTANT parameters
every bucket grows linearly and so does every query's candidate set —
that measures parameter mis-tuning, not the index. Expected shape:
build linear in corpus, indexed search ~flat, inline search linear
(it pays the corpus signature pass per batch).

Usage: PYTHONPATH=. python tools/ann_rung.py [replicates ...]
Prints one JSON line per rung.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def main() -> None:
    reps = [int(s) for s in (sys.argv[1:] or ["1", "10", "100"])]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pipit_spark.session import get_spark
    from pipit_spark.llm import similarity as V
    from pipit_spark import queries as Q

    spark = get_spark(
        app_name="ann-rung",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = Q.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    queries.count()

    for k in reps:
        path = f"/tmp/ann_rung_x{k}.parquet"
        rep = (
            emb.filter(F.col("vec_id") % 25 != 0)
            .select(
                "vec_id", "embedding",
                F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__r"),
            )
            .select(
                (
                    F.col("vec_id")
                    + F.col("__r").cast("long") * 10_000_000
                ).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.col("__r") % F.size("embedding"), -x
                    ).otherwise(x),
                ).alias("embedding"),
            )
        )
        rep.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        n = corpus.count()
        # keep per-table bucket size ~constant (~120 vectors): the
        # banding a deployment would choose for this corpus size
        planes = max(4, math.ceil(math.log2(max(n, 1) / 120)))
        table = f"annrung_lsh_x{k}"

        t0 = time.perf_counter()
        V.save_lsh_topk_index(corpus, table, num_planes=planes)
        build_sec = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        n_idx = V.lsh_topk_portable_indexed(
            spark, table, queries, k=5
        ).count()
        indexed_sec = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        n_inl = V.lsh_topk_portable(
            corpus, queries, k=5, num_planes=planes
        ).count()
        inline_sec = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

        print(
            json.dumps(
                {
                    "replicate": k,
                    "n_vectors": n,
                    "num_planes": planes,
                    "index_build_sec": build_sec,
                    "indexed_search_sec": indexed_sec,
                    "inline_search_sec": inline_sec,
                    "rows": [n_idx, n_inl],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
