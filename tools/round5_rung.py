"""Scale rungs for the round-5 surfaces: the portable integer ANN
tiers (IVF / LSH / RRF fusion) and the real media codec pass.

ANN: replicate the sf0.1 embeddings table Nx (fresh vec_ids; per-
replica deterministic dimension flip so replicas are near- but not
exact-duplicates — same protocol as hamming_rung), materialize to
parquet, then time each portable searcher end-to-end at a FIXED query
set (the production shape: corpus grows, the query batch does not).

Codec: synthesize real BMP/PNG/WAV files for Nx the sf0.1 documents
table and time the full synth->decode->stats pass (mapInPandas both
ways), reporting items/sec for the decode side.

Usage: PYTHONPATH=. python tools/round5_rung.py [replicas ...]
Default replicas: 1 10 100 (codec: 1 10).
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
    from pipit_spark.llm import multimodal as M

    spark = get_spark(app_name="round5-rung")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = base.count()
    qs = base.filter(F.col("vec_id") % 25 == 0).filter(
        F.col("vec_id") < 500
    )  # fixed 20-query batch at every rung
    nq = qs.count()
    # warmup: JVM + codegen on the operator shapes under test
    V.ivf_topk_portable(base, qs, k=5, nlist=8, nprobe=3).count()

    with tempfile.TemporaryDirectory() as d:
        for r in reps:
            rep = (
                base.crossJoin(
                    spark.range(r).withColumnRenamed("id", "__rep")
                )
                .select(
                    (F.col("vec_id") + F.col("__rep") * n0).alias("vec_id"),
                    F.expr(
                        "transform(embedding, (x, i) -> CASE WHEN "
                        "i = __rep % size(embedding) THEN -x ELSE x END)"
                    ).alias("embedding"),
                )
            )
            path = os.path.join(d, f"emb_x{r}")
            rep.write.mode("overwrite").parquet(path)
            emb = spark.read.parquet(path)
            n = emb.count()
            corpus = emb.filter(
                (F.col("vec_id") % 25 != 0) | (F.col("vec_id") >= 500)
            )

            t0 = time.time()
            n_ivf = V.ivf_topk_portable(
                corpus, qs, k=5, nlist=8, nprobe=3
            ).count()
            t_ivf = time.time() - t0

            t0 = time.time()
            n_lsh = V.lsh_topk_portable(corpus, qs, k=5).count()
            t_lsh = time.time() - t0

            t0 = time.time()
            n_rrf = V.rrf_fuse(
                [
                    V.lsh_topk_portable(corpus, qs, k=5),
                    V.ivf_topk_portable(corpus, qs, k=5, nlist=8, nprobe=3),
                ],
                k=5,
            ).count()
            t_rrf = time.time() - t0

            print(
                f"ann x{r}: {n} vectors / {nq} queries  "
                f"ivf={t_ivf:.2f}s ({n_ivf})  lsh={t_lsh:.2f}s ({n_lsh})  "
                f"rrf={t_rrf:.2f}s ({n_rrf})"
            )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nd0 = docs.count()
    M.media_pixel_stats(
        M.synthesize_real_media(docs.limit(100))
    ).count()  # warmup
    for r in [x for x in reps if x <= 10] or [1]:
        rep_docs = docs.crossJoin(
            spark.range(r).withColumnRenamed("id", "__rep")
        ).select((F.col("doc_id") + F.col("__rep") * nd0).alias("doc_id"))
        t0 = time.time()
        n_items = M.media_pixel_stats(
            M.synthesize_real_media(rep_docs)
        ).count()
        dt = time.time() - t0
        print(
            f"codec x{r}: {n_items} real files synth+decode+stats "
            f"{dt:.2f}s  ({n_items / dt:.0f} items/s)"
        )


if __name__ == "__main__":
    main()
