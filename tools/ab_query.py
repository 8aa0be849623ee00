"""A/B a single registry query: median of N steady passes, bench
methodology (clear_state between passes, cold pass discarded).

Usage: PYTHONPATH=. python tools/ab_query.py <query> [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q

    spark = get_spark(app_name=f"ab-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").applyInPandas(
        lambda pdf: pdf.head(1), schema=warm.schema
    ).count()
    registry = Q.queries()
    if name == "doc_minhash_lsh_xxh":
        from pipit_spark.llm import dedup as _D

        fn = lambda s, d: _D.minhash_lsh_pairs(  # noqa: E731
            Q.load(s, d, "documents"), num_hashes=16, bands=8
        )
    elif name == "emb_rrf_fusion_old":
        from pipit_spark.llm import similarity as V
        from pyspark.sql import functions as F

        def fn(s, d):  # the pre-r12 two-tier composition
            emb = Q.load(s, d, "embeddings")
            qs = emb.filter(F.col("vec_id") % 25 == 0)
            corpus = emb.filter(F.col("vec_id") % 25 != 0)
            return V.rrf_fuse(
                [
                    V.lsh_topk_portable(corpus, qs, k=5),
                    V.ivf_topk_portable(
                        corpus, qs, k=5, nlist=8, nprobe=3
                    ),
                ],
                k=5,
            )
    elif name == "doc_training_set_old":
        from pipit_spark.llm import pipeline as _P
        from pipit_spark.llm.dedup import decontaminate
        from pipit_spark.llm.sampling import pack_sequences
        from pyspark.sql import functions as F

        def fn(s, d):  # the pre-r12 survivors-restricted decontaminate
            docs = Q.load(s, d, "documents")
            corpus = docs.filter(F.col("doc_id") >= 25)
            eval_docs = docs.filter(F.col("doc_id") < 25)
            clean = _P.clean_corpus(corpus)
            survivors_text = corpus.join(
                clean.select("doc_id"), "doc_id", "left_semi"
            )
            contaminated = decontaminate(
                survivors_text, eval_docs, n=5
            ).select("doc_id")
            final = clean.join(contaminated, "doc_id", "left_anti")
            return pack_sequences(
                final, context_len=512, n_shards=16, tokens_col="n_tokens"
            )
    else:
        fn = registry[name]
    if name.startswith("emb_rrf_fusion"):
        Q.ensure_portable_ann_indexes(spark, sf_dir)
    ts = []
    for i in range(reps + 1):
        Q.clear_state(spark)
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        ts.append(dt)
        print(f"# pass{i} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    steady = ts[1:]
    print(
        f"{name}: median={statistics.median(steady):.3f} "
        f"min={min(steady):.3f} all={ts}"
    )


if __name__ == "__main__":
    main()
