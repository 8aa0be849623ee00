"""End-to-end training-data pipeline walkthrough over the synthetic
documents table. Run from the repo root:

    PYTHONPATH=. python examples/corpus_pipeline.py [sf_dir]

Defaults to /root/testdata/sf0.001. Shows the two equivalent ways to
declare the pipeline (composed calls vs a config recipe), plus the
dedup, retrieval, and ANN tiers around it.
"""

from __future__ import annotations

import sys


def main() -> None:
    from pipit_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eval_docs = docs.limit(5).select("doc_id", "text")

    from pipit_spark.llm.recipe import run_recipe

    print("== config-driven pipeline: clean -> dedup -> decontaminate -> pack ==")
    packs = run_recipe(docs, [
        {"op": "lang_filter", "lang": "en"},
        {"op": "quality_floor", "min_quality": 0.3},
        {"op": "exact_dedup"},
        {"op": "decontaminate", "n": 5},
        {"op": "pack", "context_len": 512, "n_shards": 8},
    ], eval_docs=eval_docs)
    packs.show(5)

    from pipit_spark.llm.dedup import fuzzy_dedup

    print("== near-dup survivors (MinHash-LSH) ==")
    print("survivors:", fuzzy_dedup(docs, threshold=0.5).count(),
          "of", docs.count())

    from pipit_spark.llm.text import bm25_topk, tfidf_topk

    print("== BM25 retrieval ==")
    bm25_topk(docs, {"q": "fast table query"}, k=3).show()

    print("== per-doc TF-IDF keywords ==")
    tfidf_topk(docs, k=2).orderBy("doc_id", "rank").show(6)

    from pipit_spark.llm.similarity import cosine_topk, hamming_topk

    print("== ANN: exact cosine vs 1-bit Hamming tier ==")
    cosine_topk(emb, k=3, query_max_id=2).show()
    hamming_topk(emb, k=3, query_max_id=2).show()

    from pipit_spark.llm.pipeline import corpus_health
    from pipit_spark.llm.similarity import isolation_scores
    from pipit_spark.llm.text import bigram_lm, lm_score

    print("== corpus health (one-call audit tiers) ==")
    health = corpus_health(docs)
    health["card"].show(truncate=False)
    health["dup_inflation"].orderBy("source").show(3)

    print("== bigram LM + per-doc fluency ==")
    lm = bigram_lm(docs, top_k=100)
    lm.show(3)
    lm_score(docs, lm).orderBy("doc_id").show(3)

    print("== embedding isolation outliers ==")
    isolation_scores(emb, query_max_id=20, bottom_k=3).show()


if __name__ == "__main__":
    main()
