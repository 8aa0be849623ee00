"""Round-7 additions: index-pair corpus-drift guard, persisted
vec_col in the ANN index metadata, and the portable-tier cache
release hook."""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from pipit_spark.llm import similarity as V


def _clean_tables(spark, *prefixes):
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in prefixes:
        for suffix in ("_vecs", "_bands", "_cells", "__annmeta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")
            shutil.rmtree(f"{wh}/{t}{suffix}", ignore_errors=True)


def test_rrf_indexed_refuses_drifted_index_pair(spark):
    """Appending a batch to only ONE of the two fused indexes must be
    an error, not a silent candidate drop: rrf_ann_indexed scores both
    tiers' candidates against {lsh_table}_vecs, so a lagging LSH index
    would silently lose the IVF tier's new matches (the documented
    bit-identity with the two-searcher composition would break)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    corpus = emb.filter(F.col("vec_id") % 25 != 0)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)

    _clean_tables(spark, "t_r7_lsh", "t_r7_ivf")
    V.save_lsh_topk_index(half_a, "t_r7_lsh", num_buckets=4)
    V.save_ivf_topk_index(half_a, "t_r7_ivf", nlist=4)

    # in sync: fuses fine
    assert (
        V.rrf_ann_indexed(spark, "t_r7_lsh", "t_r7_ivf", qs, k=3).count()
        > 0
    )

    # grow only the IVF side -> fingerprints diverge -> hard error
    V.append_ivf_topk_index(half_b, "t_r7_ivf")
    with pytest.raises(ValueError, match="fingerprint"):
        V.rrf_ann_indexed(spark, "t_r7_lsh", "t_r7_ivf", qs, k=3)

    # catch the LSH side up -> fuses again
    V.append_lsh_topk_index(half_b, "t_r7_lsh")
    assert (
        V.rrf_ann_indexed(spark, "t_r7_lsh", "t_r7_ivf", qs, k=3).count()
        > 0
    )


def test_index_persists_custom_vec_col(spark):
    """An index built with a non-default vector column must be
    appendable and searchable without re-stating the column: vec_col
    rides the __annmeta row (previously the appenders hardcoded
    'embedding' and would mis-read or crash)."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("embedding", "vec")
    )
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    corpus = emb.filter(F.col("vec_id") % 25 != 0)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)

    _clean_tables(spark, "t_r7v_lsh", "t_r7v_full")
    V.save_lsh_topk_index(half_a, "t_r7v_lsh", num_buckets=4,
                          vec_col="vec")
    V.append_lsh_topk_index(half_b, "t_r7v_lsh")  # no vec_col arg
    V.save_lsh_topk_index(corpus, "t_r7v_full", num_buckets=4,
                          vec_col="vec")

    # searcher defaults its query-side column from the meta row too
    a = V.lsh_topk_portable_indexed(spark, "t_r7v_lsh", qs, k=5)
    b = V.lsh_topk_portable_indexed(spark, "t_r7v_full", qs, k=5)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0

    meta = V.refresh_annmeta(spark, "t_r7v_lsh")
    assert meta["vec_col"] == "vec"
    assert meta["n_vecs"] == corpus.count()


def test_release_portable_caches(spark):
    """The inline portable tiers persist corpus signatures / candidate
    pairs with no per-call unpersist (the result plan still needs
    them); release_portable_caches is the documented release point for
    long-running sessions and must actually drain the registry."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    V.release_portable_caches()
    out = V.lsh_topk_portable(corpus, qs, k=3)
    out.count()
    assert len(V._PORTABLE_PERSISTED) > 0
    cached = list(V._PORTABLE_PERSISTED)
    V.release_portable_caches()
    assert V._PORTABLE_PERSISTED == []
    assert all(not df.is_cached for df in cached)
