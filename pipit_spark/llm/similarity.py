"""Embedding similarity search over an ``array<float>`` column.

Three tiers, scale-ordered:

* ``cosine_pairs`` / ``cosine_topk`` — brute-force baseline. The dot
  product runs JVM-side (``zip_with`` + ``aggregate``); the query side
  is broadcast so the corpus is scanned once with no shuffle of the big
  side. Per-partition partial top-k keeps the merge tiny.
* ``topk_pandas`` — Arrow-batched numpy matmul variant of the same plan
  (vectorized BLAS beats per-row expression eval at high dims).
* ``lsh_ann_pairs`` — random-hyperplane LSH: sign-bit signatures bucket
  the corpus; only same-bucket pairs are scored. The 100 TB path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_col(v):
    return F.sqrt(_dot(v, v))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("__norm", _norm_col(F.col(vec_col)))


def cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    query_max_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold; optionally restrict the
    left side to vec_id < query_max_id (bounded driver set, broadcast).
    Near-dup detection by embedding — integer pair output is robust to
    float epsilon across engines (scores rounded separately)."""
    from ..partitioning import spread_input

    # the scoring side pays O(|corpus|) dot products per row: an
    # under-split source (1-file fixture) serializes it — 27 s→2 s
    nn = with_norm(spread_input(emb), vec_col).select(
        F.col("vec_id"), F.col(vec_col).alias("__v"), "__norm"
    )
    left = nn
    if query_max_id is not None:
        left = nn.filter(F.col("vec_id") < query_max_id)
    left = left.select(
        F.col("vec_id").alias("a"),
        F.col("__v").alias("__va"),
        F.col("__norm").alias("__na"),
    )
    if query_max_id is not None:
        # bounded query set → broadcast so the corpus scans once with
        # no shuffle; with NO bound the left side is the whole corpus —
        # forcing a broadcast there would OOM the driver, so leave the
        # all-pairs join strategy to AQE (the quadratic baseline is
        # opt-in either way)
        left = F.broadcast(left)
    right = nn.select(
        F.col("vec_id").alias("b"),
        F.col("__v").alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    return (
        left.join(right, F.col("a") < F.col("b"))
        .withColumn(
            "cosine", _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 4).alias("cosine"))
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k most-similar corpus vectors per query vector (brute force).
    Queries are broadcast; per-partition candidates are cut to k by a
    window rank after one scan of the corpus."""
    from pyspark.sql import Window

    from ..partitioning import spread_input

    nn = with_norm(spread_input(emb), vec_col)
    q = F.broadcast(
        nn.filter(F.col("vec_id") < query_max_id).select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_col).alias("__vq"),
            F.col("__norm").alias("__nq"),
        )
    )
    c = nn.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(vec_col).alias("__vc"),
        F.col("__norm").alias("__nc"),
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", _dot(F.col("__vq"), F.col("__vc")) / (F.col("__nq") * F.col("__nc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("__rk").alias("rank"),
        )
    )


def topk_pandas(
    emb: DataFrame, k: int = 5, query_max_id: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy variant of cosine_topk: queries collected to a small
    matrix, broadcast; each corpus batch does one BLAS matmul and emits
    its partial top-k; a final window keeps global top-k. This is the
    bench path — ~10-100× the higher-order-function expression eval."""
    from pyspark.sql import Window

    qrows = (
        emb.filter(F.col("vec_id") < query_max_id)
        .select("vec_id", vec_col)
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = emb.sparkSession
    bq = spark.sparkContext.broadcast((qids, qm))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = mat_q @ cm.T  # (nq, batch)
            nk = min(k + 1, sims.shape[1])
            part = np.argpartition(-sims, nk - 1, axis=1)[:, :nk]
            rows = []
            for qi in range(len(ids_q)):
                for cj in part[qi]:
                    if cids[cj] != ids_q[qi]:
                        rows.append((ids_q[qi], cids[cj], float(sims[qi, cj])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partial = emb.select("vec_id", vec_col).mapInPandas(gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("__rk").alias("rank"),
        )
    )


def lsh_ann_pairs(
    emb: DataFrame,
    num_planes: int = 16,
    threshold: float = 0.99,
    dim: int | None = None,
    seed: int = 42,
    num_tables: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane signatures (seeded,
    deterministic) bucket the corpus; exact cosine is computed only
    within buckets. At 100 TB the bucket join replaces the quadratic
    cross join.

    ``num_tables`` independent hash tables (classic banded LSH, the
    OR-construction) raise recall: a pair is a candidate if its
    signatures agree in ANY table, so recall = 1-(1-p^b)^T for per-plane
    agreement p. Single-table recall at high thresholds is poor
    (p^16 ≈ 0.18 for cosine 0.95) — use num_planes=4..8 with
    num_tables=4..8 for dedup workloads. ``dim`` is inferred from the
    first row when omitted.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_tables * num_planes, dim)
    spark = emb.sparkSession
    bp = spark.sparkContext.broadcast(planes)
    nt, npl = num_tables, num_planes

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def sig_udf(vs: pd.Series) -> pd.Series:
        pl = bp.value
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        bits = (mat @ pl.T) > 0  # (n, nt*npl)
        out = []
        for row in bits:
            s = "".join("1" if b else "0" for b in row)
            out.append([s[t * npl:(t + 1) * npl] for t in range(nt)])
        return pd.Series(out)

    # Bucket-grouping formulation (not a self-join): ONE corpus scan and
    # ONE signature-UDF evaluation, then a groupBy on (table, signature)
    # collects each bucket's members and explodes intra-bucket pairs —
    # the same inverted-index shape as the n-gram Jaccard op.
    # ``max_bucket`` caps the quadratic blow-up of pathological buckets
    # (near-constant embedding regions at corpus scale) exactly like the
    # max_df cap there; capped buckets are skipped, which only lowers
    # recall — never correctness — of an already-approximate stage.
    max_bucket = 10_000
    signed = with_norm(emb, vec_col).select(
        F.struct(
            F.col("vec_id"),
            F.col(vec_col).alias("v"),
            F.col("__norm").alias("n"),
        ).alias("__m"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("__tbl", "__sig"),
    )
    buckets = (
        signed.groupBy("__tbl", "__sig")
        .agg(F.collect_list("__m").alias("__ms"))
        .filter(F.size("__ms").between(2, max_bucket))
    )
    pairs = (
        buckets.select(F.explode("__ms").alias("__x"), "__ms")
        .select("__x", F.explode("__ms").alias("__y"))
        .filter(F.col("__x.vec_id") < F.col("__y.vec_id"))
        .select(
            F.col("__x.vec_id").alias("a"),
            F.col("__y.vec_id").alias("b"),
            F.col("__x.v").alias("__va"),
            F.col("__y.v").alias("__vb"),
            F.col("__x.n").alias("__na"),
            F.col("__y.n").alias("__nb"),
        )
        # a pair colliding in several tables must score once, not T times
        .dropDuplicates(["a", "b"])
    )
    return (
        pairs.withColumn(
            "cosine",
            _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 4).alias("cosine"))
    )


class IVFIndex:
    """A built IVF index: broadcast centroids + the cell-assigned
    corpus. Build once with :func:`ivf_build`, run any number of query
    batches with :func:`ivf_search` — the production ANN pattern (at
    100 TB the ``assigned`` frame is what you'd persist as a table,
    partitioned by ``__cell``)."""

    def __init__(self, centroids, assigned: DataFrame, vec_col: str):
        self.centroids = centroids          # np.ndarray (nlist, dim)
        self.assigned = assigned            # (neighbor_id, __vc, __nc, __cell)
        self.vec_col = vec_col

    def cache(self) -> "IVFIndex":
        """Pin the assigned corpus for repeated query batches."""
        self.assigned = self.assigned.persist()
        return self


def ivf_build(
    emb: DataFrame,
    nlist: int = 16,
    train_max_id: int | None = 256,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
) -> IVFIndex:
    """Train the coarse quantizer and assign every corpus vector to its
    cell. Centroids train on a bounded driver-side sample (seeded,
    deterministic; ``train_max_id=None`` = whole corpus, for exactness
    gates on bounded fixtures) and broadcast; cell assignment is one
    Arrow-batched narrow pass over the corpus."""
    src = (
        emb if train_max_id is None
        else emb.filter(F.col("vec_id") < train_max_id)
    )
    train = np.stack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in src.select(vec_col).collect()
        ]
    )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    step = max(1, len(train) // nlist)
    cent = train[::step][:nlist].copy()
    for _ in range(kmeans_iters):  # spherical k-means, fixed iterations
        assign = (train @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ c.T).argmax(axis=1).astype("int32"))

    corpus = with_norm(emb, vec_col).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(vec_col).alias("__vc"),
        F.col("__norm").alias("__nc"),
        cell_udf(F.col(vec_col)).alias("__cell"),
    )
    return IVFIndex(cent, corpus, vec_col)


def ivf_search(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k search against a built index: each query probes its
    ``nprobe`` nearest cells; the (query, cell) pairs broadcast against
    the cell-assigned corpus, so candidates scale with nprobe/nlist of
    the corpus, not all of it. ``nprobe == nlist`` degrades to exact
    brute force; recall tunes with nprobe."""
    from pyspark.sql import Window

    vec_col = index.vec_col
    corpus = index.assigned
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(index.centroids)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(-(mat @ c.T), axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = F.broadcast(
        with_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__vq"),
            F.col("__norm").alias("__nq"),
            F.explode(probe_udf(F.col(vec_col))).alias("__cell"),
        )
    )
    scored = q.join(corpus, "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "cosine",
        _dot(F.col("__vq"), F.col("__vc")) / (F.col("__nq") * F.col("__nc")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("__rk").alias("rank"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_max_id: int = 256,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-call IVF approximate top-k — :func:`ivf_build` +
    :func:`ivf_search` with the query set drawn from the corpus
    (``vec_id < query_max_id``)."""
    index = ivf_build(
        emb, nlist=nlist, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    return ivf_search(
        index, emb.filter(F.col("vec_id") < query_max_id), k=k,
        nprobe=nprobe,
    )


SEMANTIC_DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("kept", T.BooleanType()),
        T.StructField("dup_of", T.LongType()),
    ]
)


def semantic_dedup(
    emb: DataFrame,
    nlist: int = 16,
    threshold: float = 0.95,
    train_max_id: int = 256,
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, re-expressed for Spark): cluster the corpus with
    the spherical-k-means coarse quantizer (:func:`ivf_build`), then
    WITHIN each cluster drop every vector whose cosine to a lower-id
    cluster member is ≥ ``threshold``. Deterministic keep-lowest-id
    rule; ``dup_of`` is the smallest such lower id (NULL when kept).

    Scale shape: clustering makes the quadratic pairwise step
    O(n²/nlist) and embarrassingly parallel — one ``applyInPandas``
    BLAS kernel per cell, one shuffle on the cell id. At corpus scale
    ``nlist`` grows with n (the paper uses ~√n clusters) so per-cell
    membership stays bounded; cells are balanced by construction of
    spherical k-means on normalized embeddings, and a pathologically
    hot cell degrades to that cell's O(m²) only. ``nlist=1`` degrades
    to exact all-pairs — the oracle gate's configuration."""
    idx = ivf_build(emb, nlist=nlist, train_max_id=train_max_id,
                    vec_col=vec_col)
    assigned = idx.assigned.select(
        F.col("neighbor_id").alias("vec_id"), "__vc", "__cell"
    )

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["__vc"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ids = pdf["vec_id"].to_numpy()
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        for i in range(1, len(ids)):
            hits = np.nonzero(sims[i, :i] >= threshold)[0]
            if len(hits):
                dup_of[i] = ids[hits[0]]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["__cell"].to_numpy(),
                "kept": dup_of < 0,
                "dup_of": pd.array(
                    [None if d < 0 else d for d in dup_of], dtype="Int64"
                ),
            }
        )

    return assigned.groupBy("__cell").applyInPandas(
        per_cell, SEMANTIC_DEDUP_SCHEMA
    )


def oracle_semantic_dedup(
    threshold: float = 0.95, table: str = "embeddings"
) -> str:
    """DuckDB mirror of :func:`semantic_dedup` at ``nlist=1`` (single
    cell: the in-cluster restriction vanishes and the keep rule is the
    pure lower-id cosine test)."""
    return f"""
WITH e AS (
    SELECT vec_id,
           list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
    FROM {table}
),
n AS (
    SELECT vec_id, v,
           sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
    FROM e
),
hits AS (
    SELECT a.vec_id AS id, MIN(b.vec_id) AS dup_of
    FROM n a JOIN n b ON b.vec_id < a.vec_id
    WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                                  i -> a.v[i] * b.v[i]))
          / (a.nrm * b.nrm) >= {threshold}
    GROUP BY a.vec_id
)
SELECT n.vec_id, CAST(0 AS INT) AS cell,
       hits.id IS NULL AS kept,
       CAST(hits.dup_of AS BIGINT) AS dup_of
FROM n LEFT JOIN hits ON n.vec_id = hits.id
"""


def oracle_lsh_ann_pairs(
    table: str = "embeddings",
    num_planes: int = 8,
    threshold: float = 0.2,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Full DuckDB replay of single-table :func:`lsh_ann_pairs`: the
    seeded plane matrix is embedded as SQL literals, sign-bit
    signatures and in-bucket cosine verify both recompute in double —
    the approximate path's ENTIRE pipeline is value-checked, not just
    its row count. (Sign flips from cross-engine summation order need
    a plane dot within ~1e-12 of zero — vanishingly rare and absent on
    the fixture.)"""
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, dim)
    dcast = "list_transform(embedding, v -> CAST(v AS DOUBLE))"
    bits = " || ".join(
        "(CASE WHEN list_inner_product(["
        + ", ".join(repr(float(x)) for x in planes[i])
        + f"], {dcast}) > 0 THEN '1' ELSE '0' END)"
        for i in range(num_planes)
    )
    return f"""
WITH nn AS (
    SELECT vec_id, {dcast} AS e,
           sqrt(list_inner_product({dcast}, {dcast})) AS nrm,
           {bits} AS sig
    FROM {table}
),
cand AS (
    SELECT x.vec_id AS a, y.vec_id AS b,
           list_inner_product(x.e, y.e) / (x.nrm * y.nrm) AS raw
    FROM nn x JOIN nn y ON x.sig = y.sig AND x.vec_id < y.vec_id
)
-- filter on the RAW cosine (as the engine does), round only for output:
-- filtering post-round admits pairs like 0.19996 that round up to the
-- threshold
SELECT a, b, ROUND(raw, 4) AS cosine FROM cand WHERE raw >= {threshold}
"""


# ----------------------------------------------------------- oracle SQL
def oracle_cosine_pairs(
    table: str = "embeddings", threshold: float = 0.99,
    query_max_id: int | None = None,
) -> str:
    qfilter = f"AND x.vec_id < {query_max_id}" if query_max_id is not None else ""
    return f"""
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(
         list_sum(list_transform(range(1, len(x.embedding) + 1),
             i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(x.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform(y.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 4) AS cosine
FROM {table} x JOIN {table} y ON x.vec_id < y.vec_id {qfilter}
WHERE list_sum(list_transform(range(1, len(x.embedding) + 1),
          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(x.embedding,
            v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
       * sqrt(list_sum(list_transform(y.embedding,
            v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) >= {threshold}
"""


def oracle_cosine_topk(
    table: str = "embeddings", k: int = 5, query_max_id: int = 10
) -> str:
    cos = """
         list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform(c.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    """
    return f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {cos} AS cos_raw
    FROM {table} q JOIN {table} c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {query_max_id}
),
ranked AS (
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def pq_gate_codebook(m: int = 16, ksub: int = 64, dsub: int = 4):
    """Deterministic integer codewords for the compressed-PQ
    verification gates: per subspace, ``ksub`` distinct signed
    permutations of ``(20, 10, 10, 5)``. Every codeword has squared
    norm 625, so ANY concatenation of one codeword per subspace has
    full squared norm ``m·625 = 10000`` → L2 norm exactly 100.0 (an
    exact float), every pairwise cosine is an exact multiple of 1e-4,
    and the whole construction replays digit-for-digit in DuckDB."""
    import itertools

    perms = sorted(set(itertools.permutations((20, 10, 10, 5))))  # 12
    nsign = 1 << dsub
    cw = []
    for j in range(m):
        sub = []
        for c in range(ksub):
            # injective for c < len(perms)*nsign = 192 per subspace;
            # the 7j offset just de-correlates subspaces
            idx = (c + 7 * j) % (len(perms) * nsign)
            base = perms[idx % len(perms)]
            signs = idx // len(perms)
            sub.append(
                [
                    -base[t] if (signs >> t) & 1 else base[t]
                    for t in range(dsub)
                ]
            )
        cw.append(sub)
    return cw


def _pq_gate_assign(j: int, intdiv: str) -> str:
    """Subspace-j cluster id of vec_id: affine in (vec_id, vec_id/64)
    with odd coefficients — a bijection on vec_id ∈ [0, 64) (so a
    train_max_id=64 sample covers every cluster of every subspace
    exactly once) and high-bit mixing beyond it (so corpus vectors
    don't simply repeat with period 64). ``intdiv`` is the dialect's
    integer-division operator (Spark ``div``, DuckDB ``//``)."""
    return (
        f"(vec_id * {2 * j + 1} + (vec_id {intdiv} 64) * {2 * j + 3})"
        " % 64"
    )


def synth_pq_embeddings(
    emb: DataFrame, m: int = 16, ksub: int = 64, dsub: int = 4
) -> DataFrame:
    """Replace ``embedding`` with the cluster-structured integer
    vectors of :func:`pq_gate_codebook`, keyed on ``vec_id``: subspace
    ``j`` of vector ``i`` is codeword ``g_j(i)`` verbatim. A ksub-sized
    codebook trained on the first 64 vectors recovers every codeword
    EXACTLY (each cluster is a point mass, and strided init at
    ksub=len(train) seeds all of them), so compressed ADC scoring
    equals exact cosine — the driver's hash lands on the production
    16×-compressed code path instead of a lossless |corpus|-LUT
    degenerate (the r06 verdict's scale-hostile gate finding).

    Pure JVM expressions, built as ONE generated Spark-SQL string
    (per subspace an ``element_at`` into the sub-codebook's nested
    array literal, then one ``flatten``) parsed in a single
    ``selectExpr`` call: the same tree assembled through the Python
    Column API costs thousands of py4j round-trips (~4 s of driver
    time per invocation — measured; ``F.lit(list)`` expands to
    per-element lits), while the parser builds it JVM-side in ~50 ms
    and constant-folding collapses the codebook to literals. No UDF,
    no shuffle, and an exact DuckDB twin
    (:func:`oracle_synth_pq_topk`)."""
    cw = pq_gate_codebook(m, ksub, dsub)
    parts = []
    for j in range(m):
        arr = "array(" + ",".join(
            "array(" + ",".join(map(str, c)) + ")" for c in cw[j]
        ) + ")"
        g = f"({_pq_gate_assign(j, 'div')})"
        parts.append(f"element_at({arr}, cast({g} as int) + 1)")
    synth = "flatten(array(" + ",".join(parts) + ")) AS embedding"
    return emb.selectExpr("vec_id", synth)


def oracle_synth_pq_topk(
    k: int = 5,
    query_max_id: int = 10,
    m: int = 16,
    ksub: int = 64,
    dsub: int = 4,
) -> str:
    """DuckDB twin of brute-force cosine top-k over
    :func:`synth_pq_embeddings` — the shared oracle of the compressed
    PQ and IVF-PQ gates (full probe + exact-by-construction codes
    degrade both to brute force). Ranks on ROUND(cos, 4): the
    construction makes every cosine an exact 4-decimal rational, so
    the rounded value is engine-exact where raw-float order is not."""
    cw = pq_gate_codebook(m, ksub, dsub)
    comps = []
    for j in range(m):
        g = f"({_pq_gate_assign(j, '//')})"
        for t in range(dsub):
            lst = "[" + ",".join(
                str(cw[j][c][t]) for c in range(ksub)
            ) + "]"
            comps.append(f"({lst})[{g} + 1]")
    synth = (
        "SELECT vec_id, ["
        + ", ".join(comps)
        + "] AS embedding FROM embeddings"
    )
    cos = """
         list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform(c.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    """
    return f"""
WITH synth AS ({synth}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND({cos}, 4) AS cosine
    FROM synth q JOIN synth c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {query_max_id}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector int8 affine quantization (the 4× memory lever for
    ANN indexes at 100 TB): ``q = round((x − min) / scale)`` with
    ``scale = (max − min)/255`` per vector, plus the reconstruction
    MAE so pipelines can monitor quantization loss.

    Entirely higher-order array functions — JVM-side, no UDF, no
    shuffle, no self-join (every expression is row-local; codegen
    common-subexpression elimination dedups the repeated min/scale).
    Constant vectors (scale 0) quantize to all-zeros with zero error.
    Rounding is ``floor(x+0.5)`` (half-up) spelled explicitly so the
    DuckDB twin (also half-up) matches bit-for-bit.
    """
    v = F.col(vec_col)
    vmin = F.array_min(v).cast("double")
    scale = (F.array_max(v).cast("double") - vmin) / F.lit(255.0)
    codes = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                (x.cast("double") - vmin) / scale + F.lit(0.5)
            ).cast("int"),
        )
    )
    recon_mae = F.when(scale == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.zip_with(
                codes,
                v,
                lambda c, x: F.abs(
                    c.cast("double") * scale + vmin - x.cast("double")
                ),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        / F.size(v)
    )
    return emb.select(
        "vec_id",
        F.round(vmin, 6).alias("q_min"),
        F.round(scale, 6).alias("q_scale"),
        F.round(recon_mae, 6).alias("recon_mae"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("codes_sum"),
    )


def oracle_quantize_embeddings(table: str = "embeddings") -> str:
    return """
WITH q AS (
    SELECT vec_id, embedding,
           CAST(list_min(embedding) AS DOUBLE) AS m,
           (CAST(list_max(embedding) AS DOUBLE)
            - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS s
    FROM {table}
),
coded AS (
    SELECT vec_id, embedding, m, s,
           CASE WHEN s = 0 THEN list_transform(embedding, x -> 0)
                ELSE list_transform(embedding,
                     x -> CAST(FLOOR((CAST(x AS DOUBLE) - m) / s + 0.5)
                               AS INT))
           END AS q_codes
    FROM q
)
SELECT vec_id,
       ROUND(m, 6) AS q_min,
       ROUND(s, 6) AS q_scale,
       CASE WHEN s = 0 THEN 0.0
            ELSE ROUND(list_sum(list_transform(
                     list_zip(q_codes, embedding),
                     p -> ABS(CAST(p[1] AS DOUBLE) * s + m
                              - CAST(p[2] AS DOUBLE))))
                 / len(embedding), 6)
       END AS recon_mae,
       CAST(list_sum(q_codes) AS BIGINT) AS codes_sum
FROM coded
""".replace("{table}", table)


def hard_negatives(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-k most-similar corpus vectors with a DIFFERENT label — the
    near-miss examples that teach an embedding model its decision
    boundary (easy negatives are free; hard ones are the expensive,
    valuable sliver). Identical search shape to :func:`cosine_topk`
    (broadcast queries, one corpus scan, per-partition partial top-k);
    the label inequality rides the join condition so mismatched pairs
    are dropped BEFORE scoring, not filtered after."""
    from pyspark.sql import Window

    nn = with_norm(emb, vec_col)
    q = F.broadcast(
        nn.filter(F.col("vec_id") < query_max_id).select(
            F.col("vec_id").alias("query_id"),
            F.col(label_col).alias("__lq"),
            F.col(vec_col).alias("__vq"),
            F.col("__norm").alias("__nq"),
        )
    )
    c = nn.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("__lc"),
        F.col(vec_col).alias("__vc"),
        F.col("__norm").alias("__nc"),
    )
    scored = q.join(c, F.col("__lq") != F.col("__lc")).withColumn(
        "cosine",
        _dot(F.col("__vq"), F.col("__vc")) / (F.col("__nq") * F.col("__nc")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id",
            F.col("__lq").cast("int").alias("query_label"),
            "neighbor_id",
            F.col("__lc").cast("int").alias("neighbor_label"),
            F.round("cosine", 4).alias("cosine"),
            F.col("__rk").cast("int").alias("rank"),
        )
    )


def oracle_hard_negatives(
    table: str = "embeddings", k: int = 5, query_max_id: int = 10
) -> str:
    cos = """
         list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform(c.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    """
    return f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, CAST(q.label AS INT) AS query_label,
           c.vec_id AS neighbor_id, CAST(c.label AS INT) AS neighbor_label,
           {cos} AS cos_raw
    FROM {table} q JOIN {table} c ON q.label != c.label
    WHERE q.vec_id < {query_max_id}
),
ranked AS (
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           ROUND(cos_raw, 4) AS cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------------- #
# Binary (sign) quantization + Hamming search — the 1-bit memory tier
# --------------------------------------------------------------------- #
_BITS_PER_WORD = 32  # 32 bits per BIGINT word: bit 31 shifts overflow
# DuckDB's checked BIGINT << (and bit 63 would flip the sign), so both
# engines pack half-words — the semantics (1 bit/dim) are unchanged and
# a production sink would store the same words as INT columns.


def binary_quantize(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "bits"
) -> DataFrame:
    """Sign-bit quantization: dimension i contributes bit (i mod 32) of
    word (i div 32), set iff ``v[i] > 0`` — 1 bit per dimension, the
    32× memory tier below int8 (`quantize_embeddings`) and PQ. For
    L2-normalized embeddings, Hamming distance on sign patterns is a
    monotone estimator of angular distance (the same SimHash/
    hyperplane-LSH fact `lsh_ann_pairs` exploits — here with the 2^d
    axis-aligned hyperplanes instead of random ones).

    Entirely JVM higher-order functions over one projection — no UDF,
    no shuffle, and the float vectors are DROPPED from the output, so
    everything downstream (index build, search) moves 1/32nd the bytes.
    """
    # SQL expression (not the Python DSL): SQL `shiftleft` accepts a
    # column shift amount, which the pyspark wrapper does not
    wpack = f"""
    transform(sequence(0, (size({vec_col}) - 1) div {_BITS_PER_WORD}), w ->
        aggregate(sequence(0, {_BITS_PER_WORD - 1}), cast(0 as bigint),
            (acc, b) -> CASE
                WHEN w * {_BITS_PER_WORD} + b < size({vec_col})
                     AND element_at({vec_col},
                         cast(w * {_BITS_PER_WORD} + b + 1 as int)) > 0
                THEN acc | shiftleft(cast(1 as bigint), b)
                ELSE acc END))
    """
    return emb.select("vec_id", F.expr(wpack).alias(out_col))


def hamming_topk(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest corpus vectors per query under Hamming distance on
    the sign-quantized codes — the fastest/smallest ANN tier: a corpus
    scan moves packed words (1 bit/dim), distance is xor + popcount
    (whole-stage-codegen integer ops, no floats anywhere), and the
    result is EXACTLY reproducible across engines and partitionings —
    unlike any float-scoring search, there is no summation-order term.

    Same search shape as :func:`cosine_topk`: broadcast the query codes,
    one corpus scan, per-partition partial top-k via the rank window.
    Ties break to the lower neighbor_id (total order, engine-agnostic).
    """
    from pyspark.sql import Window

    codes = binary_quantize(emb, vec_col)
    q = F.broadcast(
        codes.filter(F.col("vec_id") < query_max_id).select(
            F.col("vec_id").alias("query_id"), F.col("bits").alias("__bq")
        )
    )
    c = codes.select(
        F.col("vec_id").alias("neighbor_id"), F.col("bits").alias("__bc")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__bq"),
            F.col("__bc"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).withColumn(
        "hamming", dist
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("hamming").cast("int").alias("hamming"),
            F.col("__rk").cast("int").alias("rank"),
        )
    )


def oracle_hamming_topk(
    table: str = "embeddings", k: int = 5, query_max_id: int = 10
) -> str:
    """DuckDB twin of binary_quantize + hamming_topk (same 32-bit word
    packing, same xor/bit_count integer path — hash-exact by
    construction)."""
    pack = """
        list_transform(range(0, (len(embedding) + 31) // 32), w ->
            list_sum(list_transform(range(0, 32), b ->
                CASE WHEN w * 32 + b < len(embedding)
                          AND embedding[w * 32 + b + 1] > 0
                     THEN (1::BIGINT << b) ELSE 0::BIGINT END)))
    """
    return f"""
WITH codes AS (
    SELECT vec_id, {pack} AS bits FROM {table}
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(range(1, len(q.bits) + 1),
                i -> bit_count(xor(q.bits[i], c.bits[i])))) AS INT)
               AS hamming
    FROM codes q JOIN codes c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {query_max_id}
),
ranked AS (
    SELECT query_id, neighbor_id, hamming,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY hamming ASC, neighbor_id ASC)
               AS rank
    FROM scored
)
SELECT query_id, neighbor_id, hamming, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------------- #
# Product quantization (PQ) — the memory tier below int8
# --------------------------------------------------------------------- #
class PQCodebooks:
    """Trained PQ codebooks: ``m`` subspaces × ``ksub`` centroids of
    ``dsub = dim/m`` floats each (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011). Vectors are L2-normalized
    before subspace split, so asymmetric-distance dot products
    approximate cosine directly.

    At 100 TB this is the index-fits-in-RAM lever: a 64-dim float32
    vector (256 B) compresses to ``m`` uint8 codes (8 B at m=8, 32×);
    the codebooks themselves are a few KiB and broadcast everywhere.
    """

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = codebooks  # (m, ksub, dsub) float64

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    ksub: int | None = 16,
    train_max_id: int | None = 256,
    kmeans_iters: int = 10,
    vec_col: str = "embedding",
) -> PQCodebooks:
    """Train per-subspace codebooks on a bounded driver-side sample
    (seeded strided init → deterministic, like :func:`ivf_build`).

    ``ksub=None`` is the LOSSLESS configuration: every training
    subvector becomes its own codeword (no Lloyd iterations), so if the
    training set is the whole corpus the encoding is exact and PQ
    search degrades to brute force — the oracle-gate configuration.
    """
    src = emb if train_max_id is None else emb.filter(
        F.col("vec_id") < train_max_id
    )
    train = np.stack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in src.select(vec_col).collect()
        ]
    )
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    subs = train.reshape(len(train), m, dsub)
    if ksub is None:
        return PQCodebooks(np.ascontiguousarray(subs.transpose(1, 0, 2)))
    books = []
    for j in range(m):
        x = subs[:, j, :]
        step = max(1, len(x) // ksub)
        cent = x[::step][:ksub].copy()
        for _ in range(kmeans_iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return PQCodebooks(np.stack(books))


def pq_encode(
    emb: DataFrame,
    cb: PQCodebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """Encode every corpus vector to its ``m`` nearest-codeword ids —
    one Arrow-batched narrow pass, no shuffle. This coded frame is what
    you'd persist as the index table at scale. ``extra_cols`` ride
    through unchanged (e.g. the IVF cell id, so IVF-PQ shares this one
    encoder)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(cb.codebooks)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        books = bc.value
        mm, _, dsub = books.shape
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        subs = mat.reshape(len(mat), mm, dsub)
        codes = np.empty((len(mat), mm), dtype=np.int32)
        for j in range(mm):
            d = ((subs[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return emb.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(c) for c in extra_cols],
        encode(F.col(vec_col)).alias("codes"),
    )


def _collect_normalized_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Bounded query set → (ids, L2-normalized matrix). The ONE place
    the query-side normalization convention lives — every searcher that
    collects queries (PQ, IVF-PQ) goes through here so a normalization
    change (e.g. a zero-norm guard) cannot diverge between paths."""
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[vec_col], np.float64) for r in qrows])
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    return qids, qm


def _pq_lut(qm: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """LUT[q, j, c] = query-j-subvector · codeword-c: approx cosine of
    a coded vector is then a sum of m gathers."""
    mm, _, dsub = codebooks.shape
    return np.einsum("qjd,jcd->qjc", qm.reshape(len(qm), mm, dsub), codebooks)


def _topk_tail(
    partial: DataFrame, k: int, rounded_order: bool = False
) -> DataFrame:
    """Global top-k over per-partition partials: one window on the tiny
    candidate set, deterministic (cosine DESC, neighbor ASC) order.

    ``rounded_order=True`` ranks on ``round(cosine, 4)`` — the value
    the result exposes — instead of the raw float. On data engineered
    so cosines are exact multiples of 1e-4 (the compressed-PQ
    verification gates), this makes the ordering engine-exact: equal
    rationals round to the identical double in numpy, Spark, and
    DuckDB, and the neighbor_id tie-break resolves them identically,
    where raw-float ordering would depend on each engine's summation
    order."""
    from pyspark.sql import Window

    key = (
        F.round(F.col("cosine"), 4) if rounded_order else F.col("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        key.desc(), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("__rk").alias("rank"),
        )
    )


def pq_search(
    queries: DataFrame,
    codes_df: DataFrame,
    cb: PQCodebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounded_order: bool = False,
) -> DataFrame:
    """Asymmetric-distance top-k: queries stay exact, the corpus is its
    codes. Per query a (m × ksub) lookup table of sub-dot-products is
    precomputed once; scoring a coded vector is then ``m`` table
    gathers — no float math per candidate. Same partial-top-k shape as
    :func:`topk_pandas`: each partition emits its local top-k and one
    tiny window keeps the global winners."""
    qids, qm = _collect_normalized_queries(queries, id_col, vec_col)
    lut = _pq_lut(qm, cb.codebooks)
    spark = queries.sparkSession
    bq = spark.sparkContext.broadcast((qids, lut))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, table = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # gather: scores (nq, n) = sum_j table[:, j, codes[:, j]]
            scores = np.zeros((len(ids_q), len(cids)))
            for j in range(codes.shape[1]):
                scores += table[:, j, codes[:, j]]
            if rounded_order:
                # rank on the exposed (4-decimal) value — see
                # _topk_tail: on 1e-4-grid data this makes the
                # partial selection engine-exact under score ties
                scores = np.round(scores, 4)
            nk = min(k + 1, scores.shape[1])
            part = np.argpartition(-scores, nk - 1, axis=1)[:, :nk]
            rows = []
            for qi in range(len(ids_q)):
                sel = part[qi]
                if rounded_order:
                    # tie-exact local top-nk under (score DESC,
                    # neighbor ASC): argpartition picks an arbitrary
                    # subset of a tie group straddling the boundary,
                    # which would drop winners the global window (and
                    # the oracle) keeps — re-select by threshold
                    srow = scores[qi]
                    thr = srow[sel].min()
                    gt = np.flatnonzero(srow > thr)
                    eq = np.flatnonzero(srow == thr)
                    eq = eq[np.argsort(cids[eq])][: nk - len(gt)]
                    sel = np.concatenate([gt, eq])
                for cj in sel:
                    if cids[cj] != ids_q[qi]:
                        rows.append(
                            (ids_q[qi], cids[cj], float(scores[qi, cj]))
                        )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine"]
            )

    return _topk_tail(
        codes_df.mapInPandas(gen, out_schema), k,
        rounded_order=rounded_order,
    )


def pq_topk(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    m: int = 8,
    ksub: int | None = 16,
    train_max_id: int | None = 256,
    kmeans_iters: int = 10,
    vec_col: str = "embedding",
    rounded_order: bool = False,
) -> DataFrame:
    """One-call PQ approximate top-k: train → encode → ADC search with
    the query set drawn from the corpus (``vec_id < query_max_id``)."""
    cb = pq_train(
        emb, m=m, ksub=ksub, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    codes = pq_encode(emb, cb, vec_col=vec_col)
    return pq_search(
        emb.filter(F.col("vec_id") < query_max_id), codes, cb, k=k,
        vec_col=vec_col, rounded_order=rounded_order,
    )


def ivf_pq_topk(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int | None = 16,
    train_max_id: int | None = 256,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
    rounded_order: bool = False,
) -> DataFrame:
    """IVF-PQ: the production ANN composition — the coarse quantizer
    prunes candidates to ``nprobe/nlist`` of the corpus, and PQ codes
    score what remains via per-query lookup tables. The index the
    corpus side carries is (cell, m codes): both levers at once —
    candidate pruning AND 16-32× memory compression; raw vectors never
    join anything.

    ``nprobe == nlist`` + ``ksub=None`` (lossless codes, whole-corpus
    training) degrades to exact brute force — the oracle-gate
    configuration; recall tunes with nprobe and ksub independently.
    """
    index = ivf_build(
        emb, nlist=nlist, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    cb = pq_train(
        emb, m=m, ksub=ksub, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    spark = emb.sparkSession
    # the ONE PQ encoder (pq_encode), the cell id riding through — the
    # IVF-PQ index row is exactly (neighbor_id, __cell, codes)
    coded = pq_encode(
        index.assigned, cb, vec_col="__vc", id_col="neighbor_id",
        extra_cols=("__cell",),
    )

    queries = emb.filter(F.col("vec_id") < query_max_id)
    return ivfpq_search(
        queries, coded, index.centroids, cb, k=k, nprobe=nprobe,
        vec_col=vec_col, rounded_order=rounded_order,
    )


def ivfpq_search(
    queries: DataFrame,
    coded: DataFrame,
    centroids,
    cb: PQCodebooks,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    rounded_order: bool = False,
) -> DataFrame:
    """Search an IVF-PQ index frame (``(neighbor_id, __cell, codes)`` —
    built inline by :func:`ivf_pq_topk` or loaded from the catalog by
    :func:`load_ivfpq_index`): per query, probe the ``nprobe`` nearest
    cells and LUT-score the candidates' codes. ONE owner of the search
    tail, so the inline and persisted paths cannot drift."""
    spark = queries.sparkSession
    qids, qm = _collect_normalized_queries(queries, "vec_id", vec_col)
    lut = _pq_lut(qm, cb.codebooks)
    order = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    bq = spark.sparkContext.broadcast(
        ({int(q): i for i, q in enumerate(qids)}, lut)
    )
    probes = spark.createDataFrame(
        [
            (int(q), int(c))
            for qi, q in enumerate(qids)
            for c in order[qi]
        ],
        "query_id long, __cell int",
    )
    cands = F.broadcast(probes).join(coded, "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qpos, table = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            qs = pdf["query_id"].map(qpos).to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            s = np.zeros(len(pdf))
            for j in range(codes.shape[1]):
                s += table[qs, j, codes[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine": s,
                }
            )

    return _topk_tail(
        cands.select("query_id", "neighbor_id", "codes").mapInPandas(
            score, out_schema
        ),
        k,
        rounded_order=rounded_order,
    )


def ann_recall_report(
    emb: DataFrame,
    k: int = 5,
    query_max_id: int = 10,
    method: str = "ivf",
    vec_col: str = "embedding",
    **params,
) -> DataFrame:
    """Per-query recall@k of an approximate index against brute force —
    the monitor an ANN deployment runs on a sampled query set before
    (and periodically after) trusting the index. ``method`` picks the
    approximate path (``"ivf"``, ``"pq"``, or ``"ivf_pq"``, with that
    searcher's knobs routed through ``**params``); the exact side is
    :func:`cosine_topk` on the same queries.

    Both top-k frames are |queries|×k rows, so the compare is a tiny
    aggregation — run it on a bounded query sample, the corpus-side
    cost is the two searches themselves. Returns
    ``(query_id, n_exact, n_hit, recall)``.
    """
    searchers = {
        "ivf": ivf_topk,
        "pq": pq_topk,
        "ivf_pq": ivf_pq_topk,
    }
    if method not in searchers:
        raise ValueError(
            f"unknown method: {method!r} (use {sorted(searchers)})"
        )
    exact = cosine_topk(
        emb, k=k, query_max_id=query_max_id, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    approx = searchers[method](
        emb, k=k, query_max_id=query_max_id, vec_col=vec_col, **params
    ).select("query_id", F.col("neighbor_id").alias("__approx_n"))
    hits = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["__approx_n"]),
        "left",
    ).select(exact["query_id"], exact["neighbor_id"], "__approx_n")
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__approx_n").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
        )
    )


def recall_report(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Integer-exact recall@k of one ranked retrieval frame against
    another — the generic compare under :func:`ann_recall_report`,
    factored out so VALUE-CHECKABLE retrieval tiers (the portable
    LSH/IVF twins, whose ranked lists replay exactly in SQL) can feed
    a driver-gateable recall monitor: ``recall_ppm = n_hit · 10⁶ div
    n_exact`` stays in BIGINT on every engine, so the whole report is
    hash-stable (no float recall column — the r05 dtype lesson).

    Both inputs need ``(query_id, neighbor_id)``; each is |queries|×k,
    so the join and aggregate are tiny regardless of corpus size."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select(
        "query_id", F.col("neighbor_id").alias("__approx_n")
    )
    hits = e.join(
        a,
        (e["query_id"] == a["query_id"])
        & (e["neighbor_id"] == a["__approx_n"]),
        "left",
    ).select(e["query_id"], e["neighbor_id"], "__approx_n")
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__approx_n").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.expr("CAST((n_hit * 1000000L) div n_exact AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


def oracle_recall_report(exact_sql: str, approx_sql: str) -> str:
    """DuckDB replay of :func:`recall_report` composed over two
    already-oracled retrieval SQLs (each yielding at least
    ``(query_id, neighbor_id)``) — same composed-oracle pattern as
    :func:`oracle_rrf_fuse`: one source of truth per tier."""
    return f"""
WITH e AS (SELECT query_id, neighbor_id
           FROM ({exact_sql.rstrip().rstrip(';')})),
a AS (SELECT query_id, neighbor_id
      FROM ({approx_sql.rstrip().rstrip(';')})),
h AS (
    SELECT e.query_id, e.neighbor_id,
           a.neighbor_id AS hit
    FROM e LEFT JOIN a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
)
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(hit) AS BIGINT) AS n_hit,
       CAST(COUNT(hit) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
FROM h GROUP BY query_id
"""


def save_pq_index(codes_df: DataFrame, cb: PQCodebooks, table: str) -> None:
    """Persist a PQ index (the build-once/search-many lifecycle, PQ's
    counterpart of :func:`~pipit_spark.llm.dedup.save_lsh_index`): the
    coded corpus saves as a catalog table — the m uint8-sized codes per
    vector ARE the index, 16-32× smaller than the raw floats — and the
    trained codebooks ride in a companion ``{table}__pqmeta`` table
    (one row per (subspace, codeword) with its centroid), so tomorrow's
    search job reconstructs the exact float codebooks without the
    training sample or any retrain drift. No bucketing: search is a
    full LUT-gather scan of the codes, there is no join key to
    co-locate."""
    spark = codes_df.sparkSession
    codes_df.write.mode("overwrite").saveAsTable(table)
    books = cb.codebooks  # (m, ksub, dsub) float64
    rows = [
        (mi, ki, [float(x) for x in books[mi, ki]])
        for mi in range(books.shape[0])
        for ki in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "m_idx int, k_idx int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{table}__pqmeta")


def load_pq_index(spark, table: str):
    """Load a :func:`save_pq_index` index: returns ``(codes_df,
    PQCodebooks)`` ready for :func:`pq_search`. The codebook table is
    KB-sized (m×ksub rows) — the collect is driver-trivial and exact
    (float64 round-trips losslessly through the catalog)."""
    codes_df = spark.table(table)
    meta = spark.table(f"{table}__pqmeta").collect()
    m = max(r["m_idx"] for r in meta) + 1
    ksub = max(r["k_idx"] for r in meta) + 1
    dsub = len(meta[0]["centroid"])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in meta:
        books[r["m_idx"], r["k_idx"]] = r["centroid"]
    return codes_df, PQCodebooks(books)


def save_ivf_index(index: IVFIndex, table: str) -> None:
    """Persist an :class:`IVFIndex` (the IVF counterpart of
    :func:`save_pq_index`): the cell-assigned corpus saves as a catalog
    table PARTITIONED by ``__cell`` — so a later search job's cell
    probes become partition pruning, reading nprobe/nlist of the files
    instead of filtering a full scan — and the centroids ride in a
    companion ``{table}__ivfmeta`` table (float64-lossless)."""
    spark = index.assigned.sparkSession
    (
        index.assigned.write.mode("overwrite")
        .partitionBy("__cell")
        .saveAsTable(table)
    )
    cent = index.centroids
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__ivfmeta")


def load_ivf_index(spark, table: str, vec_col: str = "embedding") -> IVFIndex:
    """Load a :func:`save_ivf_index` index ready for
    :func:`ivf_search`. Cell probes prune the ``__cell`` partitions of
    the catalog table — the scan cost is nprobe/nlist of the corpus by
    FILE layout, not post-scan filtering."""
    assigned = spark.table(table)
    meta = sorted(
        spark.table(f"{table}__ivfmeta").collect(),
        key=lambda r: r["cell"],
    )
    cent = np.stack([np.asarray(r["centroid"]) for r in meta])
    return IVFIndex(cent, assigned, vec_col)


def save_ivfpq_index(
    emb: DataFrame,
    table: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int | None = 16,
    train_max_id: int | None = 256,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
) -> None:
    """Build and persist the production ANN composition in one call:
    the IVF-PQ index rows ``(neighbor_id, __cell, codes)`` save as a
    catalog table PARTITIONED by cell (probes → partition pruning, the
    save_ivf_index layout) at PQ-code size (16-32× below raw floats —
    both levers persist together), with centroids and codebooks in the
    ``__ivfmeta``/``__pqmeta`` companion tables."""
    index = ivf_build(
        emb, nlist=nlist, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    cb = pq_train(
        emb, m=m, ksub=ksub, train_max_id=train_max_id,
        kmeans_iters=kmeans_iters, vec_col=vec_col,
    )
    coded = pq_encode(
        index.assigned, cb, vec_col="__vc", id_col="neighbor_id",
        extra_cols=("__cell",),
    )
    spark = emb.sparkSession
    (
        coded.select("neighbor_id", "__cell", "codes")
        .write.mode("overwrite")
        .partitionBy("__cell")
        .saveAsTable(table)
    )
    cent = index.centroids
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__ivfmeta")
    books = cb.codebooks
    spark.createDataFrame(
        [
            (mi, ki, [float(x) for x in books[mi, ki]])
            for mi in range(books.shape[0])
            for ki in range(books.shape[1])
        ],
        "m_idx int, k_idx int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{table}__pqmeta")


def load_ivfpq_index(spark, table: str):
    """Load a :func:`save_ivfpq_index` index: returns ``(coded_df,
    centroids, PQCodebooks)`` ready for :func:`ivfpq_search` — the
    float64 metadata round-trips losslessly, so a later job's search
    results are identical to searching the build-time index."""
    coded = spark.table(table)
    ivf_meta = sorted(
        spark.table(f"{table}__ivfmeta").collect(), key=lambda r: r["cell"]
    )
    centroids = np.stack([np.asarray(r["centroid"]) for r in ivf_meta])
    pq_meta = spark.table(f"{table}__pqmeta").collect()
    mm = max(r["m_idx"] for r in pq_meta) + 1
    kk = max(r["k_idx"] for r in pq_meta) + 1
    dsub = len(pq_meta[0]["centroid"])
    books = np.zeros((mm, kk, dsub), dtype=np.float64)
    for r in pq_meta:
        books[r["m_idx"], r["k_idx"]] = r["centroid"]
    return coded, centroids, PQCodebooks(books)


# ---------------------------------------------------------- isolation
def isolation_scores(
    emb: DataFrame,
    query_max_id: int = 100,
    bottom_k: int = 20,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-isolation outliers: the ``bottom_k`` vectors (among
    ``vec_id < query_max_id``) whose MAXIMUM cosine similarity to any
    other corpus vector is lowest — the "nothing else looks like
    this" signal a curation pipeline uses to surface OCR garbage,
    encoding corruption, or genuinely novel content before training.

    Exact form: reuses :func:`cosine_topk`'s broadcast-query /
    one-corpus-scan plan with k=1 (the nearest neighbor IS the max
    similarity), then a global bottom-k — query count is bounded, so
    the work is |queries|·|corpus| dot products in one scan, never
    |corpus|².  The 100-TB path swaps the scan for the IVF index
    (:func:`ivf_topk` k=1): isolation scores are then lower bounds
    (a missed true neighbor can only make a vector look MORE
    isolated), which is the right direction for a triage queue.
    Ties break (max_cosine ASC, vec_id ASC) — total order, so the
    LIMIT is deterministic."""
    nearest = cosine_topk(
        emb, k=1, query_max_id=query_max_id, vec_col=vec_col
    )
    return (
        nearest.select(
            F.col("query_id").alias("vec_id"),
            F.col("neighbor_id").alias("nearest_id"),
            F.col("cosine").alias("max_cosine"),
        )
        .orderBy(F.asc("max_cosine"), F.asc("vec_id"))
        .limit(bottom_k)
    )


def oracle_isolation_scores(
    table: str = "embeddings",
    query_max_id: int = 100,
    bottom_k: int = 20,
) -> str:
    """DuckDB twin of :func:`isolation_scores` — shares
    oracle_cosine_topk's float expression tree (the cosine gates prove
    the two engines agree bit-for-bit on it)."""
    cos = """
         list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform(c.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    """
    return f"""
WITH scored AS (
    SELECT q.vec_id, c.vec_id AS neighbor_id, {cos} AS cos_raw
    FROM {table} q JOIN {table} c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {query_max_id}
),
nearest AS (
    SELECT vec_id, neighbor_id AS nearest_id,
           ROUND(cos_raw, 4) AS max_cosine,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos_raw DESC, neighbor_id ASC)
               AS rnk
    FROM scored
)
SELECT vec_id, nearest_id, max_cosine
FROM nearest WHERE rnk = 1
ORDER BY max_cosine ASC, vec_id ASC
LIMIT {bottom_k}
"""


def ivf_append(
    spark, table: str, new_emb: DataFrame, vec_col: str = "embedding"
) -> int:
    """Append a new vector batch to a persisted IVF index WITHOUT
    retraining: the saved centroids load from the companion meta
    table, the batch assigns to cells in one Arrow pass, and the rows
    append into the cell-partitioned catalog table — the
    build-once/append-many lifecycle an embedding store needs at
    100 TB (re-clustering the corpus per ingest batch would dwarf the
    ingest itself).  Search (:func:`load_ivf_index` → `ivf_search`)
    sees appended vectors immediately; partition pruning is unchanged
    because the append lands in the same ``__cell`` layout.

    Frozen centroids mean cells drift as the distribution shifts —
    monitor :func:`ivf_cell_stats` and rebuild when the cell-size
    skew degrades probe efficiency.  Caller is responsible for id
    dedup (compose with the incremental-ingestion ops).  Returns the
    number of appended rows."""
    meta = sorted(
        spark.table(f"{table}__ivfmeta").collect(),
        key=lambda r: r["cell"],
    )
    cent = np.stack([np.asarray(r["centroid"]) for r in meta])
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vs: pd.Series) -> pd.Series:
        c = bc.value
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ c.T).argmax(axis=1).astype("int32"))

    batch = with_norm(new_emb, vec_col).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(vec_col).alias("__vc"),
        F.col("__norm").alias("__nc"),
        cell_udf(F.col(vec_col)).alias("__cell"),
    )
    n = batch.count()
    batch.write.mode("append").partitionBy("__cell").saveAsTable(table)
    return n


def ivf_cell_stats(spark, table: str) -> DataFrame:
    """Cell-occupancy profile of a persisted IVF index: per-cell row
    counts plus each cell's share in ppm — the rebuild trigger for
    :func:`ivf_append`'s frozen-centroid drift (a cell holding 30% of
    the corpus means probes stopped pruning)."""
    counts = spark.table(table).groupBy("__cell").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    total = counts.agg(F.sum("n_vectors").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("__cell").alias("cell"),
            "n_vectors",
            F.expr("n_vectors * 1000000 div __t").alias("share_ppm"),
        )
    )


def decontaminate_embeddings(
    emb: DataFrame,
    eval_emb: DataFrame,
    vec_col: str = "embedding",
    threshold_ppm: int = 900_000,
    quant: int = 1000,
) -> DataFrame:
    """Drop corpus rows whose embedding is near-duplicate of ANY eval
    vector — semantic decontamination, the embedding-space complement
    of the n-gram ``decontaminate`` (llm/dedup.py): a paraphrased eval
    item shares no 8-gram but sits next to its source in embedding
    space (cf. SemDeDup/D4, Abbas et al. 2023).

    EXACT-INTEGER screen: components quantize to ``round(x·quant)``
    BIGINTs; ``cos ≥ t`` becomes ``dot > 0 AND dot²·10¹² ≥
    t_ppm²·|a|²·|b|²`` evaluated in DECIMAL(38,0) (HUGEINT in the
    DuckDB oracle) — no float leaves the row, so the survivor set is
    bit-identical across engines and partitionings at any scale (a
    float cosine threshold flips membership in the last ulp). The
    quantized cosine differs from the float cosine by O(1/quant) —
    a screen threshold is a heuristic, not a sharp boundary;
    ``quant=1000`` puts the wobble at the 3rd decimal.

    Scale shape: the eval side is small (eval suites are 10³-10⁵
    rows) and rides a broadcast nested-loop; the corpus never
    shuffles — hit ids reduce map-side through the semi-join's
    distinct. Per corpus row the screen costs |eval|·dim multiplies;
    for |eval| beyond ~10⁵ route candidate generation through
    ``lsh_ann_pairs`` first and exact-screen only the candidates."""
    q = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(x.cast("double") * quant).cast("long")
    )
    isq = F.aggregate(  # integer self-dot
        F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    corpus = emb.withColumn("__qa", q(F.col(vec_col)))
    evals = eval_emb.select(q(F.col(vec_col)).alias("__qb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    na2 = F.aggregate(
        F.transform(F.col("__qa"), lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    nb2 = F.aggregate(
        F.transform(F.col("__qb"), lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    hits = (
        corpus.join(F.broadcast(evals))
        .withColumn("__dot", isq)
        .filter(
            (F.col("__dot") > 0)
            & (
                dec(F.col("__dot")) * dec(F.col("__dot"))
                * F.lit(10**12).cast("decimal(38,0)")
                >= dec(F.lit(threshold_ppm)) * dec(F.lit(threshold_ppm))
                * dec(na2) * dec(nb2)
            )
        )
        .select("vec_id")
        .distinct()
    )
    return emb.join(hits, "vec_id", "left_anti")


def oracle_decontaminate_embeddings(
    corpus_pred: str,
    eval_pred: str,
    threshold_ppm: int = 900_000,
    quant: int = 1000,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ``decontaminate_embeddings`` — same quantized
    BIGINT dot products, HUGEINT comparison (DuckDB's native 128-bit
    twin of Spark's DECIMAL(38,0)). ``corpus_pred``/``eval_pred``
    split ``table`` into the two sides."""
    return f"""
WITH q AS (
    SELECT vec_id, label,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
    FROM {table}
),
corpus AS (SELECT * FROM q WHERE {corpus_pred}),
evals  AS (SELECT qv AS eb FROM q WHERE {eval_pred}),
prod AS (
    SELECT c.vec_id, c.label,
           list_sum(list_transform(range(1, len(c.qv) + 1),
               i -> c.qv[i] * e.eb[i])) AS dot,
           list_sum(list_transform(c.qv, x -> x * x)) AS na2,
           list_sum(list_transform(e.eb, x -> x * x)) AS nb2
    FROM corpus c CROSS JOIN evals e
),
hits AS (
    SELECT DISTINCT vec_id FROM prod
    WHERE dot > 0
      AND CAST(dot AS HUGEINT) * dot * 1000000000000
          >= CAST({threshold_ppm} AS HUGEINT) * {threshold_ppm} * na2 * nb2
)
SELECT c.vec_id, c.label FROM corpus c
ANTI JOIN hits h ON c.vec_id = h.vec_id
ORDER BY c.vec_id
"""


def _portable_planes(
    num_tables: int, num_planes: int, dim: int, quant: int = 1000
) -> list[list[int]]:
    """Integer hyperplane components derived from md5 — identical
    constants on any engine, so LSH signatures built from them are
    engine-portable (the float path's numpy RandomState is not). One
    plane = ``dim`` ints in [-quant, quant] from
    ``md5('lsh:{table}:{plane}:{dim}')``."""
    import hashlib

    out = []
    for t in range(num_tables):
        for p in range(num_planes):
            out.append(
                [
                    int(
                        hashlib.md5(
                            f"lsh:{t}:{p}:{j}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % (2 * quant + 1)
                    - quant
                    for j in range(dim)
                ]
            )
    return out


def _int_dots_udf(mat: list[list[int]]):
    """Arrow-batched EXACT integer dot products of a quantized vector
    column against a static integer matrix (one row per
    plane/centroid): one numpy int64 matmul per batch. Replaces the
    interpreted higher-order-function fold, which evaluates ~1e6
    lambda ops/sec/core — at 16 planes x 64 dims that alone was ~1 ms
    PER ROW; the matmul does the same work at memory bandwidth.
    Bit-identical to the fold and to the DuckDB oracle: int64 products
    of |v|<=quant-scaled longs, |dot| <= dim*quant^2 << 2^63."""
    M = np.asarray(mat, dtype=np.int64).T  # dim x nplanes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def dots(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        A = np.vstack(v.to_numpy()).astype(np.int64, copy=False)
        return pd.Series(list(A @ M))

    return dots


@F.pandas_udf(T.LongType())
def _pair_dot_int_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact int64 pairwise dot of two quantized vector columns —
    the vectorized twin of aggregate(zip_with(a, b, *)) for the
    candidate-scoring joins (one multiply-add row per candidate
    pair is the hot loop of every portable ANN tier)."""
    if len(a) == 0:
        return pd.Series([], dtype="int64")
    A = np.vstack(a.to_numpy()).astype(np.int64, copy=False)
    B = np.vstack(b.to_numpy()).astype(np.int64, copy=False)
    return pd.Series((A * B).sum(axis=1))


def _rank_portable_candidates(
    pairs: DataFrame, corp: DataFrame, qry: DataFrame, k: int,
    qrows=None,
) -> DataFrame:
    """Shared scoring+ranking tail of the portable ANN tiers.

    ``pairs``: candidate (qid, cid) pairs — ids ONLY, so the bucket
    join and dedup upstream never shuffle vectors. ``corp``:
    (cid, cq, na2). ``qry``: (qid, qq).

    Scoring volume scales with |candidate corpus rows|, not |pairs|:
    for a bounded query batch (the production retrieval shape — corpus
    grows, the query batch does not) the quantized queries are
    collected once and every DISTINCT candidate row's dots against ALL
    queries come out of one Arrow int64 matmul; the per-pair step is
    then an element_at on the dots array. Above 10k queries it falls
    back to the per-pair dot kernel (both paths are exact int64 —
    identical values). Ranking: the DECIMAL(38,0) signed quantized
    cosine-squared surrogate with vec_id tie-break; `div` on the
    positive quantity so Spark's integral division matches DuckDB's //
    exactly."""
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    spark = pairs.sparkSession
    if qrows is None:
        qrows = qry.select("qid", "qq").limit(10_001).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, dot_q long"
        )
    if len(qrows) <= 10_000:
        # the candidate-pair subtree is consumed three times below
        # (cid-distinct scoring, the per-pair join, the window input)
        # with different column pruning, which defeats Catalyst's
        # exchange reuse — persist so the upstream bucket/cell join
        # runs once; pairs are id-only rows, orders smaller than the
        # corpus they came from (released by release_portable_caches)
        pairs = _persist_tracked(pairs)
        qmat = [list(r.qq) for r in qrows]
        qdots = _int_dots_udf(qmat)
        idx = spark.createDataFrame(
            [(r.qid, i + 1) for i, r in enumerate(qrows)],
            "qid long, __qi int",
        )
        cids = (
            pairs.select("cid")
            .distinct()
            .join(corp, "cid")
            .withColumn("__qdots", qdots(F.col("cq")))
            .select("cid", "na2", "__qdots")
        )
        cand = (
            pairs.join(F.broadcast(idx), "qid")
            .join(cids, "cid")
            .withColumn(
                "__dot", F.element_at(F.col("__qdots"), F.col("__qi"))
            )
        )
    else:
        cand = (
            pairs.join(corp, "cid")
            .join(qry, "qid")
            .withColumn(
                "__dot", _pair_dot_int_udf(F.col("qq"), F.col("cq"))
            )
        )
    cand = (
        cand.withColumn(
            "__num",
            dec(F.col("__dot")) * dec(F.col("__dot"))
            * F.lit(10**6).cast("decimal(38,0)"),
        )
        .withColumn("__na2", dec(F.col("na2")))
        .withColumn(
            "__key",
            F.when(
                F.col("__dot") >= 0, F.expr("__num div __na2")
            ).otherwise(-F.expr("__num div __na2")),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("__key").desc(), F.col("cid").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("cid").alias("neighbor_id"),
            F.col("__dot").alias("dot_q"),
        )
    )


def _quantize_vec(col, quant: int):
    """round(v·quant) as int64 — the shared quantizer of every
    portable tier (F.round so rounding matches the oracle's ROUND)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * quant).cast("long")
    )


def _lsh_sig_frame(
    df: DataFrame,
    id_out: str,
    vq_out: str,
    num_tables: int,
    num_planes: int,
    quant: int,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """``(id_out, vq_out: array<long>, sigs: array<long>)`` — the
    signature half shared by :func:`lsh_topk_portable` (both sides),
    :func:`save_lsh_topk_index`, and the indexed search's query side,
    so a persisted index and a live query can never drift. All plane
    dots in ONE Arrow matmul per batch (_int_dots_udf); signature bits
    assembled from the dots array JVM-side."""
    planes = _portable_planes(num_tables, num_planes, dim, quant)
    dots_udf = _int_dots_udf(planes)
    sigs = []
    dcol = F.col("__dots")
    for t in range(num_tables):
        bits = [
            F.when(
                F.element_at(dcol, t * num_planes + p + 1) > 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(num_planes)
        ]
        sigs.append(sum(bits[1:], bits[0]))
    return (
        df.select(
            F.col("vec_id").alias(id_out),
            _quantize_vec(F.col(vec_col), quant).alias(vq_out),
        )
        .withColumn("__dots", dots_udf(F.col(vq_out)))
        .withColumn("sigs", F.array(*sigs))
        .drop("__dots")
    )


def lsh_topk_portable(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 4,
    num_planes: int = 4,
    quant: int = 1000,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k neighbors with a FULLY value-checkable plan —
    the driver-gateable twin of the float ANN tiers (ivf_topk /
    pq_search verify only their exact configurations; this verifies
    the approximate path itself).

    Every stage is engine-exact: (1) signatures — per table, one bit
    per plane, bit = ``Σⱼ cⱼ·round(vⱼ·quant) > 0`` over md5-derived
    integer plane components (``_portable_planes``); (2) candidates —
    banded OR-construction, corpus∪query signature equi-join per
    table, so recall follows 1-(1-p^b)^T like the float path and NO
    pair is scored outside a shared bucket; (3) ranking — per query,
    order candidates by signed quantized cosine-squared surrogate
    ``sign(dot)·(dot²·10⁶ div |c|²)`` in DECIMAL(38,0) (HUGEINT in
    DuckDB): |q| is constant within a query group, so the surrogate
    orders exactly like cosine, with vec_id as the total tie-break.
    No float enters membership OR order — bit-identical across
    engines and partitionings.

    Scale shape: signatures are one narrow Arrow matmul pass per side
    (exact int64 — see _int_dots_udf; no float, no shuffle); the
    candidate join shuffles (table, signature) keys; ranking is a
    per-query window over candidate slivers. Same bucket-skew note as
    lsh_ann_pairs: pathological near-constant regions want the bucket
    cap; here query buckets are |queries|-bounded already."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    corp = _lsh_sig_frame(
        emb, "cid", "cq", num_tables, num_planes, quant, vec_col, dim
    ).withColumn("na2", _pair_dot_int_udf(F.col("cq"), F.col("cq")))
    # consumed by the signature bucket join AND the ranking tail —
    # persist so the corpus signature pass (Arrow matmul) runs once
    # (at gate scale this is noise; at a real corpus it halves the
    # expensive pass — PLANS.md §17 multi-reference trap); released
    # by release_portable_caches between batches
    corp = _persist_tracked(corp)
    qry = _lsh_sig_frame(
        queries, "qid", "qq", num_tables, num_planes, quant, vec_col, dim
    )
    # NOTE r06: the indexed searchers collect the bounded query batch
    # into local frames (it replaces repeated catalog+UDF stages
    # there); measured HERE that trade LOSES — the inline query
    # subtree is cheap and pipelines inside the one big job, while a
    # driver collect serializes two extra job round-trips per tier
    # (+2 s on the fused gate at sf0.1). Keep the inline tiers fully
    # distributed.
    # bucket join + dedup over ids ONLY — vectors never ride the
    # (t, sig) shuffle or the distinct
    ce = corp.select("cid", F.posexplode("sigs").alias("t", "sig"))
    qe = qry.select("qid", F.posexplode("sigs").alias("t", "sig"))
    pairs = (
        qe.join(ce, ["t", "sig"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    return _rank_portable_candidates(
        pairs,
        corp.select("cid", "cq", "na2"),
        qry.select("qid", "qq"),
        k,
    )


def oracle_lsh_topk_portable(
    corpus_pred: str,
    query_pred: str,
    k: int = 5,
    num_tables: int = 4,
    num_planes: int = 4,
    quant: int = 1000,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ``lsh_topk_portable`` — same md5-derived plane
    constants (embedded as literal lists), same integer signatures,
    same HUGEINT rank surrogate."""
    planes = _portable_planes(num_tables, num_planes, dim, quant)
    plane_rows = ", ".join(
        f"({t}, {p}, [{', '.join(str(c) for c in planes[t * num_planes + p])}])"
        for t in range(num_tables)
        for p in range(num_planes)
    )
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
    FROM {table}
),
planes(t, p, c) AS (VALUES {plane_rows}),
sigs AS (
    SELECT q.vec_id, pl.t,
           SUM(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        i -> q.qv[i] * pl.c[i])) > 0
                    THEN 1 << pl.p ELSE 0 END) AS sig
    FROM q CROSS JOIN planes pl GROUP BY 1, 2
),
corpus AS (SELECT vec_id AS cid, qv AS cq FROM q
           WHERE {corpus_pred}),
queries AS (SELECT vec_id AS qid, qv AS qq FROM q
            WHERE {query_pred}),
cand AS (
    SELECT DISTINCT qs.vec_id AS qid, cs.vec_id AS cid
    FROM sigs qs JOIN sigs cs ON qs.t = cs.t AND qs.sig = cs.sig
    JOIN queries qy ON qy.qid = qs.vec_id
    JOIN corpus co ON co.cid = cs.vec_id
    WHERE qs.vec_id != cs.vec_id
),
scored AS (
    SELECT c.qid, c.cid,
           list_sum(list_transform(range(1, {dim} + 1),
               i -> qy.qq[i] * co.cq[i])) AS dot,
           list_sum(list_transform(co.cq, x -> x * x)) AS na2
    FROM cand c JOIN queries qy ON qy.qid = c.qid
    JOIN corpus co ON co.cid = c.cid
),
keyed AS (
    SELECT qid, cid, dot,
           CASE WHEN dot >= 0
                THEN (CAST(dot AS HUGEINT) * dot * 1000000) // na2
                ELSE -((CAST(dot AS HUGEINT) * dot * 1000000) // na2)
           END AS key
    FROM scored
),
ranked AS (
    SELECT qid, cid, dot,
           ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY key DESC, cid ASC) AS rank
    FROM keyed
)
SELECT qid AS query_id, rank, cid AS neighbor_id,
       CAST(dot AS BIGINT) AS dot_q
FROM ranked WHERE rank <= {k}
ORDER BY 1, 2
"""


def _portable_centroids(
    nlist: int, dim: int, quant: int = 1000
) -> list[list[int]]:
    """Integer cell centroids derived from md5 (``'ivfc:{j}:{i}'``) —
    the IVF counterpart of :func:`_portable_planes`: identical
    constants on any engine, so cell assignment built from them is
    engine-portable. A random-direction Voronoi quantizer rather than
    trained k-means — cells are less balanced than trained ones, but
    the *index structure* (assign → probe → per-cell rank) is the same,
    which is what the portable twin exists to verify."""
    import hashlib

    return [
        [
            int(
                hashlib.md5(f"ivfc:{j}:{i}".encode()).hexdigest()[:8], 16
            )
            % (2 * quant + 1)
            - quant
            for i in range(dim)
        ]
        for j in range(nlist)
    ]


def _ivf_cell_keys(df, vq_col, cents, na2s):
    """Adds __keys: array<struct<k,nj>> of per-centroid surrogate
    keys — all centroid dots in one Arrow int64 matmul
    (_int_dots_udf), keys assembled JVM-side. |c_j|² is a Python
    int baked into the `div` SQL (same integral-division operator
    as the candidate ranking, so truncation semantics match the
    oracle's // exactly). Shared by the inline tier, the persisted
    index builder, and the indexed search's probe side."""
    cent_dots_udf = _int_dots_udf(cents)
    structs = []
    tmp = ["__dots"]
    df = df.withColumn("__dots", cent_dots_udf(F.col(vq_col)))
    for j, na2j in enumerate(na2s):
        df = df.withColumn(
            f"__d{j}", F.element_at(F.col("__dots"), j + 1)
        )
        mag = (
            f"(CAST(__d{j} AS DECIMAL(38,0)) * CAST(__d{j} AS "
            f"DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0))) "
            f"div CAST({int(na2j)} AS DECIMAL(38,0))"
        )
        df = df.withColumn(
            f"__k{j}",
            F.expr(
                f"CASE WHEN __d{j} >= 0 THEN {mag} "
                f"ELSE -({mag}) END"
            ),
        )
        structs.append(
            F.struct(
                F.col(f"__k{j}").alias("k"), F.lit(-j).alias("nj")
            )
        )
        tmp += [f"__d{j}", f"__k{j}"]
    return df.withColumn("__keys", F.array(*structs)).drop(*tmp)


def _ivf_assign_kernel(cents, na2s, nprobe: int = 1):
    """Arrow kernel computing the portable-IVF cell assignment (or the
    ``nprobe`` best cells) entirely inside one pandas UDF — the scale
    path past the unrolled-column form: `_ivf_cell_keys` materializes
    one column pair PER centroid (whole-stage-codegen-friendly, but
    plan width grows O(nlist)), so above ~64 cells the plan itself
    becomes the bottleneck. Here the centroid dots are one exact-int64
    numpy matmul and the >64-bit surrogate keys
    ``sign(dot)·(dot²·10⁶ div |c_j|²)`` are arbitrary-precision Python
    ints (object-dtype numpy) — bit-identical to the column form and
    to the DuckDB HUGEINT oracle, including the smaller-cell-index
    tie-break (np.argmax returns the FIRST maximum).

    Returns a pandas_udf: array<long> → int (nprobe=1) or
    array<int> (nprobe>1, best cells in probe order)."""
    C = np.asarray(cents, dtype=np.int64)
    na2 = np.asarray([int(x) for x in na2s], dtype=object)

    def keys_for(vbatch: pd.Series) -> np.ndarray:
        M = np.asarray(vbatch.tolist(), dtype=np.int64)
        dots = M @ C.T  # exact: |dot| ≤ quant²·dim ≪ 2^63
        D = dots.astype(object)
        mag = (D * D * 1000000) // na2
        return np.where(dots >= 0, mag, -mag)

    if nprobe == 1:

        @F.pandas_udf("int")
        def assign(v: pd.Series) -> pd.Series:
            if v.empty:
                return pd.Series([], dtype="int32")
            K = keys_for(v)
            return pd.Series(np.argmax(K, axis=1).astype("int32"))

        return assign

    @F.pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        K = keys_for(v)
        nlist = K.shape[1]
        out = [
            sorted(range(nlist), key=lambda j: (-row[j], j))[:nprobe]
            for row in K
        ]
        return pd.Series(out)

    return probes


def _ivf_probe_frame(qbase, cents, na2s, nprobe: int):
    """Adds ``cells`` (the per-query probe list, best-first) to the
    frame, preserving every input column — via the unrolled column
    form (≤64 cells, whole-stage codegen) or the Arrow kernel (above
    that, where plan width would dominate); shared by the inline tier
    and both indexed searchers."""
    if len(cents) > 64:
        return qbase.withColumn(
            "cells",
            _ivf_assign_kernel(cents, na2s, nprobe=nprobe)(F.col("qq")),
        )
    return (
        _ivf_cell_keys(qbase, "qq", cents, na2s)
        .withColumn(
            "__probes",
            F.slice(F.reverse(F.array_sort(F.col("__keys"))), 1, nprobe),
        )
        .withColumn(
            "cells",
            F.transform(F.col("__probes"), lambda x: -x["nj"]),
        )
        .drop("__probes", "__keys")
    )


def _ivf_portable_corpus(
    emb: DataFrame, nlist: int, quant: int, vec_col: str, dim: int
) -> DataFrame:
    """``(cid, cq, na2, cell)`` — the assigned corpus shared by
    :func:`ivf_topk_portable` and :func:`save_ivf_topk_index`."""
    cents = _portable_centroids(nlist, dim, quant)
    na2s = [sum(c * c for c in cj) for cj in cents]
    base = emb.select(
        F.col("vec_id").alias("cid"),
        _quantize_vec(F.col(vec_col), quant).alias("cq"),
    )
    if nlist > 64:
        # plan width of the unrolled-column form grows O(nlist);
        # above ~64 cells assignment moves into the Arrow kernel
        # (bit-identical — see _ivf_assign_kernel)
        assigned = base.withColumn(
            "cell", _ivf_assign_kernel(cents, na2s)(F.col("cq"))
        )
    else:
        assigned = (
            _ivf_cell_keys(base, "cq", cents, na2s)
            .withColumn("__best", F.array_max(F.col("__keys")))
            .withColumn("cell", -F.col("__best.nj"))
            .drop("__best", "__keys")
        )
    return assigned.withColumn(
        "na2", _pair_dot_int_udf(F.col("cq"), F.col("cq"))
    )


def ivf_topk_portable(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    quant: int = 1000,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via a FULLY value-checkable IVF plan — the
    driver-gateable twin of the float IVF tier (ivf_topk verifies only
    its exact nlist=1 configuration; this verifies the
    assign→probe→rank structure itself, like lsh_topk_portable does
    for the LSH tier).

    Every stage is engine-exact integer/decimal arithmetic:
    (1) assignment — cell(v) = argmax over md5-derived integer
    centroids of the signed quantized cosine surrogate
    ``sign(dot)·(dot²·10⁶ div |c_j|²)`` (|c_j|² is a compile-time
    literal); computed as a NARROW array expression (array_max over
    (key, -j) structs over one exact-int64 Arrow matmul of the
    centroid dots — no shuffle), ties to the smaller
    cell index; (2) probing — each query keeps its ``nprobe`` best
    cells by the same measure (reverse array_sort + slice, still
    narrow); (3) candidates — probe ⋈ corpus-cell equi-join on the
    cell id, never all-pairs; (4) ranking — the lsh_topk_portable
    DECIMAL(38,0) surrogate with vec_id tie-break. No float enters
    membership or order — bit-identical across engines/partitionings.

    Scale shape: two narrow assignment passes, ONE shuffle on the cell
    key for the candidate join, a per-query window over candidate
    slivers. Unbalanced hot cells follow the same AQE-skew note as the
    float path; production wants trained centroids (ivf_build) — this
    twin trades balance for exact replayability."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    corp = _ivf_portable_corpus(emb, nlist, quant, vec_col, dim)
    # consumed by the cell join AND the ranking tail — persist so the
    # corpus assignment pass (Arrow matmul) runs once (released by
    # release_portable_caches between batches)
    corp = _persist_tracked(corp)
    qbase = queries.select(
        F.col("vec_id").alias("qid"),
        _quantize_vec(F.col(vec_col), quant).alias("qq"),
    )
    # probe list per query (ids only ride the cell join); see the
    # r06 NOTE in lsh_topk_portable for why the inline tiers stay
    # fully distributed while the INDEXED searchers collect the batch
    cents = _portable_centroids(nlist, dim, quant)
    na2s = [sum(c * c for c in cj) for cj in cents]
    qprobe = _ivf_probe_frame(qbase, cents, na2s, nprobe).select(
        "qid", F.explode("cells").alias("cell")
    )
    pairs = (
        qprobe.join(corp.select("cid", "cell"), "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    return _rank_portable_candidates(
        pairs, corp.select("cid", "cq", "na2"), qbase, k
    )


_ANNMETA_CACHE: dict = {}

# un-unpersisted .persist() sites in the inline portable tiers are
# registered here so a long-running session can release them without
# restarting (queries.clear_state calls release_portable_caches) —
# repeated per-batch searches otherwise accumulate cached blocks until
# executor storage evicts them, and eviction re-triggers the full
# lineage
_PORTABLE_PERSISTED: list = []


def _persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PORTABLE_PERSISTED.append(df)
    return df


def release_portable_caches() -> None:
    """Unpersist every frame the inline portable ANN tiers cached
    (corpus signatures, candidate-pair frames). Call between query
    batches in a long-running session — bench/queries wire this into
    ``clear_state``."""
    for df in _PORTABLE_PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass
    _PORTABLE_PERSISTED.clear()


def _annmeta(spark, table: str) -> dict:
    """One driver-side read of ``{table}__annmeta`` per session — the
    searchers run per query batch, and a catalog collect per call is
    pure scheduler latency.

    SINGLE-WRITER-PER-SESSION contract: the cache is invalidated by
    THIS process's builders/appenders only. If another process rebuilds
    the same table on a shared warehouse, call :func:`refresh_annmeta`
    (or the fingerprint check in :func:`rrf_ann_indexed` will surface
    the drift as an error rather than silent wrong matches)."""
    key = (spark.sparkContext.applicationId, table)
    if key not in _ANNMETA_CACHE:
        _ANNMETA_CACHE[key] = (
            spark.table(f"{table}__annmeta").collect()[0].asDict()
        )
    return _ANNMETA_CACHE[key]


def refresh_annmeta(spark, table: str) -> dict:
    """Drop the session's cached ``__annmeta`` row for ``table`` and
    re-read it — the escape hatch for multi-writer warehouses where
    another process rebuilt the index (see :func:`_annmeta`)."""
    _ANNMETA_CACHE.pop(
        (spark.sparkContext.applicationId, table), None
    )
    return _annmeta(spark, table)


def _write_annmeta(spark, table: str, fields: dict) -> None:
    """Persist the index build parameters + corpus fingerprint as the
    one-row ``{table}__annmeta`` companion table. ``n_vecs``/``max_cid``
    fingerprint the corpus so multi-index consumers (rrf_ann_indexed)
    can refuse drifted index pairs instead of silently dropping
    candidates; ``vec_col`` makes appends self-describing."""
    def _sql_type(k: str, v) -> str:
        # type follows the VALUE, not the field name: a new caller
        # adding a large int field (or renaming n_vecs) must not
        # silently truncate to int32. bool before int — it subclasses.
        if isinstance(v, str):
            return "string"
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise TypeError(
                f"annmeta field {k!r}: unsupported type {type(v).__name__}"
                " (expected str, int, or float)"
            )
        if isinstance(v, float):
            return "double"
        return "long"

    schema = ", ".join(f"{k} {_sql_type(k, v)}" for k, v in fields.items())
    spark.createDataFrame([tuple(fields.values())], schema).write.mode(
        "overwrite"
    ).saveAsTable(f"{table}__annmeta")
    _ANNMETA_CACHE.pop(
        (spark.sparkContext.applicationId, table), None
    )


def save_lsh_topk_index(
    emb: DataFrame,
    table: str,
    num_tables: int = 4,
    num_planes: int = 4,
    quant: int = 1000,
    vec_col: str = "embedding",
    dim: int | None = None,
    num_buckets: int = 16,
) -> None:
    """Persist the corpus half of :func:`lsh_topk_portable` — the
    build-once/search-many shape the 100 TB ANN story depends on: the
    corpus is signed ONCE per revision, and every later query batch
    pays only its own (tiny) signature pass plus a bucket join.

    Two catalog tables: ``{table}_vecs`` ``(cid, cq, na2)`` — the
    quantized vectors, stored once — and ``{table}_bands``
    ``(bsig, cid)`` — one narrow row per (table, signature) band,
    BUCKETED by ``bsig`` (= t·2^num_planes + sig, one fused key so the
    band join needs no Exchange on the corpus side). Build parameters
    ride a companion ``{table}__annmeta`` row, so a search job
    validates compatibility driver-side (the LSH-dedup metadata
    pattern, llm/dedup.py:save_lsh_index)."""
    from ..sinks.bucketed import write_bucketed

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    corp = _lsh_sig_frame(
        emb, "cid", "cq", num_tables, num_planes, quant, vec_col, dim
    ).withColumn("na2", _pair_dot_int_udf(F.col("cq"), F.col("cq")))
    corp = corp.persist()
    write_bucketed(
        corp.select("cid", "cq", "na2"),
        f"{table}_vecs",
        bucket_keys="cid",
        num_buckets=num_buckets,
    )
    bands = corp.select(
        "cid", F.posexplode("sigs").alias("t", "sig")
    ).select(
        (F.col("t").cast("long") * (1 << num_planes) + F.col("sig"))
        .alias("bsig"),
        "cid",
    )
    write_bucketed(
        bands, f"{table}_bands", bucket_keys="bsig",
        num_buckets=num_buckets,
    )
    stats = corp.agg(
        F.count(F.lit(1)).alias("n"), F.max("cid").alias("m")
    ).first()
    corp.unpersist()
    spark = emb.sparkSession
    _write_annmeta(
        spark,
        table,
        {
            "num_tables": num_tables,
            "num_planes": num_planes,
            "quant": quant,
            "dim": dim,
            "num_buckets": num_buckets,
            "vec_col": vec_col,
            "n_vecs": int(stats["n"]),
            "max_cid": int(stats["m"]),
        },
    )


def lsh_topk_portable_indexed(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 5,
    vec_col: str | None = None,
) -> DataFrame:
    """Search a :func:`save_lsh_topk_index` index: identical results
    to :func:`lsh_topk_portable` (same signature helper, same rank
    surrogate — one source of truth), but the corpus-side signature
    scan is replaced by a catalog read whose band join arrives
    pre-bucketed on ``bsig``. Per query batch the cost is the batch's
    own signatures + a bucket join + the candidate ranking."""
    meta = _annmeta(spark, table)
    vec_col = vec_col or meta.get("vec_col") or "embedding"
    num_tables, num_planes = meta["num_tables"], meta["num_planes"]
    qry = _lsh_sig_frame(
        queries, "qid", "qq", num_tables, num_planes,
        meta["quant"], vec_col, meta["dim"],
    )
    # bounded-batch fast path (the production retrieval shape): the
    # query signatures are computed in ONE job and re-enter the plan
    # as local frames — otherwise the signature subtree (with its
    # Arrow matmul stage) re-executes under the band join, the
    # dedup, AND the ranking tail, and at small batch sizes those
    # repeated stages dominate wall-clock. The broadcast band join
    # then reads the bucketed corpus table with no Exchange at all.
    qrows = qry.limit(10_001).collect()
    if len(qrows) <= 10_000:
        qe = spark.createDataFrame(
            [
                (t * (1 << num_planes) + int(sig), r.qid)
                for r in qrows
                for t, sig in enumerate(r.sigs)
            ],
            "bsig long, qid long",
        )
        qry = spark.createDataFrame(
            [(r.qid, list(r.qq)) for r in qrows],
            "qid long, qq array<long>",
        )
        qe = F.broadcast(qe)
    else:
        qe = qry.select(
            "qid", F.posexplode("sigs").alias("t", "sig")
        ).select(
            (F.col("t").cast("long") * (1 << num_planes) + F.col("sig"))
            .alias("bsig"),
            "qid",
        )
        qry = qry.select("qid", "qq")
        qrows = None
    bands = spark.table(f"{table}_bands")
    pairs = (
        qe.join(bands, "bsig")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    return _rank_portable_candidates(
        pairs, spark.table(f"{table}_vecs"), qry, k,
        qrows=qrows if qrows and len(qrows) <= 10_000 else None,
    )


def save_ivf_topk_index(
    emb: DataFrame,
    table: str,
    nlist: int = 8,
    quant: int = 1000,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Persist the assigned corpus of :func:`ivf_topk_portable` as a
    catalog table PARTITIONED by ``cell`` — the portable twin of
    :func:`save_ivf_index`: a later search job's probes become
    dynamic partition pruning (the broadcast probe join prunes cell
    partitions), reading ~nprobe/nlist of the files instead of
    rescanning and re-assigning the corpus."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    corp = _ivf_portable_corpus(emb, nlist, quant, vec_col, dim)
    (
        corp.write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(f"{table}_cells")
    )
    spark = emb.sparkSession
    stats = spark.table(f"{table}_cells").agg(
        F.count(F.lit(1)).alias("n"), F.max("cid").alias("m")
    ).first()
    _write_annmeta(
        spark,
        table,
        {
            "nlist": nlist,
            "quant": quant,
            "dim": dim,
            "vec_col": vec_col,
            "n_vecs": int(stats["n"]),
            "max_cid": int(stats["m"]),
        },
    )


def append_lsh_topk_index(emb: DataFrame, table: str) -> None:
    """Incremental corpus growth for a :func:`save_lsh_topk_index`
    index — tonight's new vectors are signed with the INDEX'S OWN
    parameters (read from the metadata table, so batch and index can
    never drift) and appended to both catalog tables with the matching
    bucket spec; searches immediately see the union. The whole corpus
    is never re-signed: this is the ingestion half of
    build-once/search-many (same role as llm/dedup.py's
    incremental_near_dups plays for the dedup index)."""
    from ..sinks.bucketed import write_bucketed

    spark = emb.sparkSession
    meta = _annmeta(spark, f"{table}")
    corp = _lsh_sig_frame(
        emb, "cid", "cq", meta["num_tables"], meta["num_planes"],
        meta["quant"], meta.get("vec_col") or "embedding", meta["dim"],
    ).withColumn("na2", _pair_dot_int_udf(F.col("cq"), F.col("cq")))
    corp = corp.persist()
    nb = int(meta["num_buckets"])
    (
        corp.select("cid", "cq", "na2")
        .write.mode("append")
        .format("parquet")
        .bucketBy(nb, "cid")
        .saveAsTable(f"{table}_vecs")
    )
    bands = corp.select(
        "cid", F.posexplode("sigs").alias("t", "sig")
    ).select(
        (
            F.col("t").cast("long") * (1 << meta["num_planes"])
            + F.col("sig")
        ).alias("bsig"),
        "cid",
    )
    (
        bands.write.mode("append")
        .format("parquet")
        .bucketBy(nb, "bsig")
        .saveAsTable(f"{table}_bands")
    )
    corp.unpersist()
    _refresh_fingerprint(spark, table, meta, f"{table}_vecs")


def append_ivf_topk_index(emb: DataFrame, table: str) -> None:
    """Incremental corpus growth for a :func:`save_ivf_topk_index`
    index: new vectors are assigned with the index's own centroids
    (metadata-driven) and appended into the cell partitions — only the
    touched cell directories gain files, searches see the union
    immediately. The portable counterpart of :func:`ivf_append`."""
    spark = emb.sparkSession
    meta = _annmeta(spark, table)
    corp = _ivf_portable_corpus(
        emb, int(meta["nlist"]), int(meta["quant"]),
        meta.get("vec_col") or "embedding", int(meta["dim"]),
    )
    (
        corp.write.mode("append")
        .partitionBy("cell")
        .saveAsTable(f"{table}_cells")
    )
    _refresh_fingerprint(spark, table, meta, f"{table}_cells")


def _refresh_fingerprint(spark, table: str, meta: dict, vec_table: str):
    """After an append, rewrite ``__annmeta`` with the grown corpus
    fingerprint so rrf_ann_indexed's drift check tracks reality (and
    so another session reading the meta row sees the new count)."""
    stats = spark.table(vec_table).agg(
        F.count(F.lit(1)).alias("n"), F.max("cid").alias("m")
    ).first()
    fields = dict(meta)
    fields.setdefault("vec_col", "embedding")
    fields["n_vecs"] = int(stats["n"])
    fields["max_cid"] = int(stats["m"])
    _write_annmeta(spark, table, fields)


def ivf_topk_portable_indexed(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    vec_col: str | None = None,
) -> DataFrame:
    """Search a :func:`save_ivf_topk_index` index: identical results
    to :func:`ivf_topk_portable` at the same (nlist, nprobe), but
    cell assignment of the corpus happened at build time — the query
    batch pays its own probe ranking, a broadcast cell join that
    prunes the cell partitions, and the candidate ranking."""
    meta = _annmeta(spark, table)
    vec_col = vec_col or meta.get("vec_col") or "embedding"
    qbase = queries.select(
        F.col("vec_id").alias("qid"),
        _quantize_vec(F.col(vec_col), meta["quant"]).alias("qq"),
    )
    # bounded-batch fast path (see lsh_topk_portable_indexed): ONE
    # pass computes quantized queries + probe cells together and both
    # re-enter as local frames, so the probe subtree (with its Arrow
    # matmul stage) never re-executes under the cell join or the
    # ranking tail
    cents = _portable_centroids(meta["nlist"], meta["dim"], meta["quant"])
    na2s = [sum(c * c for c in cj) for cj in cents]
    qp = _ivf_probe_frame(qbase, cents, na2s, nprobe)
    qrows = qp.limit(10_001).collect()
    if len(qrows) <= 10_000:
        qbase = spark.createDataFrame(
            [(r.qid, list(r.qq)) for r in qrows],
            "qid long, qq array<long>",
        )
        qprobe = spark.createDataFrame(
            [(r.qid, int(c)) for r in qrows for c in r.cells],
            "qid long, cell int",
        )
    else:
        qprobe = qp.select(
            "qid", F.explode("cells").alias("cell")
        )
    corp = spark.table(f"{table}_cells")
    pairs = (
        corp.select("cid", "cell")
        .join(F.broadcast(qprobe), "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    return _rank_portable_candidates(
        pairs, corp.select("cid", "cq", "na2"), qbase, k,
        qrows=qrows if len(qrows) <= 10_000 else None,
    )


def _rrf_fused_tail(
    cand: DataFrame, k: int, k0: int, scale: int
) -> DataFrame:
    """Shared rank-and-fuse tail of the fused-plan searchers
    (:func:`rrf_ann_indexed`, :func:`rrf_fuse_portable_inline`):
    per-(tier, query) rank window over the scored candidates, integer
    RRF contributions, per-query fusion aggregate + final window.

    ONE repartition by ``qid`` up front: HashPartitioning(qid) is a
    subset of every downstream clustering key — the (tier, qid) rank
    window, the (qid, cid) fusion aggregate, the (qid) final window —
    so Spark's EnsureRequirements accepts the single exchange for all
    three operators (three exchanges otherwise: measured plan diff,
    r12). Scale shape unchanged: the tail is candidate-set-sized
    (bounded query batch × bucket slivers), and per-qid partitioning
    splits at least as fine as the final per-query window demands.

    Expects ``cand`` with columns (tier, qid, cid, __dot, na2)."""
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cand = (
        cand.repartition("qid")
        .withColumn(
            "__num",
            dec(F.col("__dot")) * dec(F.col("__dot"))
            * F.lit(10**6).cast("decimal(38,0)"),
        )
        .withColumn("__na2", dec(F.col("na2")))
        .withColumn(
            "__key",
            F.when(
                F.col("__dot") >= 0, F.expr("__num div __na2")
            ).otherwise(-F.expr("__num div __na2")),
        )
    )
    wt = Window.partitionBy("tier", "qid").orderBy(
        F.col("__key").desc(), F.col("cid").asc()
    )
    ranked = (
        cand.withColumn("rank", F.row_number().over(wt))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.col("rank").cast("long").alias("rank"))
    )
    contrib = ranked.withColumn(
        "__c", F.expr(f"{int(scale)} div ({int(k0)} + rank)")
    )
    fused = contrib.groupBy(
        F.col("qid").alias("query_id"), F.col("cid").alias("item_id")
    ).agg(
        F.sum("__c").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.min("rank").cast("int").alias("best_rank"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("item_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "item_id", "rrf_score",
            "n_lists", "best_rank",
        )
    )


def rrf_fuse_portable_inline(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 4,
    num_planes: int = 4,
    quant: int = 1000,
    nlist: int = 8,
    nprobe: int = 3,
    k0: int = 60,
    scale: int = 10**9,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The fused single-plan form of ``rrf_fuse([lsh_topk_portable(...),
    ivf_topk_portable(...)])`` — bit-identical results (same surrogate
    keys, same tie-breaks, same integer RRF arithmetic; pytest-pinned),
    built the way :func:`rrf_ann_indexed` fuses the PERSISTED indexes,
    but inline over a corpus frame:

    * ONE corpus pass computes quantized vectors, LSH signatures, IVF
      cell, and |c|² together (one Arrow matmul for the plane dots, the
      narrow JVM cell assignment, one dot kernel for na2) where the
      two-tier composition ran two independent corpus pipelines — the
      r12 plan diff is 38 Exchange / 40 ArrowEvalPython nodes down to
      the indexed searcher's shape;
    * the bounded query batch is signed + probed in ONE subtree and
      collected ONCE (the two-tier composition collects it once per
      tier inside ``_rank_portable_candidates``);
    * both tiers' candidates feed a SINGLE shared scoring pass (one
      per-pair exact-int dot kernel) and the shared
      :func:`_rrf_fused_tail`.

    Above 10k queries it falls back to the two-searcher composition
    (same results, corpus-side work unchanged — the collect-and-
    broadcast query side is the production retrieval shape for bounded
    batches only)."""
    spark = emb.sparkSession
    # route on a CHEAP bounded count of the raw queries frame (r13,
    # ADVICE: the old shape built and collected the full query-side
    # signature+probe subtree and then threw it away on the >10k
    # fallback; a limited count reads no vector columns and stops at
    # 10,001 rows)
    n_q = queries.limit(10_001).count()
    if n_q > 10_000:
        return rrf_fuse(
            [
                lsh_topk_portable(
                    emb, queries, k=k, num_tables=num_tables,
                    num_planes=num_planes, quant=quant, vec_col=vec_col,
                    dim=dim,
                ),
                ivf_topk_portable(
                    emb, queries, k=k, nlist=nlist, nprobe=nprobe,
                    quant=quant, vec_col=vec_col, dim=dim,
                ),
            ],
            k0=k0, k=k, scale=scale,
        )
    if not n_q:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, item_id long, rrf_score long, "
            "n_lists int, best_rank int",
        )
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    cents = _portable_centroids(nlist, dim, quant)
    na2s = [sum(c * c for c in cj) for cj in cents]

    qrows = _ivf_probe_frame(
        _lsh_sig_frame(
            queries, "qid", "qq", num_tables, num_planes, quant,
            vec_col, dim,
        ),
        cents,
        na2s,
        nprobe,
    ).select("qid", "qq", "sigs", "cells").collect()

    # one corpus frame: (cid, cq, sigs, cell, na2) — signatures via the
    # shared _lsh_sig_frame, cell via the same narrow JVM assignment as
    # _ivf_portable_corpus, na2 once (the composition computed it twice)
    corp = _lsh_sig_frame(
        emb, "cid", "cq", num_tables, num_planes, quant, vec_col, dim
    )
    if nlist > 64:
        corp = corp.withColumn(
            "cell", _ivf_assign_kernel(cents, na2s)(F.col("cq"))
        )
    else:
        corp = (
            _ivf_cell_keys(corp, "cq", cents, na2s)
            .withColumn("__best", F.array_max(F.col("__keys")))
            .withColumn("cell", -F.col("__best.nj"))
            .drop("__best", "__keys")
        )
    corp = corp.withColumn(
        "na2", _pair_dot_int_udf(F.col("cq"), F.col("cq"))
    )
    # consumed by both candidate joins AND the scoring join — persist
    # so the corpus pass runs once (released by release_portable_caches)
    corp = _persist_tracked(corp)

    qe = spark.createDataFrame(
        [
            (t * (1 << num_planes) + int(sig), r.qid)
            for r in qrows
            for t, sig in enumerate(r.sigs)
        ],
        "bsig long, qid long",
    )
    qprobe = spark.createDataFrame(
        [(r.qid, int(c)) for r in qrows for c in r.cells],
        "qid long, cell int",
    )
    qry = spark.createDataFrame(
        [(r.qid, list(r.qq)) for r in qrows], "qid long, qq array<long>"
    )
    ce = corp.select(
        "cid", F.posexplode("sigs").alias("t", "sig")
    ).select(
        "cid",
        (F.col("t") * (1 << num_planes) + F.col("sig")).alias("bsig"),
    )
    p_lsh = (
        F.broadcast(qe)
        .join(ce, "bsig")
        .filter(F.col("qid") != F.col("cid"))
        .select(F.lit("lsh").alias("tier"), "qid", "cid")
        .distinct()
    )
    p_ivf = (
        corp.select("cid", "cell")
        .join(F.broadcast(qprobe), "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select(F.lit("ivf").alias("tier"), "qid", "cid")
    )
    cand = (
        p_lsh.unionByName(p_ivf)
        .join(corp.select("cid", "cq", "na2"), "cid")
        .join(F.broadcast(qry), "qid")
        .withColumn("__dot", _pair_dot_int_udf(F.col("qq"), F.col("cq")))
    )
    return _rrf_fused_tail(cand, k, k0, scale)


def rrf_ann_indexed(
    spark,
    lsh_table: str,
    ivf_table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    k0: int = 60,
    scale: int = 10**9,
    vec_col: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion over BOTH persisted portable indexes in
    ONE fused plan — the per-batch search shape a deployed hybrid
    retrieval stack runs: the two tiers' candidate generation (LSH
    band join + IVF cell join) feeds a SINGLE shared scoring pass
    (one vectors read, one exact-int dot kernel, one window) instead
    of two independent search pipelines unioned at the end.
    Bit-identical to ``rrf_fuse([lsh_topk_portable_indexed(...),
    ivf_topk_portable_indexed(...)])`` — same surrogate keys, same
    tie-breaks, same integer RRF arithmetic — so it shares the same
    composed DuckDB oracle.

    Query side: one pass computes quantized vectors, LSH signatures,
    and IVF probe cells together, collected once (bounded batch — the
    production retrieval shape; above 10k queries it falls back to
    the two-searcher composition)."""
    from pyspark.sql import Window

    lm = _annmeta(spark, lsh_table)
    im = _annmeta(spark, ivf_table)
    if lm["quant"] != im["quant"] or lm["dim"] != im["dim"]:
        raise ValueError(
            "rrf_ann_indexed: the LSH and IVF indexes were built with "
            f"different quant/dim ({lm['quant']}/{lm['dim']} vs "
            f"{im['quant']}/{im['dim']}) — their scores would not be "
            "comparable"
        )
    # corpus-drift guard: the fused plan scores BOTH tiers' candidates
    # against {lsh_table}_vecs, so the two indexes must cover the SAME
    # corpus — e.g. an append run against only one of them would
    # otherwise silently drop the other tier's new candidates and
    # break the documented bit-identity with the two-searcher
    # composition. Indexes written before fingerprints existed skip
    # the check (refresh by rebuilding or appending once).
    lfp = (lm.get("n_vecs"), lm.get("max_cid"))
    ifp = (im.get("n_vecs"), im.get("max_cid"))
    if None not in lfp and None not in ifp and lfp != ifp:
        raise ValueError(
            "rrf_ann_indexed: corpus fingerprints differ — LSH index "
            f"has (n_vecs, max_cid)={lfp} but IVF index has {ifp}. "
            "Append the missing batch to the lagging index (append_"
            "lsh_topk_index / append_ivf_topk_index) before fusing."
        )
    vec_col = vec_col or lm.get("vec_col") or "embedding"
    num_planes = lm["num_planes"]
    # cheap bounded count routes the >10k fallback BEFORE the query-side
    # signature+probe subtree is built (r13, ADVICE — see
    # rrf_fuse_portable_inline)
    n_q = queries.limit(10_001).count()
    if n_q > 10_000:
        return rrf_fuse(
            [
                lsh_topk_portable_indexed(
                    spark, lsh_table, queries, k=k, vec_col=vec_col
                ),
                ivf_topk_portable_indexed(
                    spark, ivf_table, queries, k=k, nprobe=nprobe,
                    vec_col=vec_col,
                ),
            ],
            k0=k0, k=k, scale=scale,
        )
    if not n_q:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, item_id long, rrf_score long, "
            "n_lists int, best_rank int",
        )
    cents = _portable_centroids(im["nlist"], im["dim"], im["quant"])
    na2s = [sum(c * c for c in cj) for cj in cents]
    qrows = _ivf_probe_frame(
        _lsh_sig_frame(
            queries, "qid", "qq", lm["num_tables"], num_planes,
            lm["quant"], vec_col, lm["dim"],
        ),
        cents,
        na2s,
        nprobe,
    ).select("qid", "qq", "sigs", "cells").collect()
    qe = spark.createDataFrame(
        [
            (t * (1 << num_planes) + int(sig), r.qid)
            for r in qrows
            for t, sig in enumerate(r.sigs)
        ],
        "bsig long, qid long",
    )
    qprobe = spark.createDataFrame(
        [(r.qid, int(c)) for r in qrows for c in r.cells],
        "qid long, cell int",
    )
    qry = spark.createDataFrame(
        [(r.qid, list(r.qq)) for r in qrows], "qid long, qq array<long>"
    )
    p_lsh = (
        F.broadcast(qe)
        .join(spark.table(f"{lsh_table}_bands"), "bsig")
        .filter(F.col("qid") != F.col("cid"))
        .select(F.lit("lsh").alias("tier"), "qid", "cid")
        .distinct()
    )
    p_ivf = (
        spark.table(f"{ivf_table}_cells")
        .select("cid", "cell")
        .join(F.broadcast(qprobe), "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select(F.lit("ivf").alias("tier"), "qid", "cid")
    )
    # one shared scoring pass: vectors read once (the two indexes carry
    # the same quantization, so either vecs copy serves both tiers)
    cand = (
        p_lsh.unionByName(p_ivf)
        .join(spark.table(f"{lsh_table}_vecs"), "cid")
        .join(F.broadcast(qry), "qid")
        .withColumn("__dot", _pair_dot_int_udf(F.col("qq"), F.col("cq")))
    )
    return _rrf_fused_tail(cand, k, k0, scale)


def cell_balance(
    emb: DataFrame,
    nlist: int = 8,
    quant: int = 1000,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space balance monitor: one row per portable-IVF cell
    with its vector count and integer-ppm share of the corpus — the
    cluster-balance report a curation pipeline watches before trusting
    cell-partitioned work (SemDeDup per-cell dedup, IVF probe cost,
    skewed semantic regions of a crawl). A hot cell here predicts a
    hot partition everywhere downstream that keys on the cell.

    Same md5-derived centroids and exact-integer assignment as
    :func:`ivf_topk_portable` (shared `_ivf_portable_corpus`), so the
    whole report replays in DuckDB. One narrow assignment pass + one
    cell-keyed aggregate; the 1-row total broadcasts back."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    corp = _ivf_portable_corpus(emb, nlist, quant, vec_col, dim)
    cells = corp.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    total = cells.agg(F.sum("n_vectors").alias("__t"))
    return (
        cells.join(F.broadcast(total))
        .select(
            "cell",
            "n_vectors",
            F.expr(
                "CAST((n_vectors * CAST(1000000 AS BIGINT)) div __t"
                " AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def oracle_cell_balance(
    nlist: int = 8,
    quant: int = 1000,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of :func:`cell_balance` — same md5-derived
    centroid literals and HUGEINT assignment surrogate as
    :func:`oracle_ivf_topk_portable` (constants from the shared
    `_portable_centroids`, so the two oracles cannot drift)."""
    cents = _portable_centroids(nlist, dim, quant)
    cent_rows = ", ".join(
        f"({j}, [{', '.join(str(x) for x in cj)}], "
        f"{sum(x * x for x in cj)})"
        for j, cj in enumerate(cents)
    )
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
    FROM {table}
),
cents(j, c, cna2) AS (VALUES {cent_rows}),
akeys AS (
    SELECT q.vec_id, ct.j,
           list_sum(list_transform(range(1, {dim} + 1),
               i -> q.qv[i] * ct.c[i])) AS dot,
           ct.cna2
    FROM q CROSS JOIN cents ct
),
akeyed AS (
    SELECT vec_id, j,
           CASE WHEN dot >= 0
                THEN (CAST(dot AS HUGEINT) * dot * 1000000) // cna2
                ELSE -((CAST(dot AS HUGEINT) * dot * 1000000) // cna2)
           END AS key
    FROM akeys
),
aranked AS (
    SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY key DESC, j ASC) AS r
    FROM akeyed
),
assigned AS (SELECT vec_id, j AS cell FROM aranked WHERE r = 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM assigned)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(*) * 1000000 // MAX(t) AS BIGINT) AS share_ppm
FROM assigned CROSS JOIN tot GROUP BY cell
"""


def oracle_ivf_topk_portable(
    corpus_pred: str,
    query_pred: str,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    quant: int = 1000,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ``ivf_topk_portable`` — same md5-derived
    integer centroids (embedded as literal lists with precomputed
    |c|²), same assignment/probe ranking (window instead of array
    argmax — different mechanism, identical result incl. tie-breaks),
    same HUGEINT rank surrogate."""
    cents = _portable_centroids(nlist, dim, quant)
    cent_rows = ", ".join(
        f"({j}, [{', '.join(str(x) for x in cj)}], "
        f"{sum(x * x for x in cj)})"
        for j, cj in enumerate(cents)
    )
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
    FROM {table}
),
cents(j, c, cna2) AS (VALUES {cent_rows}),
akeys AS (
    SELECT q.vec_id, ct.j,
           list_sum(list_transform(range(1, {dim} + 1),
               i -> q.qv[i] * ct.c[i])) AS dot,
           ct.cna2
    FROM q CROSS JOIN cents ct
),
akeyed AS (
    SELECT vec_id, j,
           CASE WHEN dot >= 0
                THEN (CAST(dot AS HUGEINT) * dot * 1000000) // cna2
                ELSE -((CAST(dot AS HUGEINT) * dot * 1000000) // cna2)
           END AS key
    FROM akeys
),
aranked AS (
    SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY key DESC, j ASC) AS r
    FROM akeyed
),
corpus AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE {corpus_pred}),
queries AS (SELECT vec_id AS qid, qv AS qq FROM q WHERE {query_pred}),
corpus_cells AS (
    SELECT co.cid, a.j AS cell FROM corpus co
    JOIN aranked a ON a.vec_id = co.cid AND a.r = 1
),
query_probes AS (
    SELECT qy.qid, a.j AS cell FROM queries qy
    JOIN aranked a ON a.vec_id = qy.qid AND a.r <= {nprobe}
),
cand AS (
    SELECT qp.qid, cc.cid
    FROM query_probes qp JOIN corpus_cells cc USING (cell)
    WHERE qp.qid != cc.cid
),
scored AS (
    SELECT c.qid, c.cid,
           list_sum(list_transform(range(1, {dim} + 1),
               i -> qy.qq[i] * co.cq[i])) AS dot,
           list_sum(list_transform(co.cq, x -> x * x)) AS na2
    FROM cand c JOIN queries qy ON qy.qid = c.qid
    JOIN corpus co ON co.cid = c.cid
),
keyed AS (
    SELECT qid, cid, dot,
           CASE WHEN dot >= 0
                THEN (CAST(dot AS HUGEINT) * dot * 1000000) // na2
                ELSE -((CAST(dot AS HUGEINT) * dot * 1000000) // na2)
           END AS key
    FROM scored
),
ranked AS (
    SELECT qid, cid, dot,
           ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY key DESC, cid ASC) AS rank
    FROM keyed
)
SELECT qid AS query_id, rank, cid AS neighbor_id,
       CAST(dot AS BIGINT) AS dot_q
FROM ranked WHERE rank <= {k}
ORDER BY 1, 2
"""


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k0: int = 60,
    k: int = 5,
    item_col: str = "neighbor_id",
    scale: int = 10**9,
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval lists (Cormack et al., SIGIR
    2009): score(item) = Σ_lists 1/(k0 + rank). The standard ensemble
    for hybrid retrieval — lexical BM25 ∪ vector ANN, or multiple ANN
    indexes whose candidate sets miss different neighbors — because it
    needs only RANKS, never the incomparable raw scores.

    Integer-exact: each contribution is ``scale div (k0 + rank)``
    (integral division — exact on any engine, so the fused order is
    bit-stable and driver-hashable), summed per (query_id, item).
    Ties break on the item id. Inputs need (query_id, rank,
    ``item_col``); extra columns are ignored.

    Scale shape: a union of |queries|·k-row frames, one hash aggregate
    on (query_id, item), a per-query window over ≤ lists·k rows — the
    fusion itself is query-set-sized, never corpus-sized; all the
    heavy lifting stays in the underlying retrievals."""
    if not ranked_lists:
        raise ValueError("rrf_fuse: no input lists")
    parts = [
        df.select(
            "query_id",
            F.col(item_col).alias("item_id"),
            F.col("rank").cast("long").alias("rank"),
        )
        for df in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = u.withColumn(
        "__c", F.expr(f"{int(scale)} div ({int(k0)} + rank)")
    )
    fused = contrib.groupBy("query_id", "item_id").agg(
        F.sum("__c").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.min("rank").cast("int").alias("best_rank"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("item_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "item_id", "rrf_score",
            "n_lists", "best_rank",
        )
    )


def oracle_rrf_fuse(
    list_sqls: list[str],
    k0: int = 60,
    k: int = 5,
    scale: int = 10**9,
) -> str:
    """DuckDB replay of :func:`rrf_fuse` over already-oracled retrieval
    SQLs (each must yield (query_id, rank, neighbor_id, ...)) — the
    composed-oracle pattern: the fusion gate reuses the underlying
    tiers' replay verbatim, so one source of truth per tier."""
    unions = " UNION ALL ".join(
        f"SELECT query_id, neighbor_id AS item_id, "
        f"CAST(rank AS BIGINT) AS rank FROM ({sql.rstrip().rstrip(';')})"
        for sql in list_sqls
    )
    return f"""
WITH u AS ({unions}),
fused AS (
    SELECT query_id, item_id,
           CAST(SUM({int(scale)} // ({int(k0)} + rank))
                AS BIGINT) AS rrf_score,
           CAST(COUNT(*) AS INT) AS n_lists,
           CAST(MIN(rank) AS INT) AS best_rank
    FROM u GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY rrf_score DESC, item_id ASC) AS rank
    FROM fused
)
SELECT query_id, CAST(rank AS INT) AS rank, item_id, rrf_score,
       n_lists, best_rank
FROM ranked WHERE rank <= {k}
ORDER BY 1, 2
"""
