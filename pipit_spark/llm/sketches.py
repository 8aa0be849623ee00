"""Count-min sketch over corpus token frequencies (Cormode &
Muthukrishnan 2005) — the bounded-memory frequency monitor for 100 TB
streams/corpora, joining the engine's sketch family (Bloom pre-filter:
``operators/bloom.py``; K-minimum-values: ``llm/dedup.py:kmv_sketch``).

Design rules shared with those two:

* **Portable integer hashing** — cell ``j`` of row ``i`` for token
  ``t`` is ``int(md5('{i}:' || t)[:8], 16) % width``: identical in
  Spark (``conv(substring(md5(..),1,8),16,10)``) and DuckDB
  (``('0x' || substr(md5(..),1,8))::BIGINT``), so the sketch — and
  every estimate read from it — is bit-identical across engines and
  partitionings (no float, no seed state).
* **Bounded, mergeable state** — the sketch is ``depth × width``
  BIGINT cells regardless of corpus size; sketches of shards/streams
  merge by cell-wise SUM (``merge_cms``), so ingestion parallelizes
  without coordination and daily sketches roll up into monthly ones.
* **One scan** — tokens explode once, each contributing ``depth``
  cell increments that map-side combine before the single
  ``(row, col)`` exchange; wire volume is min(corpus tokens,
  depth·width) per partition.

The estimate is the classic min-over-rows upper bound: never below
the true count, overshoots by at most ``ε·N`` with probability
``1−δ`` at ``width = e/ε``, ``depth = ln(1/δ)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _tokens


def _cell(i: int, tok_col, width: int):
    """Row-``i`` cell index for a token column — portable md5-derived
    integer (see module docstring)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), tok_col)), 1, 8),
            16,
            10,
        )
        .cast("long")
        % width
    )


def cms_build(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` cells, at most
    ``depth × width`` rows. Token occurrences COUNT multiplicity
    (frequency sketch, not a distinct sketch)."""
    toks = docs.select(
        F.explode(
            F.filter(
                _tokens(F.coalesce(F.col(text_col), F.lit(""))),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok")
    )
    cells = toks.select(
        F.posexplode(
            F.array(*[_cell(i, F.col("tok"), width) for i in range(depth)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def merge_cms(sketches: DataFrame) -> DataFrame:
    """Cell-wise SUM merge of sketches built with the same
    (width, depth) — union the cell frames in, one merged sketch
    out. Exactly equals the sketch of the concatenated corpora."""
    return sketches.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame, tokens: DataFrame, width: int, depth: int
) -> DataFrame:
    """Point-query the sketch for each row of ``tokens`` (column
    ``tok``): ``est = min over rows of cnt[row][cell(row, tok)]``,
    missing cells read as 0. The probe is |tokens|·depth rows joined
    against the bounded cell table — broadcast-sized by
    construction."""
    probes = tokens.select("tok").distinct()
    probes = probes.select(
        "tok",
        F.posexplode(
            F.array(*[_cell(i, F.col("tok"), width) for i in range(depth)])
        ).alias("row", "col"),
    )
    joined = probes.join(F.broadcast(cms), ["row", "col"], "left").select(
        "tok", F.coalesce(F.col("cnt"), F.lit(0)).alias("c")
    )
    return joined.groupBy("tok").agg(F.min("c").alias("est"))


def _sql_cell(i: int, tok_expr: str, width: int) -> str:
    return (
        f"(('0x' || substr(md5('{i}:' || {tok_expr}), 1, 8))::BIGINT "
        f"% {width})"
    )


def oracle_cms_estimates(
    probe_tokens: list[str],
    table: str = "documents",
    width: int = 1024,
    depth: int = 4,
) -> str:
    """DuckDB replay: build the same cells, read the same minima for a
    literal probe list."""
    from .text import _sql_norm

    norm = _sql_norm("text")
    rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {_sql_cell(i, 'tok', width)} AS col "
        f"FROM toks" for i in range(depth)
    )
    probe_vals = ", ".join(
        "('" + t.replace("'", "''") + "')" for t in probe_tokens
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT tok, {i} AS row, {_sql_cell(i, 'tok', width)} AS col "
        f"FROM probes" for i in range(depth)
    )
    return f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split({norm}, ' '),
                              t -> length(t) > 0)) AS tok
    FROM {table}
),
cells AS (
    SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ({rows}) GROUP BY row, col
),
probes AS (SELECT * FROM (VALUES {probe_vals}) AS t(tok)),
pc AS ({probe_cells})
SELECT pc.tok,
       CAST(MIN(COALESCE(cells.cnt, 0)) AS BIGINT) AS est
FROM pc LEFT JOIN cells USING (row, col)
GROUP BY pc.tok
"""


# ---------------------------------------- mergeable quantile summaries
def quantile_sketch(
    docs: DataFrame,
    pct: int = 20,
    group_col: str = "source",
) -> DataFrame:
    """Mergeable quantile summary — the third member of the sketch
    family (KMV → distinct counts, CMS → frequencies, this → value
    distributions): a DETERMINISTIC md5-keyed sample of per-document
    token lengths, ``(grp, doc_id, n_tokens)``.

    Mergeability is exact and trivial: md5 membership is a property of
    the doc alone, so the sample of a union IS the union of samples —
    shard, snapshot, or revision sketches concatenate with
    :func:`merge_quantile_sketches` and quantiles of the merged sketch
    equal quantiles of a sketch built on the whole corpus,
    bit-for-bit (pytest-pinned). Sketch size is pct% of corpus ROWS
    but only ~24 bytes each — at 10¹¹ docs a 2% sketch is ~50 GB,
    queryable on a laptop-scale cluster while the corpus stays cold.

    Same md5-prefix threshold convention as sampling.sample_corpus and
    the same NULL-text coalesce as text.length_percentiles (their
    docstrings carry the engine-portability rationale)."""
    thr = format(int(0xFFFF * pct / 100), "04x")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return docs.filter(bucket < thr).select(
        F.col(group_col).alias("grp"),
        "doc_id",
        F.size(
            F.filter(
                _tokens(F.coalesce(F.col("text"), F.lit(""))),
                lambda t: F.length(t) > 0,
            )
        ).cast("long").alias("n_tokens"),
    )


def merge_quantile_sketches(*sketches: DataFrame) -> DataFrame:
    """Union-merge (disjoint doc sets by contract — shards, snapshots,
    incremental revisions)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out


def sketch_quantiles(sketch: DataFrame) -> DataFrame:
    """Exact rank-selection quantiles OF THE SKETCH per group
    (p25/p50/p75/p95 + sampled-row count) — engine-portable for the
    same reason as text.length_percentiles: both engines pick the
    concrete element at ``rank = floor(p·(n−1)) + 1`` of the
    (n_tokens, doc_id) total order."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("n_tokens", "doc_id")
    ranked = sketch.withColumn(
        "rk", F.row_number().over(w)
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    sel = [
        F.max(
            F.when(
                F.col("rk")
                == F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1,
                F.col("n_tokens"),
            )
        ).cast("long").alias(f"p{int(p * 100)}")
        for p in (0.25, 0.5, 0.75, 0.95)
    ]
    return ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"), *sel
    )


def oracle_sketch_quantiles(
    table: str = "documents", pct: int = 20, group_col: str = "source"
) -> str:
    """DuckDB replay of quantile_sketch → sketch_quantiles: same
    md5-prefix sample membership, same rank selection."""
    from .text import _sql_norm

    thr = format(int(0xFFFF * pct / 100), "04x")
    norm = _sql_norm("COALESCE(text, '')")
    cols = ", ".join(
        f"CAST(MAX(CASE WHEN rk = CAST(FLOOR({p} * (n - 1)) AS BIGINT) + 1 "
        f"THEN n_tokens END) AS BIGINT) AS p{int(p * 100)}"
        for p in (0.25, 0.5, 0.75, 0.95)
    )
    return f"""
WITH sk AS (
    SELECT {group_col} AS grp, doc_id,
           CAST(len(list_filter(string_split({norm}, ' '),
                t -> length(t) > 0)) AS BIGINT) AS n_tokens
    FROM {table}
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thr}'
),
ranked AS (
    SELECT grp, doc_id, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY grp
                              ORDER BY n_tokens, doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY grp) AS n
    FROM sk
)
SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_sampled, {cols}
FROM ranked GROUP BY 1
"""


# --------------------------------------------------------------------- #
# KLL quantile sketch — the sublinear tier beside the exact sample
# --------------------------------------------------------------------- #
def kll_token_sketch(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Per-group KLL sketch of the per-document token-length
    distribution (Karnin, Lang & Liberty, "Optimal Quantile
    Approximation in Streams", FOCS 2016) — the KB-sized mergeable
    answer to what :func:`quantile_sketch` does with an exact sample:
    the sample's state is pct% of corpus ROWS (~50 GB at 10^11 docs by
    its own accounting), while a KLL sketch at k=200 is a few KB per
    group REGARDLESS of corpus size, with ~1.65% one-sided rank error.

    Built on Spark's native DataSketches aggregate
    (``kll_sketch_agg_bigint`` — same route as vocab_sketches' HLL
    tier, llm/text.py): one scan, map-side partial sketches, one
    group-key exchange carrying KB blobs. Shard/day sketches roll up
    with :func:`kll_merge` and read out with :func:`kll_quantiles`.

    Not DuckDB-replayable (the binary sketch format is
    library-internal), so this tier is pytest-verified (merge ≡
    whole-corpus within rank error) while the exact sample tier keeps
    the driver's value-hash gate — the same split the HLL vocab
    sketches use."""
    n_tokens = F.size(
        F.filter(
            _tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")
    return docs.select(
        F.col(group_col).alias("grp"), n_tokens.alias("n_tokens")
    ).groupBy("grp").agg(
        F.kll_sketch_agg_bigint("n_tokens", F.lit(k)).alias("sketch")
    )


def kll_merge(*sketches: DataFrame, k: int = 200) -> DataFrame:
    """Merge per-group KLL sketches from shards/snapshots: union the
    (grp, sketch) frames and reduce per group with the library's
    binary-merge aggregate. Associative and commutative — daily
    sketches roll into monthly ones without touching the corpus."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp").agg(
        F.kll_merge_agg_bigint("sketch", F.lit(k)).alias("sketch")
    )


def kll_quantiles(
    sketch: DataFrame,
    quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Read quantile estimates out of a (grp, sketch) frame:
    ``(grp, n, p25, p50, p75, p95)`` — same report shape as
    :func:`sketch_quantiles` so dashboards can swap tiers."""
    cols = [
        F.kll_sketch_get_quantile_bigint("sketch", F.lit(float(p)))
        .cast("long")
        .alias(f"p{int(p * 100)}")
        for p in quantiles
    ]
    return sketch.select(
        "grp",
        F.kll_sketch_get_n_bigint("sketch").cast("long").alias("n"),
        *cols,
    )


def kll_rank_check(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 200,
    quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
    eps_pct: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic accuracy contract for the KLL tier: for every
    group and quantile ``p``, assert the sketch's estimate lies
    between the EXACT corpus values at ranks ``(p − ε)·n`` and
    ``(p + ε)·n`` — the value-bracket form of KLL's normalized rank
    error guarantee (Karnin/Lang/Liberty 2016: ~1.65 % at k=200;
    ``eps_pct=5`` is a 3× safety factor so the check never flakes on
    compaction randomness).

    Output ``(grp, q_pct, n, within_bound)``: ``n`` is the sketch's
    exact stream length (== group row count) and ``within_bound`` the
    bracket verdict — both deterministic even though the raw estimate
    is not (KLL compaction draws random offsets once a group outgrows
    exact mode). All rank arithmetic is INTEGER (``floor``/``ceil``
    on ``q·n/100`` with q, ε in whole percent) — no float rank ever
    compares across engines.

    Scale shape: the exact bracket values come from one window rank
    over ``(grp, n_tokens)`` joined to the per-group sketch reads on
    the group key — one shuffle each, both keyed by ``grp``. This is
    a VERIFICATION operator (run on samples/QA slices); the
    production read path is :func:`kll_quantiles` alone, whose state
    is KB per group.
    """
    n_tokens = F.size(
        F.filter(
            _tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")
    vals = docs.select(
        F.col(group_col).alias("grp"), n_tokens.alias("n_tokens")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("n_tokens")
    ranked = vals.withColumn("rk", F.row_number().over(w))

    est = kll_quantiles(
        kll_token_sketch(docs, group_col=group_col, k=k, text_col=text_col),
        quantiles=quantiles,
    )
    # long form: (grp, q_pct, n, est)
    pairs = est.select(
        "grp",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(p * 100)).alias("q_pct"),
                        F.col(f"p{int(p * 100)}").alias("est"),
                    )
                    for p in quantiles
                ]
            )
        ).alias("qe"),
    ).select("grp", "n", F.col("qe.q_pct").alias("q_pct"), F.col("qe.est").alias("est"))
    lo = F.greatest(
        F.lit(1).cast("long"),
        F.floor((F.col("q_pct") - F.lit(eps_pct)) * F.col("n") / 100),
    )
    hi = F.least(
        F.col("n"),
        F.ceil((F.col("q_pct") + F.lit(eps_pct)) * F.col("n") / 100) + 1,
    )
    bounded = pairs.withColumn("rk_lo", lo).withColumn("rk_hi", hi)
    j = bounded.join(
        ranked,
        (bounded.grp == ranked.grp)
        & ((ranked.rk == bounded.rk_lo) | (ranked.rk == bounded.rk_hi)),
    ).select(
        bounded.grp, "q_pct", "n", "est", "rk", "rk_lo", "n_tokens"
    )
    return (
        j.groupBy("grp", "q_pct", "n", "est")
        .agg(
            F.min(F.when(F.col("rk") == F.col("rk_lo"), F.col("n_tokens")))
            .alias("v_lo"),
            F.max(F.col("n_tokens")).alias("v_hi"),
        )
        .select(
            "grp",
            F.col("q_pct").cast("int").alias("q_pct"),
            F.col("n").cast("long").alias("n"),
            (
                (F.col("v_lo") <= F.col("est"))
                & (F.col("est") <= F.col("v_hi"))
            ).alias("within_bound"),
        )
    )


def oracle_kll_rank_check(
    table: str = "documents",
    group_col: str = "source",
    quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
) -> str:
    """DuckDB twin of :func:`kll_rank_check`'s CONTRACT: the exact
    per-group stream length and an all-TRUE bound column. The sketch
    bytes are library-internal (not SQL-replayable); what the driver
    hash pins is (a) n per group — exact SQL — and (b) that every
    bracket verdict is TRUE: a KLL regression past 3× its documented
    rank error flips a boolean and breaks the hash."""
    vals = ", ".join(f"({int(p * 100)})" for p in quantiles)
    return f"""
SELECT {group_col} AS grp, CAST(q.q_pct AS INTEGER) AS q_pct,
       CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_bound
FROM {table}, (VALUES {vals}) AS q(q_pct)
GROUP BY 1, 2
"""
