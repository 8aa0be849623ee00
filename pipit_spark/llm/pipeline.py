"""Composed training-data cleaning pipeline.

The north-star use case: take a raw document corpus and produce the
cleaned training set — language filter, quality filter, exact dedup —
as ONE lazy DataFrame plan. The per-document features (token count,
quality score, predicted language, content fingerprint) are all narrow
expressions over the text, so instead of joining the per-operator
outputs (:func:`text_stats` ⋈ :func:`lang_id` ⋈ fingerprints — three
shuffles of doc_id-keyed rows), the pipeline evaluates the SAME
expressions (:func:`stats_exprs`, :func:`pred_lang_expr`,
:func:`fingerprint_expr` — shared with the standalone operators, so
they cannot drift) in a single projection.

At 100 TB the plan is: one text scan → whole-stage-codegen feature
projection + filters → one shuffle of the survivors' ``(doc_id,
fingerprint, 2 numerics)`` rows for the keep-first window. Document
bodies never cross the wire, and the dedup state is bounded by the
survivor count, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import (
    fingerprint_expr,
    oracle_doc_fingerprint,
    oracle_lang_id,
    oracle_text_stats,
    pred_lang_expr,
    stats_exprs,
)


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """Cleaned corpus: predicted-``lang`` documents inside the token
    window with quality ≥ ``min_quality``, exact-deduped keep-first
    (min ``doc_id`` per normalized-text fingerprint *within the
    surviving set* — dedup runs after the filters, the cheap order).

    Returns ``(doc_id, n_tokens, quality_score)`` for the survivors.
    """
    se = stats_exprs()
    keep = docs.select(
        "doc_id",
        se["n_tokens"].alias("n_tokens"),
        se["quality_score"].alias("quality_score"),
        pred_lang_expr().alias("pred_lang"),
        fingerprint_expr().alias("fingerprint"),
    ).filter(
        (F.col("pred_lang") == lang)
        & F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("quality_score") >= min_quality)
    )
    # keep-first as ONE aggregation, not a fingerprint window: an
    # aggregate combines hot keys map-side, while a window needs every
    # row of a group in one task — with real-corpus boilerplate
    # (millions of identical docs sharing a fingerprint) the window
    # form funnels the whole hot group through a single task at 100 TB.
    #
    # r13 (guide §2.1, §5): the min_by(struct, doc_id) form planned as
    # a SortAggregate (struct buffers are not UnsafeRow-mutable, and
    # declarative aggregates can't use ObjectHashAggregate) — a
    # per-task sort by fingerprint before the partial aggregate. The
    # winner row is instead packed into ONE order-preserving
    # decimal(38,0) atom, whose min IS a HashAggregate:
    #
    #   atom = doc_id · 2²⁰ + round(quality · 10⁶)
    #
    # * ordering: quality_score is round(q, 6) with q ∈ [0, 1] (both
    #   factors of the score are in [0, 1] by construction), so the
    #   micro-quality term is an exact integer in [0, 10⁶] ⊂ [0, 2²⁰)
    #   — the atom orders lexicographically by (doc_id, ·), and doc_id
    #   is unique, so min(atom) is exactly min_by doc_id;
    # * decode is bit-exact: pmod recovers the integer micro-quality
    #   (exact in decimal arithmetic), and qmil/10⁶ in double is the
    #   correctly-rounded quotient — the same double round(q, 6)
    #   produced (pytest-pinned bit-equality against the min_by form);
    # * n_tokens needs no packing: equal fingerprints ⟹ equal
    #   lowercased normalized text ⟹ identical whitespace structure ⟹
    #   identical token count, so min(n_tokens) is the winner's value.
    atom = F.col("doc_id").cast("decimal(38,0)") * F.lit(
        1 << 20
    ) + F.round(F.col("quality_score") * F.lit(1000000.0), 0).cast(
        "decimal(38,0)"
    )
    won = keep.groupBy("fingerprint").agg(
        F.min(atom).alias("__atom"),
        F.min("n_tokens").alias("n_tokens"),
    )
    qmil = F.pmod(F.col("__atom"), F.lit(1 << 20))
    return won.select(
        ((F.col("__atom") - qmil) / F.lit(1 << 20))
        .cast("long")
        .alias("doc_id"),
        "n_tokens",
        (qmil.cast("double") / F.lit(1000000.0)).alias("quality_score"),
    )


def _cleaned_survivors(
    docs: DataFrame,
    eval_docs: DataFrame,
    lang: str,
    min_tokens: int,
    max_tokens: int,
    min_quality: float,
    ngram: int,
):
    """Shared clean → decontaminate prologue of the training-set
    pipelines: returns ``(clean, survivors_text, contaminated)`` so the
    v1 (pack docs) and v2 (chunk-then-pack) tails cannot drift in their
    filtering semantics.

    ``contaminated`` is computed over the FULL corpus, not the cleaned
    survivors (r12, guide §1.2/§2.4): both consumers anti-join it
    against a survivor-restricted set (``clean`` in v1,
    ``survivors_text`` in v2), so contaminated non-survivors are
    absorbed by the anti-join and the final rows are identical —
    pytest-pinned and oracle-checked. The old form shingled
    ``docs ⋉ clean``, which re-evaluated the whole ``clean`` aggregation
    (Spark does not share subtrees) and re-scanned the corpus text for
    the semi join; this form shingles one raw corpus scan (the
    decontaminate side is a broadcast semi join, so no shuffle either
    way). Measured (tools/ab_query.py, sf0.1, 5 steady reps): median
    2.84 s → 2.28 s; corpus text scans 3 → 2, the duplicated
    clean_corpus aggregation disappears from the plan."""
    from .dedup import decontaminate

    clean = clean_corpus(
        docs, lang=lang, min_tokens=min_tokens, max_tokens=max_tokens,
        min_quality=min_quality,
    )
    survivors_text = docs.join(clean.select("doc_id"), "doc_id", "left_semi")
    contaminated = decontaminate(docs, eval_docs, n=ngram).select(
        "doc_id"
    )
    return clean, survivors_text, contaminated


def prepare_training_set(
    docs: DataFrame,
    eval_docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    ngram: int = 5,
    context_len: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """Raw corpus → packed training set, one lazy plan: clean
    (:func:`clean_corpus`), drop documents contaminated against
    ``eval_docs`` (:func:`~pipit_spark.llm.dedup.decontaminate` — a
    broadcast semi join, eval sets are small), then pack the survivors
    into ``context_len``-token windows
    (:func:`~pipit_spark.llm.sampling.pack_sequences`, reusing the
    cleaning stage's token counts instead of re-tokenizing).

    Returns per-pack stats ``(shard, pack_in_shard, n_docs,
    total_tokens)``."""
    from .sampling import pack_sequences

    clean, _, contaminated = _cleaned_survivors(
        docs, eval_docs, lang, min_tokens, max_tokens, min_quality, ngram
    )
    final = clean.join(contaminated, "doc_id", "left_anti")
    return pack_sequences(
        final,
        context_len=context_len,
        n_shards=n_shards,
        tokens_col="n_tokens",
    )


def oracle_clean_corpus(
    table: str = "documents",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> str:
    """DuckDB twin of :func:`clean_corpus`, composed from the same
    per-stage oracles so any drift in a stage shows up here too."""
    return f"""
WITH stats AS ({oracle_text_stats(table)}),
langs AS ({oracle_lang_id(table)}),
fp AS ({oracle_doc_fingerprint(table)}),
keep AS (
    SELECT s.doc_id, s.n_tokens, s.quality_score
    FROM stats s JOIN langs l USING (doc_id)
    WHERE l.pred_lang = '{lang}'
      AND s.n_tokens BETWEEN {min_tokens} AND {max_tokens}
      AND s.quality_score >= {min_quality}
),
kfp AS (SELECT k.*, f.fingerprint FROM keep k JOIN fp f USING (doc_id)),
reps AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM kfp GROUP BY fingerprint)
SELECT k.doc_id, k.n_tokens, k.quality_score
FROM kfp k JOIN reps r ON k.fingerprint = r.fingerprint AND k.doc_id = r.doc_id
"""


def oracle_prepare_training_set(
    table: str = "documents",
    eval_pred: str = "doc_id < 25",
    corpus_pred: str = "doc_id >= 25",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    ngram: int = 5,
    context_len: int = 512,
    n_shards: int = 16,
) -> str:
    """DuckDB twin of :func:`prepare_training_set` over a corpus/eval
    split of ``table``, composed from the stage oracles."""
    from .dedup import _sql_shingles

    return f"""
WITH corpus AS (SELECT * FROM {table} WHERE {corpus_pred}),
clean AS ({oracle_clean_corpus("corpus", lang, min_tokens, max_tokens, min_quality)}),
ev AS (
    SELECT DISTINCT unnest({_sql_shingles(ngram)}) AS shingle
    FROM {table} WHERE {eval_pred}
),
corp_sh AS (
    SELECT d.doc_id, unnest({_sql_shingles(ngram)}) AS shingle
    FROM corpus d JOIN clean c USING (doc_id)
),
cont AS (SELECT DISTINCT doc_id FROM corp_sh
         WHERE shingle IN (SELECT shingle FROM ev)),
final AS (SELECT * FROM clean
          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
packed AS (
    SELECT doc_id % {n_shards} AS shard, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY doc_id % {n_shards}
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {context_len}) AS BIGINT) AS pack_in_shard
    FROM final
)
SELECT shard, pack_in_shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY shard, pack_in_shard
"""


def incremental_new_docs(
    docs: DataFrame,
    seen_fingerprints: DataFrame,
    method: str = "exact",
    bloom_bits: int | None = None,
    bloom_hashes: int | None = None,
    bloom=None,
) -> DataFrame:
    """Incremental ingestion: of an incoming batch, keep only documents
    whose content fingerprint is NEW — not in the already-processed set
    and not duplicated earlier in the batch itself (min doc_id wins,
    as in :func:`clean_corpus`).

    Shape: one narrow fingerprint projection over the batch, a
    keep-first window on the batch's own fingerprints, then an
    anti-join against the seen-set. The seen-set side carries ONLY the
    fingerprint column (32-byte md5 hex), so at 100 TB it is a compact
    shuffle or — for daily increments against a bounded seen-set — a
    broadcast; document bodies never join anything.

    ``method="bloom"`` adds an exactness-preserving pre-filter: the
    seen-set folds into a Bloom bitmap (``operators.bloom``, one compact
    bit_or aggregation) that the batch probes map-side. Rows the filter
    rejects are DEFINITELY new (Bloom has no false negatives) and skip
    the join entirely; only the might-contain sliver — true dups plus
    the ≈``(1-e^(-kn/m))^k`` false-positive tail — reaches the exact
    anti-join. Same result set as ``method="exact"`` by construction
    (gate ``doc_incremental_bloom`` value-checks this against the
    ``method="exact"`` oracle); at 100 TB the anti-join's shuffle input
    drops from the whole batch to roughly its duplicate fraction.

    Pass ``bloom=`` a prebuilt :class:`..operators.bloom.BloomBitmap`
    (e.g. ``load_bloom`` of a persisted filter, or ``merge_blooms`` of
    per-revision filters) to skip the per-run seen-set fold entirely —
    the steady-state ingestion loop then reads KBs of filter instead
    of aggregating the seen-set every batch. The filter must summarize
    (a superset of) ``seen_fingerprints``: extra insertions only cost
    false-positive verifications; a MISSING insertion would break the
    no-false-negative contract, so always persist the filter and the
    seen-set in the same transaction.

    Returns the surviving documents with their fingerprints, which is
    exactly the delta to append to the seen-set for the next run.
    """
    fp = docs.select("doc_id", fingerprint_expr().alias("fingerprint"))
    # skew-safe keep-first: hash aggregation (map-side combine on hot
    # fingerprints) instead of a fingerprint window — see clean_corpus
    batch_first = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id", "fingerprint")
    seen = seen_fingerprints.select("fingerprint")
    if method == "exact":
        return batch_first.join(seen, "fingerprint", "left_anti").select(
            "doc_id", "fingerprint"
        )
    if method != "bloom":
        raise ValueError(f"unknown method: {method!r} (use 'exact' or 'bloom')")

    from ..operators.bloom import build_bloom, might_contain

    from ..config import get_option

    if bloom_bits is None:
        bloom_bits = get_option("dedup.bloom_bits")
    if bloom_hashes is None:
        bloom_hashes = get_option("dedup.bloom_hashes")
    spark = docs.sparkSession
    if bloom is None:
        bloom = build_bloom(seen, "fingerprint", bloom_bits, bloom_hashes)
    # ONE pass, no union, no persist: rows the filter rejects get a
    # NULL join key, and a null key never equi-matches — so the
    # left-anti join keeps every definite-new row without ever probing
    # the seen-set, while might-contain rows verify exactly. (The
    # earlier two-branch union re-executed the batch scan + window +
    # Arrow probe per branch, and a per-batch persist would leak
    # storage memory across a long-running ingestion loop.)
    flagged = batch_first.withColumn(
        "__jk",
        F.when(
            might_contain(bloom, F.col("fingerprint"), spark),
            F.col("fingerprint"),
        ),
    )
    return flagged.join(
        seen.select(F.col("fingerprint").alias("__jk")), "__jk", "left_anti"
    ).select("doc_id", "fingerprint")


def oracle_incremental_new_docs(
    table: str = "documents", seen_doc_id_below: int = 250
) -> str:
    fp = oracle_doc_fingerprint(table)
    return f"""
WITH fp AS ({fp}),
seen AS (SELECT fingerprint FROM fp WHERE doc_id < {seen_doc_id_below}),
batch_first AS (
    SELECT doc_id, fingerprint FROM (
        SELECT doc_id, fingerprint,
               MIN(doc_id) OVER (PARTITION BY fingerprint) AS rep
        FROM fp
    ) WHERE doc_id = rep
)
SELECT b.doc_id, b.fingerprint
FROM batch_first b
WHERE b.fingerprint NOT IN (SELECT fingerprint FROM seen)
"""


def clean_corpus_report(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """Per-stage drop accounting for :func:`clean_corpus` — the funnel
    audit a curation pipeline publishes next to its output. One row per
    stage: ``(stage, stage_order, n_dropped, n_remaining)``, with each
    document attributed to the FIRST stage that rejects it (lang →
    token window → quality floor → exact dup), mirroring the pipeline's
    sequential semantics.

    Single corpus scan: every stage verdict is a flag in one
    projection; the dup flag reuses the same fingerprint-window rule as
    clean_corpus restricted to filter survivors; the report is a tiny
    conditional aggregation over the flags.
    """
    se = stats_exprs()
    flagged = docs.select(
        "doc_id",
        se["n_tokens"].alias("__nt"),
        se["quality_score"].alias("__q"),
        pred_lang_expr().alias("__pl"),
        fingerprint_expr().alias("__fp"),
    ).select(
        "doc_id",
        "__fp",
        (F.col("__pl") != lang).alias("__drop_lang"),
        (~F.col("__nt").between(min_tokens, max_tokens)).alias("__drop_len"),
        # NULL quality (empty text) fails the floor — treat as dropped
        (~(F.col("__q") >= min_quality)).alias("__drop_q"),
    )
    survives_filters = (
        ~F.col("__drop_lang") & ~F.col("__drop_len") & ~F.col("__drop_q")
    )
    # the window here is load-bearing: unlike clean_corpus (which only
    # needs the keep-first SURVIVOR and uses the skew-safe min_by
    # aggregation), the report labels EVERY row with its drop stage, so
    # each row needs its group's rep id in-row. Diagnostic op — run it
    # on samples if a corpus has degenerate boilerplate hot keys.
    w = Window.partitionBy("__fp")
    flagged = flagged.withColumn(
        "__rep",
        F.min(F.when(survives_filters, F.col("doc_id"))).over(w),
    ).withColumn(
        "__drop_dup",
        survives_filters & (F.col("doc_id") != F.col("__rep")),
    )
    first_stage = (
        F.when(F.col("__drop_lang"), "lang_filter")
        .when(F.col("__drop_len"), "token_window")
        .when(F.col("__drop_q"), "quality_floor")
        .when(F.col("__drop_dup"), "exact_dup")
        .otherwise("kept")
    )
    agg = flagged.select(first_stage.alias("stage")).groupBy("stage").agg(
        F.count(F.lit(1)).alias("n")
    )
    order = {
        "lang_filter": 1, "token_window": 2, "quality_floor": 3,
        "exact_dup": 4, "kept": 5,
    }
    rows = {r["stage"]: r["n"] for r in agg.collect()}
    total = sum(rows.values())  # stages partition the corpus — no 2nd scan
    out, remaining = [], total
    for stage in ("lang_filter", "token_window", "quality_floor",
                  "exact_dup", "kept"):
        n = rows.get(stage, 0)
        if stage == "kept":
            out.append((stage, order[stage], 0, n))
        else:
            remaining -= n
            out.append((stage, order[stage], n, remaining))
    return docs.sparkSession.createDataFrame(
        out, "stage string, stage_order int, n_dropped long, n_remaining long"
    )


def oracle_clean_corpus_report(
    table: str = "documents",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> str:
    return f"""
WITH stats AS ({oracle_text_stats(table)}),
langs AS ({oracle_lang_id(table)}),
fp AS ({oracle_doc_fingerprint(table)}),
flags AS (
    SELECT s.doc_id, f.fingerprint,
           (l.pred_lang <> '{lang}') AS drop_lang,
           (s.n_tokens NOT BETWEEN {min_tokens} AND {max_tokens}) AS drop_len,
           (NOT (s.quality_score >= {min_quality})) AS drop_q
    FROM stats s JOIN langs l USING (doc_id) JOIN fp f USING (doc_id)
),
reps AS (
    SELECT doc_id, fingerprint,
           MIN(CASE WHEN NOT drop_lang AND NOT drop_len AND NOT drop_q
                    THEN doc_id END)
               OVER (PARTITION BY fingerprint) AS rep,
           drop_lang, drop_len, drop_q
    FROM flags
),
staged AS (
    SELECT CASE
        WHEN drop_lang THEN 'lang_filter'
        WHEN drop_len THEN 'token_window'
        WHEN drop_q THEN 'quality_floor'
        WHEN doc_id <> rep THEN 'exact_dup'
        ELSE 'kept' END AS stage
    FROM reps
),
counts AS (SELECT stage, COUNT(*) AS n FROM staged GROUP BY stage),
ladder AS (
    SELECT * FROM (VALUES
        ('lang_filter', 1), ('token_window', 2), ('quality_floor', 3),
        ('exact_dup', 4), ('kept', 5)) s(stage, stage_order)
)
SELECT l.stage, l.stage_order,
       CAST(CASE WHEN l.stage = 'kept' THEN 0
                 ELSE COALESCE(c.n, 0) END AS BIGINT) AS n_dropped,
       CAST(CASE WHEN l.stage = 'kept' THEN COALESCE(c.n, 0)
                 ELSE (SELECT COUNT(*) FROM {table})
                      - (SELECT COALESCE(SUM(c2.n), 0) FROM counts c2
                         JOIN ladder l2 ON l2.stage = c2.stage
                         WHERE l2.stage_order <= l.stage_order
                           AND l2.stage <> 'kept')
            END AS BIGINT) AS n_remaining
FROM ladder l LEFT JOIN counts c USING (stage)
"""


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot diff between two corpus versions: per-doc status
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (same id, different content fingerprint), or ``unchanged`` — the
    audit an incremental reprocessing run makes before deciding what to
    recompute (complements :func:`incremental_new_docs`, which handles
    the append-only case).

    One full outer join on doc_id over two fingerprint projections —
    the text itself never shuffles, only (id, md5)."""
    o = old.select("doc_id", fingerprint_expr().alias("__fo"))
    n = new.select("doc_id", fingerprint_expr().alias("__fn"))
    full = o.join(n, "doc_id", "full_outer")
    return full.select(
        "doc_id",
        F.when(F.col("__fo").isNull(), "added")
        .when(F.col("__fn").isNull(), "removed")
        .when(F.col("__fo") != F.col("__fn"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def oracle_corpus_diff(
    table: str = "documents",
    old_pred: str = "doc_id < 400",
    new_pred: str = "doc_id >= 25",
    changed_pred: str = "doc_id % 10 = 0",
) -> str:
    """Oracle over the gate's synthetic old/new split: old = rows with
    ``old_pred``; new = rows with ``new_pred``, with ``changed_pred``
    rows' text suffixed (same derivation as the gate query)."""
    fp = "md5(lower(regexp_replace(trim({t}), '\\s+', ' ', 'g')))"
    return f"""
WITH old_v AS (
    SELECT doc_id, {fp.format(t='text')} AS f
    FROM {table} WHERE {old_pred}
),
new_v AS (
    SELECT doc_id,
           {fp.format(t=("CASE WHEN " + changed_pred +
                         " THEN text || ' x' ELSE text END"))} AS f
    FROM {table} WHERE {new_pred}
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.f <> n.f THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id
"""


def prepare_chunked_training_set(
    docs: DataFrame,
    eval_docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    ngram: int = 5,
    chunk_tokens: int = 128,
    overlap: int = 16,
    context_len: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """:func:`prepare_training_set` with the chunking stage a real
    context-window pipeline needs between cleaning and packing: clean →
    decontaminate → slide ``chunk_tokens``-token windows over each
    survivor (:func:`~pipit_spark.llm.sampling.chunk_documents`) → pack
    the CHUNKS into ``context_len`` windows.

    Chunks shard by their parent ``doc_id`` (a document's chunks stay
    together — pack locality and deterministic order by
    ``(doc_id, chunk_idx)``), and the pack window is the same
    shard-local cumsum as :func:`~pipit_spark.llm.sampling
    .pack_sequences` — one shuffle, no global sort, document text
    scanned once for the chunk explode. Returns per-pack stats
    ``(shard, pack_in_shard, n_chunks, total_tokens)``.
    """
    from .sampling import chunk_documents

    _, survivors_text, contaminated = _cleaned_survivors(
        docs, eval_docs, lang, min_tokens, max_tokens, min_quality, ngram
    )
    final_text = survivors_text.join(contaminated, "doc_id", "left_anti")
    chunks = chunk_documents(
        final_text, chunk_tokens=chunk_tokens, overlap=overlap
    )
    from .sampling import _pack_window

    base = chunks.select(
        "doc_id", "chunk_idx",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.col("n_tokens"),
    )
    packed = _pack_window(base, ["doc_id", "chunk_idx"], context_len)
    return packed.groupBy("shard", "pack_in_shard").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def oracle_prepare_chunked_training_set(
    table: str = "documents",
    eval_pred: str = "doc_id < 25",
    corpus_pred: str = "doc_id >= 25",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    ngram: int = 5,
    chunk_tokens: int = 128,
    overlap: int = 16,
    context_len: int = 512,
    n_shards: int = 16,
) -> str:
    from .dedup import _sql_shingles
    from .text import _sql_norm

    norm = _sql_norm("text")
    stride = chunk_tokens - overlap
    return f"""
WITH corpus AS (SELECT * FROM {table} WHERE {corpus_pred}),
clean AS ({oracle_clean_corpus("corpus", lang, min_tokens, max_tokens, min_quality)}),
ev AS (
    SELECT DISTINCT unnest({_sql_shingles(ngram)}) AS shingle
    FROM {table} WHERE {eval_pred}
),
corp_sh AS (
    SELECT d.doc_id, unnest({_sql_shingles(ngram)}) AS shingle
    FROM corpus d JOIN clean c USING (doc_id)
),
cont AS (SELECT DISTINCT doc_id FROM corp_sh
         WHERE shingle IN (SELECT shingle FROM ev)),
surv AS (
    SELECT d.doc_id, d.text FROM corpus d
    JOIN clean c USING (doc_id)
    WHERE d.doc_id NOT IN (SELECT doc_id FROM cont) AND d.text IS NOT NULL
),
toks AS (SELECT doc_id, string_split({norm}, ' ') AS t FROM surv),
meta AS (
    SELECT doc_id, t,
           GREATEST(1, CAST(CEIL((len(t) - {overlap}) / {stride}.0) AS INT))
               AS n_chunks
    FROM toks
),
chunks AS (
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           len(t[i*{stride}+1 : i*{stride}+{chunk_tokens}]) AS n_tokens
    FROM meta, UNNEST(range(0, n_chunks)) AS u(i)
),
cum AS (
    SELECT doc_id % {n_shards} AS shard, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (
                    PARTITION BY doc_id % {n_shards}
                    ORDER BY doc_id, chunk_idx
                    ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {context_len}) AS BIGINT) AS pack_in_shard
    FROM chunks
)
SELECT shard, pack_in_shard,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM cum GROUP BY shard, pack_in_shard
"""


def corpus_health(docs: DataFrame) -> dict:
    """One-call corpus health check: the audit tiers a curation run
    reads before (and after) touching anything, as a dict of LAZY
    DataFrames — collect the ones you want, each is independently
    scan-efficient and individually driver-gated:

    - ``card``: one-row datasheet (quality.corpus_card — one scan)
    - ``dup_inflation``: per-source dedup ROI in ppm (dedup)
    - ``dup_clusters``: exact-dup cluster audit (dedup)
    - ``length_percentiles``: per-source token-length spread (text)
    - ``vocab``: corpus vocabulary stats (text.vocab_stats)

    Nothing here triggers a job — this is an API-composition
    convenience, not a new operator; the point is that a user gets
    the whole health picture from one import."""
    from .dedup import cluster_summary, dup_inflation
    from .quality import corpus_card
    from .text import length_percentiles, vocab_stats

    return {
        "card": corpus_card(docs),
        "dup_inflation": dup_inflation(docs),
        "dup_clusters": cluster_summary(docs),
        "length_percentiles": length_percentiles(docs),
        "vocab": vocab_stats(docs),
    }
