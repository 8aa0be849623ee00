"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
re-expressed for Spark).

BPE trains on the *distinct-word frequency table*, which is tiny
relative to the corpus (Heaps' law: ~10⁶–10⁷ types for a 100 TB
corpus) — so the corpus is scanned ONCE for word counts (one shuffle)
and every merge iteration runs over the persisted vocabulary table:

* pair counts: ``zip_with`` the symbol array against its own tail —
  narrow, then one small aggregate per iteration;
* best pair: deterministic argmax (count desc, pair asc) — a 1-row
  collect;
* merge: a left-fold ``aggregate`` HOF rewrites each word's symbol
  array, merging leftmost-first non-overlapping occurrences exactly as
  the reference algorithm does ("aaa" + (a,a) → ["aa","a"]).

Lineage is cut with ``localCheckpoint`` every few iterations (an
iterative algorithm's plan otherwise grows linearly and the optimizer
re-walks it each pass).

Applying a trained tokenizer is the inverse trade: the merge table is
small and replicates (broadcast) while the corpus streams through an
Arrow-batched ``mapInPandas`` encoder — the corpus is never shuffled.
Training is verified against an independently-transcribed pure-Python
reference implementation in the tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .text import _norm


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the whitespace-normalized corpus — the single
    corpus-wide scan+shuffle of BPE training."""
    return (
        docs.select(
            F.explode(
                F.split(_norm(F.coalesce(F.col(text_col), F.lit(""))), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


_EOW = "</w>"


def _train_bpe_local(
    word_cnt: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich merge loop over a collected word table, with
    incremental pair statistics (pair → containing-word index, lazy
    max-heap for the argmax) — O(affected words) per merge instead of
    O(vocabulary), so a real 32k-merge vocabulary trains in seconds
    driver-side.  Semantics are merge-for-merge identical to the
    published Algorithm 1: overlapping occurrences each count, ties
    break (count desc, pair asc), merges apply leftmost-first
    non-overlapping."""
    import heapq

    vocab: list[list] = [[list(w) + [_EOW], c] for w, c in word_cnt]
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, c) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            stats[p] = stats.get(p, 0) + c
            index.setdefault(p, set()).add(wid)

    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heap[0]
        cur = stats.get(best, 0)
        if cur != -negc:  # stale heap entry (lazy deletion)
            heapq.heappop(heap)
            continue
        if cur < 2:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        # stale word ids (word no longer contains the pair) are harmless:
        # their retract-and-readd below cancels exactly
        for wid in index.pop(best, set()):
            syms, c = vocab[wid]
            for p in zip(syms, syms[1:]):
                left = stats.get(p, 0) - c
                if left > 0:
                    stats[p] = left
                    # re-push at the new count: every live count must
                    # have a heap entry or the pair becomes unselectable
                    heapq.heappush(heap, (-left, p))
                else:
                    stats.pop(p, None)
            new: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[wid][0] = new
            for p in zip(new, new[1:]):
                stats[p] = stats.get(p, 0) + c
                index.setdefault(p, set()).add(wid)
                heapq.heappush(heap, (-stats[p], p))
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
    distributed: bool = False,
    max_word_types: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in order. Ties on
    pair frequency break lexicographically (deterministic across
    engines and partitionings — a plain max would be
    partition-order-dependent).

    Default path: ONE distributed corpus scan builds the word-frequency
    table (the only data-sized step), the top ``max_word_types`` types
    (count desc, word asc — a top-k, not a full sort) collect to the
    driver, and the merge loop runs locally at dict/heap speed.  The
    distributed per-merge loop costs ~2 Spark jobs per merge — at a real
    32k-merge vocabulary that is ~64k sequential driver round-trips of
    pure scheduler overhead over a vocabulary-sized table; keep it
    (``distributed=True``) only for word tables that genuinely cannot
    fit the driver."""
    if not distributed:
        wc = word_counts(docs, text_col)
        rows = (
            wc.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_word_types)
            .collect()
        )
        return _train_bpe_local([(r["word"], r["cnt"]) for r in rows], num_merges)

    words = word_counts(docs, text_col).select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("syms"),
        "cnt",
    ).persist()
    words.count()  # materialize before the loop

    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
            "cnt",
        ).groupBy("p").agg(F.sum("cnt").alias("total"))
        top = pairs.orderBy(
            F.desc("total"), F.asc("p.a"), F.asc("p.b")
        ).limit(1).collect()
        if not top or top[0]["total"] < 2:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        merged = a + b
        # leftmost-first non-overlapping merge as a left fold: replace
        # the accumulator's last element with `merged` when it equals
        # `a` and x equals `b`, else append x. Overlap cannot chain:
        # after a merge the last element is a+b, and a+b == a would
        # need an empty b — symbols are never empty (chars + '</w>') —
        # so no just-merged flag is needed and the fold stays a plain
        # array accumulator (half the per-element expression tree of
        # the hottest per-iteration op)
        nxt = words.select(
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == a)
                    & (x == b),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
            "cnt",
        )
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference-style greedy encoder: repeatedly apply the
    lowest-rank applicable merge (the standard BPE inference rule)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: (doc_id, tokens,
    n_tokens). The merge table broadcasts; the corpus streams through
    an Arrow-batched encoder with a bounded per-task word cache (Zipf:
    most words repeat, so the cache turns per-word merge search into a
    dict hit; the cap keeps heavy-tailed vocabularies — URLs, hex ids —
    from growing it without bound on a long-lived task). Narrow — no
    shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            ids, toks, ns = [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                out: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        if len(cache) >= 200_000:
                            cache.clear()  # heavy-tail cap
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(did)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {"doc_id": ids, "tokens": toks, "n_tokens": ns}
            )

    return docs.select("doc_id", text_col).mapInPandas(gen, schema)


def oracle_bpe(num_merges: int = 12, table: str = "documents") -> str:
    """DuckDB replay of the merge loop, unrolled to ``num_merges``
    chained CTE steps over the word table (lowercased alphanumeric
    words only — see q_doc_bpe).  Each step: pair counts from the
    symbol lists, deterministic argmax (count desc, pair asc), then the
    merge applied through a sentinel-string ``replace`` — every symbol
    is wrapped ``|sym|`` so ``replace(r, '|a||b|', '|ab|')`` is exactly
    the leftmost-first non-overlapping merge rule (the wrapper makes
    boundary false-matches impossible for pipe-free symbols, and
    consecutive overlapping occurrences resolve left-to-right just like
    the trainer's fold).  Every step CTE is MATERIALIZED: w{{k}} is
    referenced twice (pair counts + the next step), so inlining would
    re-evaluate the whole chain per reference — a 2^num_merges blowup."""
    sql = f"""WITH words AS MATERIALIZED (
    SELECT t.w AS word, COUNT(*) AS cnt
    FROM {table},
         UNNEST(string_split(regexp_replace(trim(lower(text)),
                                            '\\s+', ' ', 'g'), ' ')) AS t(w)
    WHERE regexp_matches(t.w, '^[a-z0-9]+$')
    GROUP BY 1
),
w0 AS MATERIALIZED (
    SELECT list_append(string_split(word, ''), '</w>') AS syms,
           regexp_replace(word, '(.)', '|\\1|', 'g') || '|</w>|' AS r,
           cnt
    FROM words
)"""
    for k in range(num_merges):
        rep = (
            f"replace(w.r, '|' || b.a || '||' || b.b || '|', "
            f"'|' || b.a || b.b || '|')"
        )
        sql += f""",
p{k} AS (
    SELECT syms[i] AS a, syms[i + 1] AS b, SUM(cnt) AS total
    FROM w{k}, UNNEST(range(1, length(syms))) AS t(i)
    GROUP BY 1, 2
),
b{k} AS MATERIALIZED (
    SELECT {k} AS merge_idx, a, b FROM p{k}
    WHERE total >= 2 ORDER BY total DESC, a, b LIMIT 1
),
w{k + 1} AS MATERIALIZED (
    SELECT string_split(trim({rep}, '|'), '||') AS syms,
           {rep} AS r, w.cnt
    FROM w{k} w, b{k} b
)"""
    union = " UNION ALL ".join(f"SELECT * FROM b{k}" for k in range(num_merges))
    sql += (
        f"\nSELECT CAST(merge_idx AS INT) AS merge_idx, a, b FROM ({union})"
    )
    return sql
