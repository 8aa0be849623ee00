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


def train_bpe(
    docs: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in order. Ties on
    pair frequency break lexicographically (deterministic across
    engines and partitionings — a plain max would be
    partition-order-dependent)."""
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
