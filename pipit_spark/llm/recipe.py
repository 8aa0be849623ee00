"""Config-driven pipeline runner: a Dolma/CCNet-style recipe — an
ordered list of step dicts — compiled onto the existing operators as
one lazy DataFrame program.

Why this exists: production curation pipelines are declared in config
(reviewable, diffable, re-runnable), not in ad-hoc scripts. Each step
maps to an operator this engine already ships, and the runner keeps
the composition honest: every step consumes and returns a DOCUMENTS
frame (original columns preserved), so steps reorder/compose freely;
reduced-shape operators (dedup survivors, rule filters) rejoin the
corpus by ``left_semi`` on ``doc_id`` — ids only, bodies never
shuffle for the rejoin's sake.

Fusion is Catalyst's job, not ours: adjacent filter steps (lang /
token window / quality / custom predicate) are plain ``.filter`` calls
over shared expression factories, and the optimizer collapses them
into the single-scan projection the hand-fused ``clean_corpus`` plan
gets — declaring the recipe costs nothing at execution time.

Step vocabulary (``op`` key selects, remaining keys are parameters):

====================  ====================================================
``lang_filter``       keep predicted-language docs (``lang="en"``)
``token_window``      keep ``min <= n_tokens <= max``
``quality_floor``     keep ``quality_score >= min_quality``
``c4_rules``          C4/Gopher heuristic rule filter (quality.py params)
``pii_redact``        scrub emails/IPs/phones in-place (text rewritten)
``exact_dedup``       keep-first by normalized-text fingerprint
``fuzzy_dedup``       near-dup clusters → keep min-id (method/threshold)
``decontaminate``     drop docs sharing n-grams with ``eval_docs``
``sample``            deterministic md5 ~pct% sample (pct)
``shuffle``           deterministic training order (adds shard/pos cols)
``pack``              pack into context windows (terminal: pack stats)
====================  ====================================================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import pred_lang_expr, fingerprint_expr, stats_exprs


def _semi(docs: DataFrame, kept: DataFrame) -> DataFrame:
    return docs.join(kept.select("doc_id"), "doc_id", "left_semi")


def _check_keys(op: str, step: dict, allowed: set) -> None:
    """Fail at build time on parameter typos for the dict-driven steps
    (function-backed steps forward **step, so Python's TypeError
    already catches theirs)."""
    extra = set(step) - allowed
    if extra:
        raise ValueError(
            f"recipe step {op!r} got unknown parameter(s) "
            f"{sorted(extra)} — allowed: {sorted(allowed)}"
        )


def run_recipe(
    docs: DataFrame,
    recipe: list[dict],
    eval_docs: DataFrame | None = None,
) -> DataFrame:
    """Compile ``recipe`` over ``docs`` into one lazy plan. Raises
    ``ValueError`` on an unknown ``op`` (with the valid vocabulary —
    a config typo should fail at build time, not run 10 hours of a
    filter that never existed) and on a terminal step that is not
    last."""
    df = docs
    for i, step in enumerate(recipe):
        step = dict(step)
        op = step.pop("op", None)
        if op == "lang_filter":
            _check_keys(op, step, {"lang"})
            df = df.filter(
                pred_lang_expr() == step.get("lang", "en")
            )
        elif op == "token_window":
            _check_keys(op, step, {"min", "max"})
            df = df.filter(
                stats_exprs()["n_tokens"].between(
                    step.get("min", 10), step.get("max", 100_000)
                )
            )
        elif op == "quality_floor":
            _check_keys(op, step, {"min_quality"})
            df = df.filter(
                stats_exprs()["quality_score"]
                >= step.get("min_quality", 0.3)
            )
        elif op == "c4_rules":
            from .quality import heuristic_filter

            df = _semi(df, heuristic_filter(df, **step))
        elif op == "pii_redact":
            from .quality import pii_redact_expr

            _check_keys(op, step, set())
            df = df.withColumn("text", pii_redact_expr())
        elif op == "exact_dedup":
            _check_keys(op, step, set())
            # skew-safe keep-first: ONE min_by hash aggregation (hot
            # fingerprints combine map-side; a window would funnel a
            # whole boilerplate group through one task). Bodies ride
            # the aggregation buffers, but each moves AT MOST once and
            # duplicate groups collapse map-side — the id-only
            # alternative (min agg + semi join back) still shuffles
            # every body through the join exchange, so it is not
            # cheaper, just a second shuffle.
            cols = df.columns
            df = (
                df.groupBy(fingerprint_expr().alias("__fp"))
                .agg(
                    F.min_by(
                        F.struct(*[F.col(c) for c in cols]),
                        F.col("doc_id"),
                    ).alias("__r")
                )
                .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
            )
        elif op == "fuzzy_dedup":
            from .dedup import fuzzy_dedup

            df = _semi(df, fuzzy_dedup(df, **step))
        elif op == "decontaminate":
            from .dedup import decontaminate

            if eval_docs is None:
                raise ValueError(
                    "recipe step 'decontaminate' needs eval_docs"
                )
            bad = decontaminate(df, eval_docs, **step).select("doc_id")
            df = df.join(bad, "doc_id", "left_anti")
        elif op == "sample":
            from .sampling import sample_corpus

            _check_keys(op, step, {"pct"})
            df = sample_corpus(df, pct=step.get("pct", 10))
        elif op == "shuffle":
            from .sampling import shuffle_corpus

            # shuffle_corpus emits only (doc_id, shard, pos_in_shard);
            # join the order back so the step ADDS columns instead of
            # replacing the documents shape (the runner's contract)
            df = df.join(shuffle_corpus(df, **step), "doc_id")
        elif op == "pack":
            from .sampling import pack_sequences

            if i != len(recipe) - 1:
                raise ValueError(
                    "recipe step 'pack' is terminal (emits pack stats, "
                    "not documents) — it must be the last step"
                )
            se = stats_exprs()
            counted = df.select(
                "doc_id", se["n_tokens"].alias("n_tokens")
            )
            return pack_sequences(
                counted, tokens_col="n_tokens", **step
            )
        else:
            raise ValueError(
                f"unknown recipe op {op!r} at step {i} — valid ops: "
                "lang_filter, token_window, quality_floor, c4_rules, "
                "pii_redact, exact_dedup, fuzzy_dedup, decontaminate, "
                "sample, shuffle, pack"
            )
    return df
