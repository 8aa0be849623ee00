"""Model-based document scoring — the quality-classifier hook of a
curation pipeline (fastText/BERT-style filters), with the Spark-side
plumbing real and the model pluggable.

The expensive part at 100 TB is not the model call but the plumbing
around it, and that is what this module fixes in place:

* ``mapInPandas`` over Arrow batches — vectorized transfer, no
  per-row Python;
* the model loads ONCE PER PARTITION (inside the batch iterator,
  before the first batch), not once per batch and never per row —
  the pattern that keeps a 500 MB classifier from being deserialized
  thousands of times;
* output schema is declared up front (input columns + ``score``
  double), so downstream pruning/pushdown still work.

No ML runtime ships in this environment, so the default scorer is a
deterministic stub — ``int(md5(text)[:6], 16) / 16^6`` — chosen
because any SQL engine with md5 can replay it exactly: the driver's
DuckDB oracle value-checks the whole plumbing path, batch boundaries
and all. Swap ``scorer_factory`` for a real model loader in
production; the plan shape does not change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _stub_scorer_factory() -> Callable[[pd.Series], pd.Series]:
    """Deterministic fake 'model': first 6 md5 hex digits of the text,
    scaled to [0, 1). Stands in for a loaded classifier; replayable in
    any engine with md5."""
    import hashlib

    def score(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: int(hashlib.md5(str(t).encode()).hexdigest()[:6], 16)
            / float(16 ** 6)
        )

    return score


def score_documents(
    docs: DataFrame,
    scorer_factory: Callable[[], Callable[[pd.Series], pd.Series]] | None = None,
    text_col: str = "text",
    score_col: str = "model_score",
) -> DataFrame:
    """Append a model score per document. ``scorer_factory`` is called
    once per partition and must return a vectorized
    ``pd.Series -> pd.Series`` scorer; the default is the deterministic
    md5 stub (see module docstring)."""
    factory = scorer_factory or _stub_scorer_factory
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema.fields)
    out_schema = f"{fields}, {score_col} double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # per-partition model load
        for pdf in batches:
            pdf = pdf.copy()
            pdf[score_col] = scorer(pdf[text_col]).astype("float64")
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def oracle_score_documents(
    table: str = "documents", score_col: str = "model_score"
) -> str:
    """DuckDB replay of the stub scorer: nibble-decode the first 6 md5
    hex digits. Rounded to 10 decimals on both sides (the division is
    exact in double, rounding just pins the textual form)."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1) "
        f"* {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"""
SELECT doc_id,
       ROUND(({digits}) / {float(16 ** 6)}, 10) AS {score_col}
FROM {table}
"""
