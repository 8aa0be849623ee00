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
