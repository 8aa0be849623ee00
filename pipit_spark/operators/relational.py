"""Generic relational operators beyond the reference's surface.

The reference exposes no user-facing joins (SURVEY §2.7); these fill the
gaps a large-scale event/training pipeline needs, each in its
shuffle-minimal Spark form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (backward; inclusive) within the same ``by``
    group.

    Plan: tag + union + one window pass — a single shuffle on ``by``,
    then a sorted sweep per group carrying the last-seen right values
    forward. No per-key loop, no range cross join; skewed ``by`` keys
    are split by AQE. (The pandas equivalent is ``merge_asof``; DuckDB's
    is ``ASOF JOIN`` — used as this operator's oracle.)
    """
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")

    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, by) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = tagged_l.unionByName(tagged_r)
    # right rows (tag 0) sort before left rows at equal timestamps →
    # inclusive (<=) as-of semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def percentile_outliers(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    p: float = 0.99,
) -> DataFrame:
    """Rows whose ``value_col`` exceeds their group's p-th percentile.

    Plan shape: the per-group threshold table is an aggregate over a
    low-cardinality key (event types, function names, sources — a few
    hundred rows at most), so Spark broadcasts it and the flagging pass
    is a scan + broadcast hash join — no shuffle of the fact table.
    Exact interpolated ``percentile`` keeps the DuckDB ``quantile_cont``
    oracle bit-matching; at 100 TB swap in ``approx_percentile`` (the
    plan shape is identical).
    """
    thresholds = events.groupBy(group_col).agg(
        F.round(F.percentile(F.col(value_col), F.lit(p)), 6).alias(
            "__threshold"
        )
    )
    return (
        events.join(F.broadcast(thresholds), group_col)
        .filter(F.col(value_col) > F.col("__threshold"))
        .select(
            "event_id",
            group_col,
            F.round(F.col(value_col), 6).alias(value_col),
            F.col("__threshold").alias("threshold"),
        )
    )
