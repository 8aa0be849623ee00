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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest timestamp of each
    step given the previous step already happened strictly before it;
    one row per user who completed step 1, with NULL timestamps from
    the first missed step on, plus ``steps_completed``.

    Plan shape: one aggregation per step over the (pre-filtered) step's
    events, each joined to the accumulating per-user frame on
    ``user_col`` — k−1 shuffle-aligned joins of per-user aggregates
    (grouped frames, not the fact table; after the first groupBy every
    side is already hash-partitioned by user, so AQE plans local
    joins). The fact table is scanned once per step with the step
    predicate pushed to parquet.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    acc = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_step1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__t"))
            .join(acc.select(user_col, f"t_step{i - 1}"), user_col)
            .filter(F.col("__t") > F.col(f"t_step{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__t").alias(f"t_step{i}"))
        )
        acc = acc.join(nxt, user_col, "left")
    completed = sum(
        F.when(F.col(f"t_step{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return acc.select(
        user_col,
        *[f"t_step{i}" for i in range(1, len(steps) + 1)],
        completed.cast("int").alias("steps_completed"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, counted
    by distinct activity in each later period offset.

    Two aggregations: per-user first period (groupBy user), then
    distinct users per (cohort, offset) — both hash aggregations with
    map-side combine; the join aligning activity rows to their user's
    cohort is on the already-partitioned user key. Long-form output
    (cohort, period_offset, n_users): pivot to a matrix only at
    display, as with comm_matrix (SURVEY §2.4).
    """
    per = F.date_trunc(bucket, F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(per).alias("cohort_start")
    )
    activity = events.select(
        user_col, per.alias("__period")
    ).distinct()
    return (
        activity.join(firsts, user_col)
        .select(
            user_col,
            F.col("cohort_start"),
            (
                F.datediff(F.col("__period"), F.col("cohort_start"))
                / (7 if bucket == "week" else 1)
            )
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count_distinct(user_col).cast("long").alias("n_users"))
    )


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Column profile (the ANALYZE-style summary a pipeline runs before
    touching a new dataset): per column — row count, nulls, distinct
    count, and for numeric columns min/max/mean.

    Long-form output ``(column, n_rows, n_nulls, n_distinct, min_val,
    max_val, mean_val)`` with numerics cast to double (NULL for
    non-numeric columns). All metrics for ALL columns evaluate in ONE
    aggregation pass over a single scan (one row of structs, unpivoted
    driver-side into the long form) — not one job per column. Exact
    ``count_distinct`` (default) keeps the oracle twin exact;
    ``approx=True`` is the 100 TB path — HyperLogLog
    ``approx_count_distinct`` per column, ~2% relative error, constant
    memory, same single-pass shape.
    """
    from pyspark.sql import types as T

    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            (
                F.approx_count_distinct(F.col(c))
                if approx
                else F.count_distinct(F.col(c))
            ).alias(f"__dist_{c}"),
            (
                F.round(F.min(F.col(c)).cast("double"), 6)
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__min_{c}"),
            (
                F.round(F.max(F.col(c)).cast("double"), 6)
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__max_{c}"),
            (
                F.round(F.avg(F.col(c)), 6)
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mean_{c}"),
        ]
    row = df.agg(*aggs)
    spark = df.sparkSession
    r = row.collect()[0]
    out = [
        (
            c,
            r[f"__n_{c}"],
            r[f"__nulls_{c}"],
            r[f"__dist_{c}"],
            r[f"__min_{c}"],
            r[f"__max_{c}"],
            r[f"__mean_{c}"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_val double, max_val double, mean_val double",
    )


def burst_windows(
    events: DataFrame,
    bin_seconds: int = 3600,
    top_k: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type burst detection: the ``top_k`` busiest fixed windows
    for each event type — load-spike triage over an event stream
    (which hours melted the ingest tier, and with what volume vs the
    type's steady state).

    One hash aggregation on (type, epoch-aligned window): counts
    combine map-side, the aggregated table is |types|·|windows| rows
    (tiny), and the per-type baseline (mean events per ACTIVE window,
    exact-integer div) joins back from a second aggregate OVER that
    table — the raw stream is scanned once and never re-shuffled.
    Windows align to the Unix epoch (floor(epoch_sec / bin) · bin) —
    the same arithmetic in both engines, no timezone involvement.
    Ties break (n_events DESC, win_start ASC): total order under the
    rank, deterministic at any partitioning.

    ``ts_col`` may be a timestamp column or an epoch-ns BIGINT (the
    canonical events frame ships ns-longs).  The ns→sec step is
    INTEGER division — epoch-ns ≈ 1.7e18 exceeds a double's exact
    range, so a float divide would corrupt window boundaries."""
    dt = events.schema[ts_col].dataType.typeName()
    if dt in ("long", "bigint"):
        secs = F.expr(f"{ts_col} div 1000000000")
    else:
        secs = F.unix_timestamp(F.col(ts_col)).cast("long")
    # floor-div then re-multiply: exact for the non-negative epochs here
    win = (secs / F.lit(bin_seconds)).cast("long") * F.lit(bin_seconds)
    per_win = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            win.alias("win_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    base = per_win.groupBy(F.col("event_type").alias("__t")).agg(
        F.expr("sum(n_events) div count(*)").alias("mean_per_window")
    )
    ranked = (
        per_win.join(base, per_win["event_type"] == base["__t"])
        .drop("__t")
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("n_events"), F.asc("win_start")
                )
            ).cast("int"),
        )
    )
    return ranked.filter(F.col("rank") <= top_k).select(
        "event_type", "win_start", "n_events", "mean_per_window", "rank"
    )


def oracle_burst_windows(
    table: str = "events", bin_seconds: int = 3600, top_k: int = 3
) -> str:
    """DuckDB twin of :func:`burst_windows` — all-integer epoch
    arithmetic and counts, exact by construction."""
    return f"""
WITH per_win AS (
    SELECT event_type,
           (CAST(FLOOR(epoch(ts)) AS BIGINT) // {bin_seconds})
               * {bin_seconds} AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM {table}
    GROUP BY 1, 2
),
base AS (
    SELECT event_type,
           SUM(n_events) // COUNT(*) AS mean_per_window
    FROM per_win GROUP BY 1
),
ranked AS (
    SELECT p.event_type, p.win_start, p.n_events,
           CAST(b.mean_per_window AS BIGINT) AS mean_per_window,
           ROW_NUMBER() OVER (PARTITION BY p.event_type
                              ORDER BY p.n_events DESC,
                                       p.win_start ASC) AS rank
    FROM per_win p JOIN base b USING (event_type)
)
SELECT event_type, win_start, n_events, mean_per_window,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {top_k}
"""


def common_paths(
    events: DataFrame,
    length: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Discovered funnels: the ``top_k`` most common length-``length``
    consecutive event-type sequences across users — funnel() measures
    a DECLARED path; this finds which paths actually happen (the
    product-analytics complement, and the trace analogue of bigram_lm
    over event streams).

    One window pass per user timeline (lead×(length−1) over the
    (ts, event_id) order — users hash to independent partitions, no
    global sort), then a hash aggregation on the sequence string —
    map-side combined, output bounded by |event-type|^length.  Ties
    break (n_occurrences DESC, path ASC): deterministic LIMIT."""
    order = [F.col(ts_col), F.col("event_id")] if "event_id" in events.columns \
        else [F.col(ts_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    seqs = events.select(
        F.concat_ws(">", *steps).alias("path"),
        steps[-1].alias("__last"),
    ).filter(F.col("__last").isNotNull())
    return (
        seqs.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(top_k)
    )


def oracle_common_paths(
    table: str = "events", length: int = 3, top_k: int = 20
) -> str:
    """DuckDB twin of :func:`common_paths` — integer counts, same
    total order, exact by construction."""
    leads = ["event_type"] + [
        f"LEAD(event_type, {i}) OVER w" for i in range(1, length)
    ]
    concat = " || '>' || ".join(leads)
    return f"""
WITH seqs AS (
    SELECT {concat} AS path,
           LEAD(event_type, {length - 1}) OVER w AS last_step
    FROM {table}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM seqs WHERE last_step IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, path ASC
LIMIT {top_k}
"""
