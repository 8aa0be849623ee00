"""Pattern detection via matrix profile (reference pipit/trace.py:806-863).

The reference slices one process's trace between the first Enter and last
Leave of ``start_event`` and runs stumpy's matrix profile over the metric
series. The slicing/filtering stays relational here; the motif search
runs on the collected single-process series (bounded — same envelope as
the reference), with stumpy as an optional dependency exactly like the
reference's lazy import (pipit/trace.py:815).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import schema as S


def detect_pattern(
    trace,
    start_event: str,
    iterations: int | None = None,
    window_size: int | None = None,
    process: int = 0,
    metric: str = S.TIME_EXC,
):
    try:
        import stumpy  # noqa: F401
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "detect_pattern requires the optional 'stumpy' package "
            "(reference pipit/trace.py:815 lazy-imports it the same way)"
        ) from e
    import numpy as np

    df = trace.calc_exc_metrics() if metric.endswith("_exc") else trace.matched
    proc = df.filter(F.col(S.PROCESS) == process)

    bounds = proc.filter(F.col(S.NAME) == start_event).agg(
        F.min(F.when(F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES), F.col(S.TIMESTAMP))),
        F.max(F.when(F.col(S.EVENT_TYPE).isin(*S.LEAVE_TYPES), F.col(S.TIMESTAMP))),
    ).collect()[0]
    if bounds[0] is None or bounds[1] is None:
        return []

    sliced = (
        proc.filter(
            (F.col(S.TIMESTAMP) >= bounds[0])
            & (F.col(S.TIMESTAMP) <= bounds[1])
            & F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES)
            & F.col(metric).isNotNull()
        )
        .orderBy(S.TIMESTAMP, S.SEQ)
        .select(S.EVENT_ID, metric)
        .toPandas()
    )
    series = sliced[metric].to_numpy(dtype="float64")
    if window_size is None:
        if iterations is None:
            iterations = 2
        window_size = max(4, len(series) // max(iterations, 1))
    if len(series) < 2 * window_size:
        return []

    mp = stumpy.stump(series, m=window_size)
    motif_distances, motif_indices = stumpy.motifs(series, mp[:, 0], max_motifs=8)
    out = []
    for dists, idxs in zip(motif_distances, motif_indices):
        for idx in np.atleast_1d(idxs):
            if idx >= 0:
                out.append(
                    sliced.iloc[int(idx): int(idx) + window_size].reset_index(
                        drop=True
                    )
                )
    return out
