"""Registry-wide physical-plan contract sweep.

Every gate's executed plan is checked for the two anti-patterns that
sink 100 TB jobs silently: an unconstrained CartesianProduct (all-pairs
materialization) and Python row-processing stages sneaking into
operators that are supposed to be JVM-only. Known Arrow-kernel gates
are allow-listed explicitly — a new gate that introduces a Python stage
must declare it here, which is the point.
"""

from __future__ import annotations

import pytest

from pipit_spark import queries as Q

SF = "/root/testdata/sf0.001"

# gates whose DESIGN includes an Arrow/pandas stage (the fused matching
# kernel, BLAS similarity kernels, stub codecs, matrix-profile motifs)
PYTHON_STAGE_OK = {
    # trace gates run through the fused mapInPandas matching pass
    "trace_match_inc", "trace_flat_profile", "trace_load_imbalance",
    "trace_session_stats", "trace_cct", "trace_idle_time",
    "trace_comm_matrix", "trace_comm_count", "trace_comm_by_process",
    "trace_message_histogram", "trace_comm_over_time",
    "trace_time_profile", "trace_multirun", "trace_detect_pattern",
    "trace_slow_calls", "trace_folded_stacks", "trace_comm_by_function",
    "trace_diff", "trace_caller_callee", "trace_late_senders",
    "trace_late_receivers", "trace_wait_attribution",
    # similarity / media kernels
    "emb_topk_pandas", "emb_ivf_topk", "emb_ivf_topk_exact",
    "emb_pq_topk", "emb_pq_topk_exact",
    "emb_ivfpq_topk", "emb_ivfpq_topk_exact", "emb_ann_recall",
    "emb_lsh_ann", "emb_semantic_dedup", "media_decode",
    # portable integer ANN tiers: exact-int64 Arrow matmul kernels
    # (_int_dots_udf / _pair_dot_int_udf) by design
    "emb_lsh_topk", "emb_ivf_topk_portable", "emb_rrf_fusion",
    "emb_rrf_fusion_indexed",  # shared exact-int dot kernel, by design
    "emb_cell_balance",  # portable centroid-assignment Arrow kernel
    "doc_hybrid_retrieval",  # vector tier rides the LSH Arrow kernel
    "media_near_dups",  # decode step is the codec Arrow stage
    "media_decode_real",  # synth + real-codec decode, both Arrow stages
    # bloom probe is a vectorized Arrow bit-test by design
    "doc_incremental_bloom",
    # model-scoring hook (mapInPandas by contract)
    "doc_model_score",
}

_PY_MARKERS = (
    "MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython",
    "BatchEvalPython", "AggregateInPandas", "FlatMapGroupsInPandasWithState",
)


@pytest.mark.parametrize("name", list(Q.queries()))
def test_no_cartesian_and_declared_python_only(spark, name):
    try:
        df = Q.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        has_py = any(m in plan for m in _PY_MARKERS)
        if name not in PYTHON_STAGE_OK:
            assert not has_py, f"{name}: undeclared Python stage in plan"
    finally:
        # in finally: a failing gate must not leak its persisted frames
        # / the trace memo into the other ~99 parametrized tests
        Q.clear_state(spark)
