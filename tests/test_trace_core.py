"""Golden-value tests for the core matching/metric operators on the
reference's foo-bar fixture (hand-checkable values, FIXTURES.md §2) and
structural invariants mirroring pipit/tests/trace.py:71-146."""

from __future__ import annotations

import pipit_spark.schema as S

NS = 1_000_000_000


def _by_key(rows, *keys):
    return {tuple(r[k] for k in keys): r for r in rows}


def test_csv_read_canonical(foo_bar_trace):
    ev = foo_bar_trace.events
    assert ev.count() == 20
    cols = set(ev.columns)
    assert {S.EVENT_ID, S.TIMESTAMP, S.SEQ, S.EVENT_TYPE, S.NAME, S.PROCESS} <= cols
    procs = {r[0] for r in ev.select(S.PROCESS).distinct().collect()}
    assert procs == {0, 1}


def test_match_events_structure(foo_bar_trace):
    m = foo_bar_trace.matched.collect()
    assert len(m) == 20
    rows = {r[S.EVENT_ID]: r for r in m}
    # every row matched (trace is balanced)
    for r in m:
        assert r[S.MATCHING_EVENT] is not None
        partner = rows[r[S.MATCHING_EVENT]]
        # symmetric matching, same name, opposite type
        assert partner[S.MATCHING_EVENT] == r[S.EVENT_ID]
        assert partner[S.NAME] == r[S.NAME]
        assert partner[S.EVENT_TYPE] != r[S.EVENT_TYPE]
        assert r[S.MATCHING_TS] == partner[S.TIMESTAMP]
        if r[S.EVENT_TYPE] == "Enter":
            assert r[S.MATCHING_TS] > r[S.TIMESTAMP]


def test_depth_parent_and_inc(foo_bar_trace):
    m = [r for r in foo_bar_trace.matched.collect() if r[S.EVENT_TYPE] == "Enter"]
    by = _by_key(m, S.PROCESS, S.NAME)

    # hand-computed golden values (FIXTURES.md §2)
    assert by[(0, "main()")][S.DEPTH] == 0
    assert by[(0, "main()")][S.PARENT] is None
    assert by[(0, "foo()")][S.DEPTH] == 1
    assert by[(0, "foo()")][S.PARENT] == by[(0, "main()")][S.EVENT_ID]
    assert by[(0, "MPI_Send")][S.DEPTH] == 2
    assert by[(0, "MPI_Send")][S.PARENT] == by[(0, "foo()")][S.EVENT_ID]
    assert by[(0, "foo()")][S.TIME_INC] == 24 * NS
    assert by[(0, "main()")][S.TIME_INC] == 100 * NS
    assert by[(1, "grault()")][S.TIME_INC] == 20 * NS


def test_exc_metrics(foo_bar_trace):
    exc = foo_bar_trace.calc_exc_metrics()
    rows = [r for r in exc.collect() if r[S.EVENT_TYPE] == "Enter"]
    by = _by_key(rows, S.PROCESS, S.NAME)
    # foo(): 24 - (2 + 10) = 12 s (FIXTURES.md §2)
    assert by[(0, "foo()")][S.TIME_EXC] == 12 * NS
    assert by[(0, "main()")][S.TIME_EXC] == (100 - 24) * NS
    assert by[(0, "MPI_Send")][S.TIME_EXC] == 2 * NS
    # process 1: main 100 - (38 + 18 + 20) = 24
    assert by[(1, "main()")][S.TIME_EXC] == 24 * NS
    # bar(): 38 - (8 + 4) = 26
    assert by[(1, "bar()")][S.TIME_EXC] == 26 * NS


def test_flat_profile(foo_bar_trace):
    fp = foo_bar_trace.flat_profile(metrics=S.TIME_EXC)
    vals = {r[S.NAME]: r[S.TIME_EXC] for r in fp.collect()}
    # single-process functions: mean over the one process that has them
    assert vals["foo()"] == 12 * NS
    assert vals["grault()"] == 20 * NS
    # main() on both processes: (76 + 24) / 2 = 50
    assert vals["main()"] == 50 * NS


def test_idle_time(foo_bar_trace):
    it = {r[S.PROCESS]: r["idle_time"] for r in foo_bar_trace.idle_time().collect()}
    assert it[0] == 0.0
    assert it[1] == (8 + 18) * NS


def test_load_imbalance(foo_bar_trace):
    li = foo_bar_trace.load_imbalance(metric=S.TIME_EXC, num_processes=1)
    rows = {r[S.NAME]: r for r in li.collect()}
    main = rows["main()"]
    # per-process exc: p0=76, p1=24 → imbalance = 76/50
    assert abs(main[f"{S.TIME_EXC}_imbalance"] - 76 / 50) < 1e-9
    assert main["top_processes"] == [0]


def test_cct(foo_bar_trace):
    cct = foo_bar_trace.cct.collect()
    names = {(r["name"], r["depth"]) for r in cct}
    assert ("main", 0) not in names  # names keep their () suffix
    assert ("main()", 0) in names
    assert ("foo()", 1) in names
    assert ("MPI_Send", 2) in names
    # both processes' main() share one root node (same callpath hash)
    roots = [r for r in cct if r["depth"] == 0]
    assert len(roots) == 1
    assert roots[0]["parent_node_id"] is None


def test_comm_matrix_golden(ping_pong_trace):
    """Reference golden values: 4,177,920 bytes and 8 msgs per direction,
    zero diagonal (pipit/tests/trace.py:22-32)."""
    size = ping_pong_trace.comm_matrix_numpy(output="size")
    count = ping_pong_trace.comm_matrix_numpy(output="count")
    assert size[0][1] == size[1][0] == 4_177_920
    assert size[0][0] == size[1][1] == 0
    assert count[0][1] == count[1][0] == 8


def test_comm_by_process(ping_pong_trace):
    rows = {r[S.PROCESS]: r for r in ping_pong_trace.comm_by_process().collect()}
    # symmetric ping-pong: sent == received (pipit/tests/trace.py:53-68)
    for p in (0, 1):
        assert rows[p]["sent"] == rows[p]["received"] == 4_177_920


def test_comm_matrix_memo_aware_source(ping_pong_trace):
    """comm ops scan the persisted matched frame IFF it already exists
    (a row-identical superset of events) — same results either way, and
    materializing `matched` must not change them."""
    before = sorted(
        map(tuple, ping_pong_trace.comm_matrix(output="size").collect())
    )
    ping_pong_trace.matched.count()  # materialize the memo
    assert ping_pong_trace._matched is not None
    after = sorted(
        map(tuple, ping_pong_trace.comm_matrix(output="size").collect())
    )
    assert before == after


def test_message_histogram(ping_pong_trace):
    h = ping_pong_trace.message_histogram(bins=5).collect()
    assert len(h) == 5
    # all 16 messages are the same size → everything in one bin
    assert sum(r["count"] for r in h) == 16
    assert max(r["count"] for r in h) == 16


def test_comm_over_time(ping_pong_trace):
    h = ping_pong_trace.comm_over_time(output="count", bins=10).collect()
    assert len(h) == 10
    assert sum(r["count"] for r in h) == 16
    # bin range spans the whole trace [0, 21000]; sends happen 2000-10000
    nonzero = [r["bin_idx"] for r in h if r["count"] > 0]
    assert min(nonzero) >= 0 and max(nonzero) <= 5


def test_time_profile_invariants(foo_bar_trace):
    """Mirrors pipit/tests/trace.py:149-218: per-bin totals equal
    bin_duration × nprocs, and per-function binned time sums to the
    function's total exclusive time."""
    num_bins = 10
    tp = foo_bar_trace.time_profile(num_bins=num_bins).collect()
    bin_dur = 10 * NS  # trace spans [0, 100s], 10 bins
    nproc = 2
    bins = {}
    for r in tp:
        bins.setdefault(r["bin_idx"], 0.0)
        bins[r["bin_idx"]] += r["time"]
    assert len(bins) == num_bins
    for total in bins.values():
        assert abs(total - bin_dur * nproc) < 1.0

    per_fn = {}
    for r in tp:
        per_fn[r[S.NAME]] = per_fn.get(r[S.NAME], 0.0) + r["time"]
    # exc totals from calc_exc: foo()=12, main()=76+24=100, Idle=8+18=26
    assert abs(per_fn["foo()"] - 12 * NS) < 1.0
    assert abs(per_fn["main()"] - 100 * NS) < 1.0
    assert abs(per_fn["Idle"] - 26 * NS) < 1.0


def test_time_profile_normalized(foo_bar_trace):
    tp = foo_bar_trace.time_profile(num_bins=10, normalized=True).collect()
    bins = {}
    for r in tp:
        bins.setdefault(r["bin_idx"], 0.0)
        bins[r["bin_idx"]] += r["time"]
    for total in bins.values():
        assert abs(total - 1.0) < 1e-9


def test_chrome_frame(foo_bar_trace, tmp_path):
    out = foo_bar_trace.to_chrome(str(tmp_path / "trace.json"))
    import json

    with open(out) as f:
        rows = json.load(f)
    assert len(rows) == 20
    assert {r["ph"] for r in rows} == {"B", "E"}
    assert rows[0]["ts"] == 0


def test_detect_pattern_fallback(spark):
    """Pattern mining finds the repeated A/B/C block in a synthetic
    trace (numpy matrix-profile fallback when stumpy is absent)."""
    import pandas as pd
    from pipit_spark import Trace
    from pipit_spark.schema import EVENT_SCHEMA

    rows = []
    t = 0

    def add(ts, etype, name):
        rows.append((len(rows), ts, len(rows), etype, name, 0, 0, None))

    add(t, "Enter", "main")
    t = 10
    # 4 repetitions of a distinctive duration pattern A=100, B=300, C=50
    for rep in range(4):
        for name, dur in (("A", 100), ("B", 300), ("C", 50)):
            add(t, "Enter", name)
            add(t + dur, "Leave", name)
            t += dur + 10
    add(t + 100, "Leave", "main")
    pdf = pd.DataFrame(
        rows,
        columns=[
            "event_id", "timestamp_ns", "seq", "event_type",
            "name", "process", "thread", "attributes",
        ],
    )
    trace = Trace(spark.createDataFrame(pdf, schema=EVENT_SCHEMA))
    motifs = trace.detect_pattern("main", window_size=3, metric="time_inc")
    assert motifs, "expected at least one motif window"
    # each motif window covers one A/B/C repetition worth of enters
    assert all(len(m) == 3 for m in motifs)
    durs = [list(m["time_inc"]) for m in motifs]
    assert any(d == [100.0, 300.0, 50.0] for d in durs)


def test_idle_time_mpi_events(ping_pong_trace):
    """mpi_events=True appends MPI_Wait/MPI_Waitall/MPI_Recv to the idle
    set (reference pipit/trace.py:619-621). Ping-pong golden: rank 0's 8
    MPI_Recv calls are 400 ns each (enter base+200 → leave base+600),
    rank 1's are 500 ns (base → base+500)."""
    base = {
        r[S.PROCESS]: r["idle_time"]
        for r in ping_pong_trace.idle_time(idle_functions=["Idle"]).collect()
    }
    assert base == {0: 0.0, 1: 0.0}
    mpi = {
        r[S.PROCESS]: r["idle_time"]
        for r in ping_pong_trace.idle_time(
            idle_functions=["Idle"], mpi_events=True
        ).collect()
    }
    assert mpi == {0: 8 * 400.0, 1: 8 * 500.0}


def test_idle_time_does_not_mutate_caller_list(ping_pong_trace):
    fns = ["Idle"]
    ping_pong_trace.idle_time(idle_functions=fns, mpi_events=True).collect()
    assert fns == ["Idle"]


def test_load_imbalance_top_n_ranks(ping_pong_trace):
    """num_processes=2 returns the two most-loaded ranks per function in
    load order (reference pipit/trace.py:588-592). MPI_Recv: rank 1
    (500 ns/call) above rank 0 (400 ns/call)."""
    li = {
        r[S.NAME]: r["top_processes"]
        for r in ping_pong_trace.load_imbalance(
            metric=S.TIME_INC, num_processes=2
        ).collect()
    }
    assert li["MPI_Recv"] == [1, 0]
    assert li["MPI_Send"] == [1, 0]  # rank1 sends 350ns vs rank0 100ns
    assert len(li["main"]) == 2


def test_cct_graph_object_view(foo_bar_trace):
    """The driver-side Node/Graph view (reference pipit/graph.py
    semantics): levels from the table, LCA, ancestry lists, root
    wiring. foo-bar call shape: main -> foo -> {bar, baz...}."""
    g = foo_bar_trace.cct_graph()
    assert len(g) > 0 and g.roots, g
    by_name = {}
    for n in g:
        by_name.setdefault(n.name, []).append(n)
    roots = {r.name for r in g.roots}
    assert all(r.level == 0 for r in g.roots)
    # every child is exactly one level below its parent
    for n in g:
        if n.parent is not None:
            assert n.level == n.parent.level + 1
            assert n in n.parent.children
    # LCA of two siblings is their shared parent; LCA with self is self
    for n in g:
        assert n.get_intersection(n) == n
        for c1 in n.children:
            for c2 in n.children:
                assert c1.get_intersection(c2) == (c1 if c1 == c2 else n)
    # ancestry list walks to (but not through) min_level
    deepest = max(g, key=lambda n: n.level)
    chain = deepest.get_node_list(0)
    assert [c.level for c in chain] == list(range(deepest.level, 0, -1))
    assert deepest.get_intersection(None) is None
    assert roots  # at least one distinct root name


def test_trace_rejects_noncanonical_frame(spark):
    """A frame without the canonical columns fails fast with a message
    naming what's missing, instead of erroring deep in an operator."""
    import pytest

    from pipit_spark import Trace

    df = spark.createDataFrame([(1, "x")], "id long, label string")
    with pytest.raises(ValueError, match="missing canonical columns"):
        Trace(df)


def test_trace_slice(ping_pong_trace):
    from pyspark.sql import functions as F

    """slice() filters by process / name / time window with pushed-down
    predicates and yields a self-consistent sub-trace."""
    one = ping_pong_trace.slice(processes=[0])
    assert {r[S.PROCESS] for r in one.events.select(S.PROCESS).distinct().collect()} == {0}
    recvs = ping_pong_trace.slice(names=["MPI_Recv"])
    assert {r[S.NAME] for r in recvs.events.select(S.NAME).distinct().collect()} == {"MPI_Recv"}
    # rank 0's MPI_Recv calls live at [base+200, base+600); a window over
    # the first 3 rounds keeps 3 Enter events
    w = ping_pong_trace.slice(
        processes=[0], names=["MPI_Recv"], t_min=0, t_max=2000 + 3 * 1000
    )
    n_enter = w.events.filter(
        F.col(S.EVENT_TYPE) == "Enter"
    ).count()
    assert n_enter == 3


def test_slow_calls_threshold_semantics(foo_bar_trace):
    """Every flagged call exceeds its function's exact p-quantile, and
    the flag set matches a hand-computed check over the same frame."""
    import numpy as np
    from pyspark.sql import functions as F

    out = foo_bar_trace.slow_calls(p=0.5).collect()
    calls = foo_bar_trace.matched.filter(
        (F.col(S.EVENT_TYPE) == "Enter") & (F.col(S.NAME) != "session")
    ).select(S.NAME, S.EVENT_ID, S.TIME_INC).collect()
    by_name = {}
    for r in calls:
        by_name.setdefault(r[S.NAME], []).append(r)
    expected = set()
    for name, rs in by_name.items():
        thr = round(float(np.percentile([r[S.TIME_INC] for r in rs], 50)), 6)
        expected |= {
            r[S.EVENT_ID] for r in rs if r[S.TIME_INC] > thr
        }
    assert {r[S.EVENT_ID] for r in out} == expected
    assert all(r[S.TIME_INC] > r["threshold"] for r in out)


def test_folded_stacks_golden(foo_bar_trace):
    """Flamegraph folded stacks on the foo-bar fixture: full callpath
    strings with per-context exclusive-time totals summed across both
    processes (FIXTURES.md §2 hand values)."""
    out = {r["stack"]: r["value"] for r in foo_bar_trace.folded_stacks().collect()}
    assert out["main()"] == (76 + 24) * NS
    assert out["main();foo()"] == 12 * NS
    assert out["main();foo();MPI_Send"] == 2 * NS
    assert out["main();bar()"] == 26 * NS
    assert out["main();grault()"] == 20 * NS
    # every stack is rooted at main() — paths, not bare frames
    assert all(s == "main()" or s.startswith("main();") for s in out)


def test_comm_by_function(ping_pong_trace):
    """Send volume attributed to the enclosing call: every MpiSend in
    the ping-pong trace fires inside an MPI_Send call — both ranks' 8
    messages land under that one function."""
    rows = {r["function"]: r["volume"]
            for r in ping_pong_trace.comm_by_function(output="size").collect()}
    assert rows == {"MPI_Send": 2 * 4_177_920.0}
    counts = {r["function"]: r["volume"]
              for r in ping_pong_trace.comm_by_function(output="count").collect()}
    assert counts == {"MPI_Send": 16.0}


def test_comm_by_function_recv(ping_pong_trace):
    """Receive-side attribution: every MpiRecv fires inside MPI_Recv."""
    rows = {r["function"]: r["volume"]
            for r in ping_pong_trace.comm_by_function(
                output="count", message_type="recv"
            ).collect()}
    assert rows == {"MPI_Recv": 16.0}


def test_comm_locality(ping_pong_trace):
    """Ping-pong is rank 0 <-> 1 only: block_size=2 puts all volume in
    one block (locality 1.0), block_size=1 makes it all remote (0.0)."""
    one_block = ping_pong_trace.comm_locality(block_size=2).collect()[0]
    assert one_block["locality"] == 1.0
    assert one_block["total_volume"] == 2 * 4_177_920.0
    remote = ping_pong_trace.comm_locality(block_size=1).collect()[0]
    assert remote["locality"] == 0.0
