"""HPCToolkit db source (reference pipit/readers/hpctoolkit_reader.py,
1378 LoC — a custom binary parser for meta.db / profile.db / trace.db
v4.0).

Spark shape (SURVEY §2.1): the small ``meta.db``/``profile.db`` are
parsed on the driver (context tree + profile identifier tuples,
hpctoolkit_reader.py:45-1020) and broadcast; each per-thread trace-line
block of ``trace.db`` fans out to executors where Enter/Leave events are
reconstructed from consecutive CCT samples by walking to their LCA and
emitting Leaves up / Enters down (hpctoolkit_reader.py:1194-1337; LCA
pipit/graph.py:31-55).

The full binary-format port is substantial and is staged for a later
round; the entry point exists so the API surface is complete, and the
LCA reconstruction kernel (the algorithmic heart) is implemented and
unit-tested against synthetic context trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def reconstruct_enter_leave(samples, parent_of, name_of):
    """Reconstruct Enter/Leave events from a per-thread sequence of
    (timestamp, cct_node) samples — the reference's core trick
    (hpctoolkit_reader.py:1194-1337).

    For consecutive samples at nodes A → B: emit Leave events walking A
    up to LCA(A, B), then Enter events walking down from LCA to B.
    Returns a list of (timestamp, event_type, name, node_id).
    """

    def path_to_root(n):
        out = []
        while n is not None and n >= 0:
            out.append(n)
            n = parent_of.get(n)
        return out  # leaf → root

    events = []
    prev_path: list[int] = []
    for ts, node in samples:
        path = path_to_root(node)[::-1]  # root → leaf
        # longest common prefix with previous callpath
        k = 0
        while k < len(prev_path) and k < len(path) and prev_path[k] == path[k]:
            k += 1
        for n in reversed(prev_path[k:]):
            events.append((ts, "Leave", name_of.get(n, str(n)), n))
        for n in path[k:]:
            events.append((ts, "Enter", name_of.get(n, str(n)), n))
        prev_path = path
    if prev_path:
        last_ts = samples[-1][0]
        for n in reversed(prev_path):
            events.append((last_ts, "Leave", name_of.get(n, str(n)), n))
    return events


def read_hpctoolkit(spark: SparkSession, dirname: str) -> DataFrame:
    raise NotImplementedError(
        "HPCToolkit binary-db parsing is staged for a later round; the "
        "Enter/Leave reconstruction kernel (reconstruct_enter_leave) is "
        "implemented and tested. Reference: pipit/readers/"
        "hpctoolkit_reader.py:1023-1337."
    )
