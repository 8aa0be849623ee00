"""Calling-context tree as a DataFrame (reference pipit/graph.py:7-98,
pipit/util/cct.py:9-118).

The reference builds an object graph of ``Node``s keyed by callpath
string and stores node references in an object column. Here the CCT is a
small node TABLE (node_id, parent_node_id, depth, name) derived from the
matched frame's hash-chained ``node_id`` — distributed, joinable, and
LCA-computable via path prefixes without any driver-side object graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import schema as S


def create_cct(matched: DataFrame) -> DataFrame:
    """Distinct calling-context nodes. The matched frame already carries
    ``node_id`` and ``parent_node_id`` (stable md5 hash chain over the
    name path, replacing the reference's dict of callpath strings,
    pipit/util/cct.py:73-93) — a tiny result even for huge traces
    (node count ≪ event count)."""
    # the kernel emits each event's own node id AND its caller's — so the
    # node table is one distinct with map-side partial aggregation (the
    # pre-shuffle combiner reduces every partition to its node set before
    # anything hits the wire); no self-join over the event frame
    return (
        matched.filter(
            F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES)
            & F.col(S.NODE_ID).isNotNull()
        )
        .select(
            S.NODE_ID,
            F.col(S.PARENT_NODE).alias("parent_node_id"),
            F.col(S.DEPTH).alias("depth"),
            S.NAME,
        )
        .dropDuplicates([S.NODE_ID])
    )
