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
    ``node_id`` (stable md5 hash chain over the name path, replacing the
    reference's dict of callpath strings, pipit/util/cct.py:73-93); this
    joins each node to its parent's node id and dedups — a tiny result
    even for huge traces (node count ≪ event count)."""
    enters = matched.filter(
        F.col(S.EVENT_TYPE).isin(*S.ENTER_TYPES) & F.col(S.NODE_ID).isNotNull()
    )
    nodes = enters.select(S.NODE_ID, S.DEPTH, S.NAME, S.PARENT).dropDuplicates(
        [S.NODE_ID]
    )
    parents = enters.select(
        F.col(S.EVENT_ID).alias("__pe"), F.col(S.NODE_ID).alias("parent_node_id")
    ).dropDuplicates(["__pe"])
    return (
        nodes.join(parents, nodes[S.PARENT] == parents["__pe"], "left")
        .select(
            S.NODE_ID,
            "parent_node_id",
            F.col(S.DEPTH).alias("depth"),
            S.NAME,
        )
        .dropDuplicates([S.NODE_ID])
    )
