"""Driver-side object view of the calling-context tree.

The engine's CCT is a distributed node TABLE (operators/cct.py); this
module materializes it into linked ``CCTNode`` objects for the
traversal-style consumers the reference serves with its ``Node`` /
``Graph`` classes (reference pipit/graph.py:7-98 — same observable
semantics: per-node level, least-common-ancestor, root list). Safe to
collect: the node table is vocabulary-sized (distinct call paths), not
event-sized, so even a 100 TB trace yields a small graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CCTNode:
    """One calling context: a name reached through a specific call path.

    ``level`` comes straight from the node table's ``depth`` column —
    no recursive recomputation. Equality is by node id (the md5 hash
    chain over the name path), mirroring the reference's id-based
    ``__eq__`` (pipit/graph.py:81-85).
    """

    __slots__ = ("node_id", "name", "level", "parent", "children")

    def __init__(self, node_id: str, name: str, level: int,
                 parent: "CCTNode | None" = None) -> None:
        self.node_id = node_id
        self.name = name
        self.level = level
        self.parent = parent
        self.children: list[CCTNode] = []

    def get_level(self) -> int:
        return self.level

    def get_node_list(self, min_level: int) -> list["CCTNode"]:
        """This node's ancestry, deepest first, stopping at (and
        excluding) ``min_level`` — reference pipit/graph.py:57-68."""
        out, cur = [], self
        while cur is not None and cur.level > min_level:
            out.append(cur)
            cur = cur.parent
        return out

    def get_intersection(self, other: "CCTNode | None") -> "CCTNode | None":
        """Least common ancestor, or None when the two nodes live under
        different roots — reference pipit/graph.py:31-54."""
        if other is None:
            return None
        a, b = self, other
        while a is not None and a.level > b.level:
            a = a.parent
        while b is not None and a is not None and b.level > a.level:
            b = b.parent
        while a is not None and b is not None and a != b:
            a, b = a.parent, b.parent
        return a

    def __eq__(self, other: object) -> bool:
        return isinstance(other, CCTNode) and other.node_id == self.node_id

    def __hash__(self) -> int:
        return hash(self.node_id)

    def __repr__(self) -> str:
        return f"CCTNode({self.name!r}, level={self.level})"


class CCTGraph:
    """The collected tree: root list plus an id → node index."""

    def __init__(self) -> None:
        self.roots: list[CCTNode] = []
        self._by_id: dict[str, CCTNode] = {}

    def node(self, node_id: str) -> CCTNode:
        return self._by_id[node_id]

    def __len__(self) -> int:
        return len(self._by_id)

    def __iter__(self):
        return iter(self._by_id.values())

    def __repr__(self) -> str:
        return f"CCTGraph(roots={[r.name for r in self.roots]}, n={len(self)})"


def cct_graph(cct: DataFrame) -> CCTGraph:
    """Materialize the distributed node table ``(node_id,
    parent_node_id, depth, name)`` into a linked CCTGraph. Two passes
    over the collected rows: create all nodes, then wire parents —
    no ordering assumption on the table."""
    rows = cct.collect()
    g = CCTGraph()
    for r in rows:
        g._by_id[r["node_id"]] = CCTNode(
            r["node_id"], r["name"], int(r["depth"])
        )
    for r in rows:
        node = g._by_id[r["node_id"]]
        pid = r["parent_node_id"]
        parent = g._by_id.get(pid) if pid is not None else None
        if parent is None:
            g.roots.append(node)
        else:
            node.parent = parent
            parent.children.append(node)
    return g
