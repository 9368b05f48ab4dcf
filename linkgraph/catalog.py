"""Named graph catalog — `algo.graph.load/info/remove/list`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/LoadGraphProc.java` +
`core/.../core/loading/LoadGraphFactory.java`: load a projection once under
a name, reuse it across procedure calls, inspect and evict.

Spark-native form: persisted (MEMORY_AND_DISK) nodes/edges DataFrames in a
session-scoped registry, optionally spilled to parquet for cross-session
reuse.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from linkgraph.graph import Graph


@dataclass
class _Entry:
    graph: Graph
    loaded_at: float
    nodes: int = -1
    edges: int = -1


@dataclass
class GraphCatalog:
    _graphs: dict[str, _Entry] = field(default_factory=dict)

    def load(self, name: str, graph: Graph, eager: bool = True) -> Graph:
        """`algo.graph.load(name, ...)` — persist + register under a name."""
        graph.nodes.persist(StorageLevel.MEMORY_AND_DISK)
        graph.edges.persist(StorageLevel.MEMORY_AND_DISK)
        entry = _Entry(graph=graph, loaded_at=time.time())
        if eager:
            entry.nodes = graph.nodes.count()
            entry.edges = graph.edges.count()
        self._graphs[name] = entry
        return graph

    def get(self, name: str) -> Graph:
        return self._graphs[name].graph

    def __contains__(self, name: str) -> bool:
        return name in self._graphs

    def info(self, name: str) -> dict:
        """`algo.graph.info(name)` — load stats row."""
        e = self._graphs[name]
        return {
            "name": name,
            "nodes": e.nodes,
            "relationships": e.edges,
            "loaded_at": e.loaded_at,
        }

    def list(self) -> list[dict]:
        """`algo.graph.list()`."""
        return [self.info(n) for n in sorted(self._graphs)]

    def remove(self, name: str) -> bool:
        """`algo.graph.remove(name)` — unpersist + drop."""
        e = self._graphs.pop(name, None)
        if e is None:
            return False
        e.graph.nodes.unpersist()
        e.graph.edges.unpersist()
        return True

    def save(self, name: str, path: str) -> None:
        """Spill a named graph to parquet tables (cross-session reuse)."""
        g = self.get(name)
        g.nodes.write.mode("overwrite").parquet(f"{path}/nodes")
        g.edges.write.mode("overwrite").parquet(f"{path}/edges")

    def load_from(self, spark, name: str, path: str) -> Graph:
        g = Graph(
            nodes=spark.read.parquet(f"{path}/nodes"),
            edges=spark.read.parquet(f"{path}/edges"),
        )
        return self.load(name, g)


_DEFAULT: GraphCatalog | None = None


def default_catalog() -> GraphCatalog:
    """Process-wide catalog instance backing `procs.call('algo.graph.*')`."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = GraphCatalog()
    return _DEFAULT
