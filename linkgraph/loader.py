"""Typed graph projection — the reference's GraphLoader builder.

Reference: `core/src/main/java/org/neo4j/graphalgo/core/GraphLoader.java`
(`withLabel`, `withRelationshipType`, `withDirection`,
`withRelationshipWeightsFromProperty`, `duplicateRelationships`) and the
Cypher projection path (`core/heavyweight/HeavyCypherGraphFactory.java`).

Spark-first mapping: every filter is a Column predicate applied BEFORE the
Graph is materialized, so Catalyst pushes label/type predicates into the
parquet/Iceberg scan (check `.explain()` → `PushedFilters`). The induced
subgraph (edges whose endpoints both survive the node filter) is two
semi-joins against the filtered node-id set — at scale the node table is
orders of magnitude smaller than the edge table, and AQE converts the
semi-join to a broadcast join when the filtered set is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.graph import OUTGOING, Graph


def _pred(p) -> Column:
    """Accept a Column or a SQL-string predicate."""
    return F.expr(p) if isinstance(p, str) else p


class GraphLoader:
    """Builder for a typed, filtered Graph projection.

    Usage (mirrors the reference's fluent loader)::

        g = (GraphLoader()
             .with_nodes(docs, id_col="doc_id", label_col="lang")
             .with_relationships(edges, type_col="rel_type")
             .with_label("en")
             .with_relationship_type("cites")
             .with_direction("BOTH")
             .with_relationship_weights_from_property("weight", 1.0)
             .load())
    """

    def __init__(self) -> None:
        self._nodes: DataFrame | None = None
        self._node_id = "id"
        self._label_col: str | None = None
        self._edges: DataFrame | None = None
        self._src = "src"
        self._dst = "dst"
        self._type_col: str | None = None
        self._labels: list | None = None
        self._types: list | None = None
        self._node_pred: Column | None = None
        self._edge_pred: Column | None = None
        self._direction = OUTGOING
        self._weight_prop: str | None = "weight"
        self._default_weight = 1.0
        self._dedup = "none"

    # ------------------------------------------------------------- inputs
    def with_nodes(
        self, nodes: DataFrame, *, id_col: str = "id", label_col: str | None = None
    ) -> "GraphLoader":
        self._nodes, self._node_id, self._label_col = nodes, id_col, label_col
        return self

    def with_relationships(
        self,
        edges: DataFrame,
        *,
        src: str = "src",
        dst: str = "dst",
        type_col: str | None = None,
    ) -> "GraphLoader":
        self._edges, self._src, self._dst, self._type_col = edges, src, dst, type_col
        return self

    # ------------------------------------------------------------ filters
    def with_label(self, *labels) -> "GraphLoader":
        """Keep only nodes whose label_col is in `labels` (loader withLabel)."""
        self._labels = list(labels)
        return self

    def with_relationship_type(self, *types) -> "GraphLoader":
        """Keep only edges whose type_col is in `types` (withRelationshipType)."""
        self._types = list(types)
        return self

    def with_node_predicate(self, pred) -> "GraphLoader":
        """Arbitrary Column/SQL predicate over node property columns."""
        self._node_pred = _pred(pred)
        return self

    def with_edge_predicate(self, pred) -> "GraphLoader":
        self._edge_pred = _pred(pred)
        return self

    # ------------------------------------------------------------- config
    def with_direction(self, direction: str) -> "GraphLoader":
        self._direction = direction
        return self

    def with_relationship_weights_from_property(
        self, prop: str | None, default: float = 1.0
    ) -> "GraphLoader":
        self._weight_prop, self._default_weight = prop, float(default)
        return self

    def with_duplicate_relationships(self, strategy: str) -> "GraphLoader":
        self._dedup = strategy
        return self

    # --------------------------------------------------------------- load
    def load(self) -> Graph:
        if self._edges is None:
            raise ValueError("with_relationships() is required")
        edges = self._edges
        if self._types is not None:
            if self._type_col is None:
                raise ValueError("with_relationship_type needs type_col")
            edges = edges.filter(F.col(self._type_col).isin(self._types))
        if self._edge_pred is not None:
            edges = edges.filter(self._edge_pred)

        nodes = self._nodes
        if nodes is not None:
            if self._labels is not None:
                if self._label_col is None:
                    raise ValueError("with_label needs label_col")
                nodes = nodes.filter(F.col(self._label_col).isin(self._labels))
            if self._node_pred is not None:
                nodes = nodes.filter(self._node_pred)
            ids = nodes.select(F.col(self._node_id).cast("long").alias("id"))
            # induced subgraph: both endpoints must survive the node filter
            if self._labels is not None or self._node_pred is not None:
                edges = edges.join(
                    ids.select(F.col("id").alias(self._src)), self._src, "left_semi"
                ).join(ids.select(F.col("id").alias(self._dst)), self._dst, "left_semi")
            node_df = ids
        else:
            node_df = None

        return Graph.from_edges(
            edges,
            nodes=node_df,
            src=self._src,
            dst=self._dst,
            weight=self._weight_prop,
            default_weight=self._default_weight,
            duplicate_relationships=self._dedup,
            direction=self._direction,
        )


def subgraph(g: Graph, node_pred=None, edge_pred=None) -> Graph:
    """Induced subgraph of an already-projected Graph.

    node_pred filters g.nodes (property columns allowed); edges are
    restricted to pairs whose BOTH endpoints survive (two semi-joins).
    """
    nodes, edges = g.nodes, g.edges
    if node_pred is not None:
        nodes = nodes.filter(_pred(node_pred))
        ids = nodes.select("id")
        edges = edges.join(ids.select(F.col("id").alias("src")), "src", "left_semi").join(
            ids.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
    if edge_pred is not None:
        edges = edges.filter(_pred(edge_pred))
    return Graph(nodes=nodes, edges=edges, directed=g.directed)
