"""Graph abstraction — the Spark analogue of the reference's Graph API.

Reference: `core/src/main/java/org/neo4j/graphalgo/api/Graph.java`
(IdMapping + Degrees + RelationshipIterator + RelationshipWeights) and the
heavy/huge in-memory projections (`core/.../heavyweight/HeavyGraph.java`,
`core/.../huge/HugeGraph.java`). There the graph is a shared-memory CSR
snapshot; here it is a pair of DataFrames:

    nodes(id: long, ...optional property columns)
    edges(src: long, dst: long, weight: double)

Direction (`OUTGOING`/`INCOMING`/`BOTH`, kernel `org.neo4j.graphdb.Direction`)
and parallel-load relationship dedup (`DuplicateRelationshipsStrategy`:
skip/sum/min/max/none) are re-expressed as DataFrame transformations.
CSR materialization happens later, per-partition, inside Arrow UDFs
(linkgraph.algorithms.blocks) — the analogue of HugeAdjacencyList.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

OUTGOING = "OUTGOING"
INCOMING = "INCOMING"
BOTH = "BOTH"

_DEDUP_AGGS = {
    "skip": lambda: F.first("weight"),
    "sum": lambda: F.sum("weight"),
    "min": lambda: F.min("weight"),
    "max": lambda: F.max("weight"),
}


@dataclass
class Graph:
    """Immutable projected graph: ``nodes(id, ...)`` + ``edges(src, dst, weight)``."""

    nodes: DataFrame
    edges: DataFrame
    directed: bool = True
    _degrees: DataFrame | None = field(default=None, repr=False, compare=False)

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        *,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = "weight",
        default_weight: float = 1.0,
        duplicate_relationships: str = "none",
        direction: str = OUTGOING,
    ) -> "Graph":
        """Project a Graph from an arbitrary edge DataFrame.

        Mirrors `GraphLoader.withRelationshipWeightsFromProperty(prop,
        defaultValue)` + `withDirection` + `duplicateRelationships` config
        (core/GraphLoader.java, core/DuplicateRelationshipsStrategy.java).
        """
        cols = [F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")]
        if weight is not None and weight in edges.columns:
            cols.append(
                F.coalesce(F.col(weight).cast("double"), F.lit(float(default_weight))).alias(
                    "weight"
                )
            )
        else:
            cols.append(F.lit(float(default_weight)).alias("weight"))
        e = edges.select(*cols)

        if direction == INCOMING:
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")

        if direction == BOTH:
            if duplicate_relationships == "skip":
                # 'skip' (keep-first) is an arbitrary pick — applying it over
                # the symmetrized union could pick DIFFERENT survivors for
                # (a,b) and (b,a). Pick per original orientation first, then
                # symmetrize with the deterministic max tie-break so both
                # directions always agree.
                e = e.groupBy("src", "dst").agg(F.first("weight").alias("weight"))
            rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            if duplicate_relationships in ("sum", "min", "max"):
                # The explicit strategy governs ALL parallel relationships —
                # including the reciprocal copies symmetrization introduces.
                # One agg over the union equals "strategy on parallels, then
                # strategy across reciprocals" (sum/min/max are associative).
                agg = _DEDUP_AGGS[duplicate_relationships]
                e = e.unionByName(rev).groupBy("src", "dst").agg(agg().alias("weight"))
            else:
                # No strategy: reciprocal edges (a,b,w1)/(b,a,w2) must still
                # resolve to the same weight on both directions — max as the
                # deterministic tie-break, not an arbitrary surviving row
                # (dropDuplicates is partition-order dependent).
                e = (
                    e.unionByName(rev)
                    .groupBy("src", "dst")
                    .agg(F.max("weight").alias("weight"))
                )
        elif duplicate_relationships != "none":
            agg = _DEDUP_AGGS[duplicate_relationships]
            e = e.groupBy("src", "dst").agg(agg().alias("weight"))

        if nodes is None:
            nodes = (
                e.select(F.col("src").alias("id"))
                .unionByName(e.select(F.col("dst").alias("id")))
                .distinct()
            )
        else:
            nodes = nodes.withColumn("id", F.col("id").cast("long"))
        return cls(nodes=nodes, edges=e, directed=(direction != BOTH))

    # ------------------------------------------------------------------ views
    def undirected_edges(self) -> DataFrame:
        """Both-direction view, deduped — the loader's `Direction.BOTH`."""
        e = self.edges
        if not self.directed:
            return e
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        # deterministic dedup (see from_edges BOTH): groupBy.max, symmetric
        return (
            e.unionByName(rev).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        )

    def canonical_edges(self) -> DataFrame:
        """Undirected edges canonicalized to src < dst (drops self-loops).

        The triangle pipeline's forward-ordered adjacency
        (impl/triangle/IntersectingTriangleCount.java reads neighbors > node).
        """
        e = self.edges.filter(F.col("src") != F.col("dst"))
        return (
            e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )

    # ---------------------------------------------------------------- degrees
    def degrees(self, direction: str = OUTGOING, weighted: bool = False) -> DataFrame:
        """(id, degree) — reference `Degrees` API / impl/degree/DegreeCentrality.java."""
        if direction == BOTH:
            e = self.undirected_edges()
            key = "src"
        elif direction == INCOMING:
            e, key = self.edges, "dst"
        else:
            e, key = self.edges, "src"
        agg = F.sum("weight") if weighted else F.count(F.lit(1))
        deg = e.groupBy(F.col(key).alias("id")).agg(agg.cast("double").alias("degree"))
        return (
            self.nodes.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    def num_nodes(self) -> int:
        return self.nodes.count()

    def num_edges(self) -> int:
        return self.edges.count()

    def persist(self) -> "Graph":
        self.nodes.persist()
        self.edges.persist()
        return self
