"""Degree centrality — `algo.degree`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/DegreeCentralityProc.java`,
`algo/.../impl/degree/DegreeCentrality.java`. One groupBy/agg; Catalyst
handles partial+final aggregation (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def degree_centrality(
    graph: Graph, direction: str = "INCOMING", weighted: bool = False
) -> DataFrame:
    """→ (id, score): in/out/both degree, or sum of weights when weighted."""
    return graph.degrees(direction=direction, weighted=weighted).select(
        "id", F.col("degree").alias("score")
    )
