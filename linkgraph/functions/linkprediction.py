"""Link-prediction functions — `algo.linkprediction.*`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/LinkPredictionFunc.java`
(@UserFunction scalars: adamicAdar, resourceAllocation, commonNeighbors,
preferentialAttachment, totalNeighbors, sameCommunity).

The reference evaluates these per node-pair against the live store; the
Spark-native form is a **batch table function**: given a pair table
(src, dst), produce all scores at once via joins on the undirected
adjacency — the same math, set-oriented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _undirected_adj(graph: Graph) -> DataFrame:
    e = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


# the previous call's cached adjacency: unpersisted (lazily — consumers
# just recompute) when the next call arrives, so repeated calls hold at
# most ONE cached adjacency instead of leaking one per call
_last_adj: DataFrame | None = None


def link_prediction_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """pairs(src, dst) → (src, dst, common_neighbors, total_neighbors,
    adamic_adar, resource_allocation, preferential_attachment).

    Join-based common-neighbor table; degrees from the undirected view.
    """
    global _last_adj
    if _last_adj is not None:
        _last_adj.unpersist()
    adj = _undirected_adj(graph).persist()
    _last_adj = adj
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))

    n1 = adj.select(F.col("src").alias("p_src"), F.col("dst").alias("z"))
    n2 = adj.select(F.col("src").alias("p_dst"), F.col("dst").alias("z"))
    commons = (
        pairs.join(n1, pairs.src == n1.p_src)
        .join(n2, (pairs.dst == n2.p_dst) & (n1.z == n2.z))
        .select("src", "dst", n1.z.alias("z"))
    )
    zdeg = deg.select(F.col("id").alias("z"), F.col("deg").alias("zdeg"))
    common_scores = (
        commons.join(zdeg, "z")
        .groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log("zdeg")), 5).alias("adamic_adar"),
            F.round(F.sum(1.0 / F.col("zdeg")), 5).alias("resource_allocation"),
        )
    )
    dsrc = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    ddst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    return (
        pairs.join(common_scores, ["src", "dst"], "left")
        .join(dsrc, "src", "left")
        .join(ddst, "dst", "left")
        .select(
            "src",
            "dst",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            (
                F.coalesce("deg_src", F.lit(0))
                + F.coalesce("deg_dst", F.lit(0))
                - F.coalesce("common_neighbors", F.lit(0))
            ).alias("total_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias("resource_allocation"),
            (
                F.coalesce("deg_src", F.lit(0)) * F.coalesce("deg_dst", F.lit(0))
            ).alias("preferential_attachment"),
        )
    )


def same_community(pairs_with_labels: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """`algo.linkprediction.sameCommunity` — 1.0 iff both labels equal."""
    return pairs_with_labels.withColumn(
        "same_community", (F.col(a_col) == F.col(b_col)).cast("double")
    )
