"""Node lookup functions — `algo.asNode` / `algo.asNodes` / `algo.getNodesById`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/GetNodeFunc.java` — the
doc examples post-process every algorithm stream with these to rehydrate
node properties from ids. Spark form: broadcast-join back to the node table
(ids are a tiny dimension against a big result stream, so the join side is
the RESULT, not the node table — Catalyst broadcasts whichever is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def get_nodes_by_id(nodes: DataFrame, ids: list[int], id_col: str = "id") -> DataFrame:
    """`algo.getNodesById([ids])` → node rows for the given ids."""
    return nodes.filter(F.col(id_col).isin([int(i) for i in ids]))


def as_node(result: DataFrame, nodes: DataFrame, id_col: str = "id",
            result_id_col: str | None = None, prefix: str = "node_") -> DataFrame:
    """`algo.asNode(id)` — join node properties onto a result stream.

    Every node column except the id is attached with ``prefix``.
    """
    rid = result_id_col or id_col
    props = nodes.select(
        F.col(id_col).alias(rid),
        *[F.col(c).alias(f"{prefix}{c}") for c in nodes.columns if c != id_col],
    )
    return result.join(props, rid, "left")


def as_nodes(result: DataFrame, nodes: DataFrame, ids_col: str,
             id_col: str = "id", out_col: str | None = None) -> DataFrame:
    """`algo.asNodes([ids])` — rehydrate an ARRAY column of node ids into an
    array of property structs (explode → join → re-collect, order kept)."""
    out = out_col or f"{ids_col}_nodes"
    # posexplode_outer keeps rows whose ids array is empty/null (they come
    # back with an empty node array instead of being silently dropped)
    exploded = result.withColumn("_pos", F.monotonically_increasing_id()).select(
        "*", F.posexplode_outer(ids_col)
    ).withColumnRenamed("col", "_nid").withColumnRenamed("pos", "_ord")
    props = nodes.select(
        F.col(id_col).alias("_nid"),
        F.struct(*[F.col(c) for c in nodes.columns]).alias("_node"),
    )
    joined = exploded.join(props, "_nid", "left")
    group_cols = [c for c in result.columns] + ["_pos"]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(  # NULL entries (empty arrays) skipped
                        F.when(
                            F.col("_ord").isNotNull(), F.struct("_ord", "_node")
                        )
                    )
                ),
                lambda s: s["_node"],
            ).alias(out)
        )
        .drop("_pos")
    )
