"""Graph contraction: collapse an edge list onto a node→group mapping.

The host/domain rollup every web-scale link-graph pipeline performs
(page→page links contracted to host→host; in the north star's terms,
file→file import edges contracted to repo→repo — `linkgraph.mining.
repo_dependency_graph` is the specialised form of this operator).
Reference-adjacent anchor: Louvain's coarsening step
(`algo/.../impl/louvain/Louvain.java`) builds exactly this community-level
multigraph internally; here it is exposed as a standalone operator.

Scale shape: two shuffle joins keyed on the edge endpoints (the edge
table's natural keys) followed by one map-side-combining groupBy on the
(group, group) pair. The mapping side is joined as-is — at n-node scale it
shuffles; when the mapping is small (host tables usually are after the
first rollup) Catalyst/AQE broadcast it automatically. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def contract_edges(
    edges: DataFrame,
    mapping: DataFrame,
    id_col: str = "id",
    group_col: str = "group",
    weight_col: str | None = None,
    drop_self_loops: bool = True,
) -> DataFrame:
    """→ (src_group, dst_group, n_edges, weight): the group-level
    multigraph. `mapping` is (id_col, group_col); endpoints not present in
    the mapping drop out (inner joins — a contraction over a partial
    mapping is a subgraph contraction). `weight` sums `weight_col` when
    given, else equals `n_edges`.
    """
    m_src = mapping.select(
        F.col(id_col).alias("src"), F.col(group_col).alias("src_group")
    )
    m_dst = mapping.select(
        F.col(id_col).alias("dst"), F.col(group_col).alias("dst_group")
    )
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    out = (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .groupBy("src_group", "dst_group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(w.cast("double")).alias("weight"),
        )
    )
    if drop_self_loops:
        out = out.filter(F.col("src_group") != F.col("dst_group"))
    return out
