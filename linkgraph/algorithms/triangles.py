"""Triangle counting — `algo.triangleCount` / `algo.triangle.stream`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/TriangleProc.java`,
`algo/.../impl/triangle/{TriangleStream,TriangleCountQueue,
IntersectingTriangleCount}.java`. There: forward-ordered adjacency
intersection per edge in shared memory. Here: the classic two-shuffle
self-join on canonical (src < dst) edges —

    wedges  = e(a,b) ⋈ e(a,c) on a, with b < c
    closed  = wedges ⋈ e(b,c)            → each triangle found exactly once

Per-node counts attribute each triangle to all three corners; local
clustering coefficient = 2·T(v) / (deg(v)·(deg(v)−1)) on the undirected
deduped degree, exactly the reference's formula; global count = Σ T(v) / 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _triangles(graph: Graph) -> DataFrame:
    """All triangles as (a, b, c) with a < b < c, each exactly once.

    Edges are oriented by DEGREE order (lower-(deg,id) endpoint → higher),
    and wedges pivot on the lower-degree corner: a hub of degree d
    contributes wedges only from its (few) higher-key out-neighbors, so
    wedge volume is bounded by Σ min-degree ≈ m·√m worst case instead of
    Σ deg² — the standard skew mitigation for the self-join formulation
    (id-ordering makes a small-id hub a deg² wedge bomb).
    """
    ce = graph.canonical_edges().select("src", "dst")
    deg = (
        ce.select(F.col("src").alias("id"))
        .unionByName(ce.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        ce.join(deg.select(F.col("id").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    ks = F.struct(F.col("ds").alias("d"), F.col("src").alias("i"))
    kd = F.struct(F.col("dd").alias("d"), F.col("dst").alias("i"))
    oriented = e.select(
        F.when(ks < kd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(ks < kd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(ks < kd, kd).otherwise(ks).alias("kv"),
    ).persist()
    o1 = oriented.select("u", F.col("v").alias("b"), F.col("kv").alias("kb"))
    o2 = oriented.select(F.col("u").alias("u2"), F.col("v").alias("c"), F.col("kv").alias("kc"))
    wedges = o1.join(o2, (o1.u == o2.u2) & (o1.kb < o2.kc)).select("u", "b", "c")
    o3 = oriented.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    tri = wedges.join(o3, (wedges.b == o3.b2) & (wedges.c == o3.c2))
    srt = F.array_sort(F.array("u", "b", "c"))
    return tri.select(
        srt.getItem(0).alias("a"), srt.getItem(1).alias("b"), srt.getItem(2).alias("c")
    )


def triangle_stream(graph: Graph) -> DataFrame:
    """`algo.triangle.stream` → (a, b, c) node-id triples, a < b < c."""
    return _triangles(graph)


def triangle_count(graph: Graph) -> DataFrame:
    """`algo.triangleCount.stream` → (id, triangles, coefficient)."""
    tri = _triangles(graph)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    per_node = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    ce = graph.canonical_edges()
    deg = (
        ce.select(F.col("src").alias("id"))
        .unionByName(ce.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        graph.nodes.select("id")
        .join(per_node, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )


def triangle_count_global(graph: Graph) -> DataFrame:
    """Write-mode summary: (triangleCount, averageClusteringCoefficient)."""
    per_node = triangle_count(graph)
    return per_node.agg(
        (F.sum("triangles") / 3).cast("long").alias("triangleCount"),
        F.avg("coefficient").alias("averageClusteringCoefficient"),
    )


def balanced_triads(graph: Graph) -> DataFrame:
    """`algo.balancedTriads` — signed-triangle balance per node.

    Reference: `algo/.../impl/triangle/BalancedTriads.java`. A triad is
    balanced iff the product of its three edge-weight signs is positive.
    → (id, balanced, unbalanced).
    """
    ce = (
        graph.canonical_edges()
        .select("src", "dst", F.signum("weight").alias("sign"))
        .persist()
    )
    e1 = ce.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("sign").alias("s1"))
    e2 = ce.select(F.col("src").alias("a2"), F.col("dst").alias("c"), F.col("sign").alias("s2"))
    wedges = e1.join(e2, (e1.a == e2.a2) & (e1.b < e2.c)).select("a", "b", "c", "s1", "s2")
    e3 = ce.select(F.col("src").alias("b2"), F.col("dst").alias("c2"), F.col("sign").alias("s3"))
    tri = wedges.join(e3, (wedges.b == e3.b2) & (wedges.c == e3.c2)).select(
        "a", "b", "c", (F.col("s1") * F.col("s2") * F.col("s3") > 0).alias("balanced")
    )
    corners = (
        tri.select(F.col("a").alias("id"), "balanced")
        .unionByName(tri.select(F.col("b").alias("id"), "balanced"))
        .unionByName(tri.select(F.col("c").alias("id"), "balanced"))
    )
    agg = corners.groupBy("id").agg(
        F.sum(F.col("balanced").cast("long")).alias("balanced"),
        F.sum((~F.col("balanced")).cast("long")).alias("unbalanced"),
    )
    return (
        graph.nodes.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("balanced", F.lit(0)).alias("balanced"),
            F.coalesce("unbalanced", F.lit(0)).alias("unbalanced"),
        )
    )
