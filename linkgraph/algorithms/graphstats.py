"""Whole-graph structural statistics: reciprocity and degree assortativity.

Beyond the reference's per-node centralities (reference-adjacent anchors:
`algo/.../TriangleProc.java` exposes the analogous whole-graph clustering
coefficient; GDS's successor ships both of these as graph metrics) — the
one-row summary statistics link-graph analyses report first.

Scale shape: reciprocity is one self-equi-join on the (dst, src) key plus
two scalar counts; assortativity is two degree aggregations joined back
onto the edge list (shuffles keyed on src then dst, both already the
edge-table partition keys) folded into a single built-in ``corr``. No
UDFs, no driver-side iteration — everything whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reciprocity(edges: DataFrame, ndigits: int = 6) -> DataFrame:
    """→ one row (n_edges, n_reciprocal, reciprocity): the fraction of
    directed edges (src, dst) whose reverse (dst, src) is also present.
    Expects a deduplicated directed edge list without self-loops (both
    guaranteed by `queries.doc_edges`; `Graph.from_edges` dedups too).
    """
    e = edges.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(
            recip.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
        )
        .select(
            "n_edges",
            "n_reciprocal",
            F.round(F.col("n_reciprocal") / F.col("n_edges"), ndigits).alias(
                "reciprocity"
            ),
        )
    )


def degree_histogram(edges: DataFrame, direction: str = "out") -> DataFrame:
    """→ (bucket, n_nodes, min_degree, max_degree): log2-bucketed degree
    distribution (bucket b covers degrees [2^b, 2^b+1)), the first plot of
    any web-graph power-law analysis. Bucket index is computed as the
    bit length of the integer degree (``length(bin(d)) − 1``) — exact in
    integer arithmetic, immune to the float-log2-at-powers-of-two pitfall,
    and expressible identically in ANSI SQL. One groupBy on the edge key +
    one tiny groupBy on ≤64 buckets; no UDFs.
    """
    key = "src" if direction == "out" else "dst"
    deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.select((F.length(F.bin(F.col("d"))) - 1).cast("long").alias("bucket"), "d")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("d").cast("long").alias("min_degree"),
            F.max("d").cast("long").alias("max_degree"),
        )
    )


def degree_assortativity(edges: DataFrame, ndigits: int = 6) -> DataFrame:
    """→ one row (assortativity): Pearson correlation, over directed
    edges, of the source's out-degree with the destination's in-degree
    (Newman 2002's out-in degree assortativity; negative on hub-dominated
    link graphs). Sample correlation — matches ANSI-SQL ``CORR``.
    """
    e = edges.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    per_edge = e.join(outdeg, "src").join(indeg, "dst")
    return per_edge.agg(
        F.round(F.corr(F.col("od").cast("double"), F.col("idg").cast("double")), ndigits).alias(
            "assortativity"
        )
    )
