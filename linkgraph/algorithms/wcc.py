"""Weakly connected components — `algo.unionFind` (+ variants).

Reference: `algo/src/main/java/org/neo4j/graphalgo/UnionFindProc.java`,
`algo/.../impl/unionfind/{GraphUnionFind,ParallelUnionFind*}.java`,
`core/.../core/utils/dss/DisjointSetStruct.java` (path-halving union-find).

A shared-memory DSS doesn't distribute; the Spark-native equivalent is the
**alternating large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond"): each round rewires every
node's larger neighbors (large-star) then its smaller neighbors
(small-star) onto the minimum of the local neighborhood. Provably
O(log² n) rounds on ANY topology — unlike plain hash-min label
propagation, which needs O(diameter) rounds and degrades catastrophically
on chain-shaped graphs (spanning trees, paths; measured 100+ rounds on a
500-node tree before this rewrite).

Component id = **min original node id in the component** — canonical and
stable, unlike the reference's arbitrary DSS roots (its tests assert
membership/sizes, not ids; SURVEY.md §7 hard-part 5).

``threshold`` pre-filters edges by weight (> t joins components), exactly
the reference's `threshold` config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.io import CheckpointManager


def _symmetrize(e: DataFrame) -> DataFrame:
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star(e: DataFrame, large: bool) -> DataFrame:
    """One large-star (attach strictly-larger neighbors to the local min) or
    small-star (attach smaller-or-equal neighbors + self to the local min)
    operation over a symmetric edge set."""
    m = e.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    j = e.join(m, "u")
    if large:
        out = j.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            j.filter(F.col("v") < F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
        )
    return _symmetrize(out)


def _fingerprint(e: DataFrame) -> tuple:
    # hash the DIRECTED pair: the symmetric set holds (u,v) AND (v,u), so a
    # canonical (least,greatest) hash would appear twice and XOR to zero
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return row["n"], row["h"]


def wcc(
    graph: Graph,
    threshold: float | None = None,
    max_iterations: int = 100,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """→ (id, component) with component = min member id. Exact at fixpoint."""
    edges = graph.edges
    if threshold is not None:
        edges = edges.filter(F.col("weight") > threshold)
    e = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    nodes = graph.nodes.select("id").persist()

    start = 0
    if checkpoint is not None:
        latest = checkpoint.latest(fmt="wcc/edges-v2")
        if latest is not None:
            start, e, _ = latest
    e = e.localCheckpoint(eager=True)

    # r6 hybrid crossover (union_find_mapping's documented contract): the
    # symmetrized edge list is materialized anyway, so one cheap count
    # routes driver-sized graphs through numpy union-find — identical
    # min-member-id labels, zero fixpoint rounds (each large/small-star
    # round costs ~6 jobs of fixed scheduler overhead). The distributed
    # Kiveris fixpoint below is unchanged and remains the at-scale path
    # (and the only path under checkpoint/resume).
    from linkgraph.algorithms.blocks import DRIVER_EDGE_THRESHOLD

    if checkpoint is None and e.count() <= 2 * DRIVER_EDGE_THRESHOLD:
        mapping = union_find_mapping(e.filter(F.col("u") < F.col("v")))
        out = (
            nodes.join(mapping, "id", "left")
            .select("id", F.coalesce("component", F.col("id")).alias("component"))
        )
        nodes.unpersist()
        out.iterations = 1  # one exact union-find pass (stats rows expect ≥ 1)
        out.did_converge = True
        return out

    prev_fp = _fingerprint(e)

    step = start
    converged = False
    while step < max_iterations:
        step += 1
        e = _star(e, large=True).localCheckpoint(eager=True)
        e = _star(e, large=False).localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if checkpoint is not None and checkpoint_every and step % checkpoint_every == 0:
            e = checkpoint.write(e, step, {"iteration": step}, fmt="wcc/edges-v2")
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp

    # fixpoint is a star forest: component(u) = min(u, neighbors)
    labels = e.groupBy(F.col("u").alias("id")).agg(
        F.least(F.col("id"), F.min("v")).alias("component")
    )
    out = (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    nodes.unpersist()
    out.iterations = step
    out.did_converge = converged
    return out


def union_find_mapping(pairs_df: DataFrame, spark=None) -> DataFrame:
    """Driver-side union-find over a DRIVER-SIZED pair DataFrame (src, dst)
    → broadcastable mapping (id, component), component = min member id.

    The hybrid small-side of the Kiveris WCC: contraction graphs (Borůvka
    merge rounds, cut spanning trees, Louvain coarsenings) shrink
    geometrically, and once they fit on the driver a numpy union-find
    replaces ~10 distributed fixpoint jobs. Callers must bound the input
    (count it first); the distributed `wcc` stays the path at scale.
    """
    import numpy as np
    import pandas as pd

    spark = spark or pairs_df.sparkSession
    pdf = pairs_df.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], "id long, component long")
    pairs = pdf.to_numpy(dtype=np.int64)
    uniq, inv = np.unique(pairs, return_inverse=True)
    inv = inv.reshape(pairs.shape)
    a_idx, b_idx = inv[:, 0], inv[:, 1]
    # r6: vectorized iterated min-label + pointer jumping (the numpy form
    # of hash-min; a per-pair Python find/union loop was the bottleneck at
    # ~1M pairs). Labels are indices into the SORTED uniq array, start at
    # self, and only ever decrease, so label chases are valid pointer
    # jumps and the fixpoint label is the index of the component's min id.
    label = np.arange(len(uniq))
    while True:
        before = label.copy()
        np.minimum.at(label, a_idx, label[b_idx])
        np.minimum.at(label, b_idx, label[a_idx])
        label = label[label]
        label = label[label]
        if np.array_equal(label, before):
            break
    return F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"id": uniq, "component": uniq[label]})
        )
    )


def wcc_stats(components: DataFrame) -> DataFrame:
    """Write-mode summary row: communityCount + size percentiles.

    Reference builds these with HdrHistogram in `algo/.../results/*`.
    """
    sizes = components.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("communityCount"),
        F.max("size").alias("maxSetSize"),
        F.min("size").alias("minSetSize"),
        F.expr("percentile_approx(size, array(0.5,0.75,0.9,0.95,0.99))").alias("percentiles"),
    )
