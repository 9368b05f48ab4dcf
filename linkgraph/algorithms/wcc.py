"""Weakly connected components — `algo.unionFind` (+ variants).

Reference: `algo/src/main/java/org/neo4j/graphalgo/UnionFindProc.java`,
`algo/.../impl/unionfind/{GraphUnionFind,ParallelUnionFind*}.java`,
`core/.../core/utils/dss/DisjointSetStruct.java` (path-halving union-find).

A shared-memory DSS doesn't distribute; the Spark-native equivalent is
iterative **hash-min label propagation with pointer jumping** (cf. Kiveris
et al., "Connected Components in MapReduce and Beyond"): each round every
node takes the min of its own label, its neighbors' labels, and its label's
label (pointer jump → O(log n) rounds), until a fixpoint.

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
    # undirected, deduped, no self-loops; symmetrize so one join covers both directions
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    nodes = graph.nodes.select("id").persist()

    labels = nodes.select("id", F.col("id").alias("comp"))
    start = 0
    if checkpoint is not None:
        latest = checkpoint.latest()
        if latest is not None:
            start, labels, _ = latest
    labels = labels.localCheckpoint(eager=True)

    step = start
    while step < max_iterations:
        step += 1
        # min over neighbors' labels
        nbr_min = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        m = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"))
        )
        # pointer jump: comp ← comp(comp)
        parent = m.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        # eager localCheckpoint: the self-join doubles the logical plan every
        # round — truncate lineage or Catalyst blows up (SURVEY.md §7 part 3)
        jumped = (
            m.join(parent, m.comp == parent.pid, "left")
            .select("id", F.coalesce("pcomp", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = jumped
        if checkpoint is not None and step % checkpoint_every == 0:
            labels = checkpoint.write(labels, step, {"iteration": step})
        if changed == 0:
            break

    und.unpersist()
    nodes.unpersist()
    return labels.select("id", F.col("comp").alias("component"))


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
