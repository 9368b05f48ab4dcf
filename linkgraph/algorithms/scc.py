"""Strongly connected components — `algo.scc` (+ iterative variants).

Reference: `algo/.../impl/scc/{SCCTarjan,SCCIterativeTarjan,SCCTunedTarjan}.java`,
`algo/.../impl/multistep/MultistepSCC.java`.

Two paths:

* ``scc`` — distributed **forward-backward coloring** (Fleischer et al. /
  ColorSCC, the MultistepSCC approach): trim trivial SCCs, propagate the
  max node id forward to a fixpoint (every node takes the color of its
  highest-id reachable ancestor), then ONE multi-source backward BFS from
  all color roots restricted to same-color nodes extracts the root's
  entire SCC for EVERY color simultaneously — many SCCs removed per outer
  round, O(log n)-ish expected rounds instead of O(#SCC) single-pivot
  peeling; components labeled by min member id.
* ``scc_tarjan`` — exact driver-side iterative Tarjan over collected CSR
  for modest graphs (the reference's default is also single-threaded).
  The contract and tests run the distributed ``scc``.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def scc(graph: Graph, max_rounds: int = 10_000) -> DataFrame:
    """→ (id, component): forward-backward coloring, min-member-id labels."""
    edges = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").persist()
    redges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")).persist()
    spark = graph.nodes.sparkSession
    active = graph.nodes.select("id").localCheckpoint(eager=True)
    result = spark.createDataFrame([], "id long, component long")
    rounds = 0
    converged = False
    while rounds < max_rounds:
        rounds += 1
        # trim trivial SCCs to a FIXPOINT: repeatedly peel nodes with no
        # in- or out-edge within active (clears whole DAG tails/chains in
        # one outer round instead of one layer per round)
        while True:
            srcs = edges.join(active.withColumnRenamed("id", "src"), "src").join(
                active.withColumnRenamed("id", "dst"), "dst"
            )
            has_out = srcs.select(F.col("src").alias("id")).distinct()
            has_in = srcs.select(F.col("dst").alias("id")).distinct()
            # checkpoint ONCE, then every emptiness probe / anti-join below
            # reads the materialized table instead of re-running the joins
            nontrivial = (
                active.join(has_out, "id").join(has_in, "id")
                .localCheckpoint(eager=True)
            )
            if nontrivial.count() == active.count():  # both checkpointed: cheap
                break
            trivial = active.join(nontrivial, "id", "left_anti")
            result = result.unionByName(
                trivial.select("id", F.col("id").alias("component"))
            ).localCheckpoint(eager=True)
            active = nontrivial
        if active.isEmpty():
            converged = True
            break
        # --- color: forward max-id propagation to fixpoint over the active
        # subgraph (every node ends with the max id that can reach it)
        ae = (
            edges.join(active.withColumnRenamed("id", "src"), "src")
            .join(active.withColumnRenamed("id", "dst"), "dst")
            .localCheckpoint(eager=True)
        )
        colors = active.select("id", F.col("id").alias("color"))
        colors = colors.localCheckpoint(eager=True)
        frontier = colors  # delta iteration: only changed colors propagate
        while True:
            inc = (
                ae.join(frontier.withColumnRenamed("id", "src")
                        .withColumnRenamed("color", "c_src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("c_src").alias("c_in"))
            )
            # checkpoint the merged table ONCE per round; frontier and the
            # next colors are cheap projections of it (previously the
            # inc-join was recomputed for both, doubling every round)
            merged = colors.join(inc, "id", "left").select(
                "id",
                "color",
                F.coalesce("c_in", F.lit(-1)).alias("c_in"),
            ).localCheckpoint(eager=True)
            frontier = merged.filter(F.col("c_in") > F.col("color")).select(
                "id", F.col("c_in").alias("color")
            )
            if frontier.isEmpty():  # cheap scan of the checkpointed table
                break
            colors = merged.select(
                "id", F.greatest("color", "c_in").alias("color")
            )
        # --- multi-source backward reach from ALL color roots at once,
        # restricted to same-color nodes: that is exactly the root's SCC
        roots = colors.filter(F.col("id") == F.col("color")).select("id", "color")
        members = roots.localCheckpoint(eager=True)
        frontier = members
        while True:
            nxt = (
                redges.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), "color")
                .distinct()
                .join(colors, ["id", "color"])  # same color only (also ⊆ active)
                .join(members.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            members = members.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        comp_label = members.groupBy("color").agg(F.min("id").alias("component"))
        result = result.unionByName(
            members.join(comp_label, "color").select("id", "component")
        ).localCheckpoint(eager=True)
        active = active.join(members.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        ae.unpersist()
        if active.isEmpty():
            converged = True
            break
    edges.unpersist()
    redges.unpersist()
    result.iterations = rounds
    result.did_converge = converged
    return result


def scc_tarjan(graph: Graph) -> DataFrame:
    """Exact iterative Tarjan on the driver → (id, component=min member id)."""
    pdf = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").toPandas()
    ids = [int(r["id"]) for r in graph.nodes.select("id").collect()]
    adj: dict[int, list[int]] = {i: [] for i in ids}
    for s, d in zip(pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)):
        if int(s) in adj:
            adj[int(s)].append(int(d))
    index = {}
    low = {}
    on_stack = set()
    stack: list[int] = []
    comp_of: dict[int, int] = {}
    counter = [0]

    for root in ids:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w_ in it:
                if w_ not in index:
                    index[w_] = low[w_] = counter[0]
                    counter[0] += 1
                    stack.append(w_)
                    on_stack.add(w_)
                    work.append((w_, iter(adj.get(w_, []))))
                    advanced = True
                    break
                elif w_ in on_stack:
                    low[v] = min(low[v], index[w_])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w_ = stack.pop()
                    on_stack.discard(w_)
                    members.append(w_)
                    if w_ == v:
                        break
                cid = min(members)
                for m in members:
                    comp_of[m] = cid
    spark = graph.nodes.sparkSession
    return spark.createDataFrame(
        sorted(comp_of.items()), "id long, component long"
    )
