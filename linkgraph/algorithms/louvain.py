"""Louvain community detection — `algo.louvain`.

Reference: `algo/.../impl/louvain/{Louvain,ModularityOptimization}.java`:
multi-level modularity optimization — local-move phase then graph
coarsening, repeated per level, optional seeding and
`includeIntermediateCommunities`.

Spark-native: the local-move phase runs **synchronous** rounds (all nodes
evaluate their best neighbor community against the previous round's state,
ties broken by min community id) — the reference's sequential sweeps are
order-dependent, so like LPA this is a deterministic variant of the same
optimization, not a bit-for-bit port. Coarsening is a groupBy contraction
(community → super-node). Modularity is computed exactly per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def _move_phase(edges: DataFrame, comm: DataFrame, m2: float, rounds: int) -> DataFrame:
    """Synchronous best-gain moves. edges: undirected both-direction rows."""
    # k_i: weighted degree per node (self-loops count double)
    k = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    stable = 0
    for rnd in range(rounds):
        # Σ_tot per community from previous assignment
        ktot = (
            comm.join(k, "id")
            .groupBy("comm")
            .agg(F.sum("k").alias("ktot"))
        )
        lbl = comm.select(F.col("id").alias("dst"), F.col("comm").alias("ncomm"))
        w_to = (
            edges.filter(F.col("src") != F.col("dst"))
            .join(lbl, "dst")
            .groupBy(F.col("src").alias("id"), "ncomm")
            .agg(F.sum("weight").alias("w_in"))
        )
        # eager materialization: `cand` feeds both `own` and `scored`; the
        # doubled join subtree sends Catalyst's join-selection planning into
        # a combinatorial blow-up on some shapes (observed wedged in
        # SizeInBytesOnlyStatsPlanVisitor) — a shallow scan keeps every
        # planning unit trivial
        cand = (
            w_to.join(comm, "id")
            .join(k, "id")
            .join(ktot.withColumnRenamed("comm", "ncomm").withColumnRenamed("ktot", "ntot"), "ncomm")
            .join(ktot, "comm")
        ).localCheckpoint(eager=True)
        # gain of moving i from comm → ncomm (standard Louvain delta, constant
        # terms dropped): w_in(ncomm) − k_i·Σtot(ncomm)/2m, compared against
        # staying: w_in(own) − k_i·(Σtot(own)−k_i)/2m
        own = cand.filter(F.col("ncomm") == F.col("comm")).select(
            "id", F.col("w_in").alias("w_own")
        )
        scored = (
            cand.join(own, "id", "left")
            .withColumn("w_own", F.coalesce("w_own", F.lit(0.0)))
            .withColumn(
                "gain",
                (F.col("w_in") - F.col("k") * F.col("ntot") / F.lit(m2))
                - (
                    F.col("w_own")
                    - F.col("k") * (F.col("ktot") - F.col("k")) / F.lit(m2)
                ),
            )
            .filter(F.col("ncomm") != F.col("comm"))
        )
        win = Window.partitionBy("id").orderBy(F.desc("gain"), F.asc("ncomm"))
        best = (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter((F.col("_rn") == 1) & (F.col("gain") > 1e-12))
            # parity alternation: symmetric pairs would otherwise swap
            # communities every synchronous round and oscillate forever
            .filter(F.pmod(F.col("id"), F.lit(2)) == rnd % 2)
            .select("id", F.col("ncomm").alias("new_comm"))
        )
        new_comm = (
            comm.join(best, "id", "left")
            .select("id", F.coalesce("new_comm", "comm").alias("comm"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_comm.alias("n")
            .join(comm.alias("o"), "id")
            .filter(F.col("n.comm") != F.col("o.comm"))
            .limit(1)
            .count()
        )
        comm = new_comm
        # converged only when BOTH parities pass without a move
        stable = stable + 1 if changed == 0 else 0
        if stable >= 2:
            break
    return comm


def modularity(edges_und: DataFrame, comm: DataFrame, m2: float) -> float:
    """Exact Q for an undirected both-direction edge table."""
    lbl_s = comm.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
    lbl_d = comm.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
    w_in = (
        edges_und.join(lbl_s, "src")
        .join(lbl_d, "dst")
        .filter(F.col("cs") == F.col("cd"))
        .agg(F.sum("weight"))
        .first()[0]
        or 0.0
    )
    k = edges_und.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    ktot = (
        comm.join(k, "id").groupBy("comm").agg(F.sum("k").alias("kt"))
    )
    sq = ktot.agg(F.sum(F.col("kt") * F.col("kt"))).first()[0] or 0.0
    return w_in / m2 - sq / (m2 * m2)


def louvain(
    graph: Graph,
    max_levels: int = 5,
    move_rounds: int = 10,
    seed_col: str | None = None,
    include_intermediate: bool = False,
):
    """→ (id, community) [+ .levels list of per-level assignments].

    Runs move+coarsen until modularity stops improving or max_levels.
    """
    und = graph.undirected_edges().filter(F.col("src") != F.col("dst"))
    # both-direction rows: Σ weights = 2m
    m2 = und.agg(F.sum("weight")).first()[0] or 1.0
    nodes = graph.nodes
    if seed_col is not None and seed_col in nodes.columns:
        comm = nodes.select(
            "id", F.coalesce(F.col(seed_col).cast("long"), F.col("id")).alias("comm")
        )
    else:
        comm = nodes.select("id", F.col("id").alias("comm"))
    comm = comm.localCheckpoint(eager=True)

    mapping = comm  # id -> current community in ORIGINAL id space
    cur_edges = und
    levels = []
    prev_q = modularity(und, mapping, m2)
    for _ in range(max_levels):
        cur_comm = mapping.select(F.col("comm").alias("id")).distinct().select(
            "id", F.col("id").alias("comm")
        ) if levels else comm
        moved = _move_phase(cur_edges, cur_comm, m2, move_rounds)
        # compose: original id -> super-node -> new community
        moved_map = moved.select(
            F.col("id").alias("comm_key"), F.col("comm").alias("newc")
        )
        mapping = (
            mapping.join(moved_map, mapping.comm == moved_map.comm_key)
            .select("id", F.col("newc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        q = modularity(und, mapping, m2)
        levels.append(mapping)
        if q <= prev_q + 1e-9:
            break
        prev_q = q
        # coarsen: contract communities into super-nodes
        lbl_s = mapping.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        lbl_d = mapping.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        cur_edges = (
            und.join(lbl_s, "src")
            .join(lbl_d, "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
    result = mapping.select("id", F.col("comm").alias("community"))
    result.levels = levels if include_intermediate else None
    result.final_modularity = prev_q
    return result
