"""Multi-source BFS + closeness/harmonic centrality.

Reference: `core/src/main/java/org/neo4j/graphalgo/core/utils/msbfs/
MultiSourceBFS.java` (bitset-parallel ANP, Then et al. VLDB'15) consumed by
`algo/.../impl/closeness/{MSClosenessCentrality,HarmonicCentrality,
DangalchevClosenessCentrality}.java`.

Spark-native form: the frontier is a DataFrame (node, source_bits) where
source_bits is an int64 bitset chunk of ≤64 concurrent sources; levels are
synchronized by the driver loop; the combine is ``groupBy(node).agg(bit_or)``
— the exact DataFrame analogue of ANP's bitwise frontier union. Sources are
processed in batches of 64; per-level per-node distances accumulate into
the centrality sums via popcount(newly visited bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _popcount(col):
    return F.bit_count(col).cast("long")


def _bit(j: int) -> int:
    """Signed-int64 bit literal (bit 63 = the sign bit)."""
    return (1 << j) if j < 63 else -(1 << 63)


def msbfs_distance_sums(
    graph: Graph,
    direction: str = "BOTH",
    max_depth: int | None = None,
    mode: str = "closeness",
) -> DataFrame:
    """→ (id, reachable, dist_sum) per node over all sources (exact BFS).

    mode='closeness': dist_sum = Σ d;  'harmonic': Σ 1/d;  'dangalchev':
    Σ 2^-d. Runs ⌈n/64⌉ bitset batches of parallel BFS levels.
    """
    if direction == "BOTH":
        edges = graph.undirected_edges().select("src", "dst")
    else:
        edges = graph.edges.select("src", "dst")
    edges = edges.filter(F.col("src") != F.col("dst")).persist()
    nodes = graph.nodes.select("id").persist()
    ids = [r["id"] for r in nodes.collect()]
    spark = nodes.sparkSession

    acc = nodes.select(
        "id", F.lit(0).cast("long").alias("reachable"), F.lit(0.0).alias("dist_sum")
    ).localCheckpoint(eager=True)

    for lo in range(0, len(ids), 64):
        batch = ids[lo : lo + 64]
        bits_df = spark.createDataFrame(
            [(int(node), _bit(j)) for j, node in enumerate(batch)], "id long, bits long"
        )
        visited = bits_df.withColumnRenamed("bits", "vbits")
        frontier = bits_df
        depth = 0
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            nxt = (
                edges.join(frontier, edges.src == frontier.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.expr("bit_or(bits)").alias("nbits"))
            )
            # new bits = reached minus already-visited
            nxt = (
                nxt.join(visited, "id", "left")
                .select(
                    "id",
                    F.expr("nbits & ~coalesce(vbits, 0L)").alias("bits"),
                )
                .filter(F.col("bits") != 0)
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            if mode == "harmonic":
                inc = _popcount(F.col("bits")).cast("double") / depth
            elif mode == "dangalchev":
                inc = _popcount(F.col("bits")).cast("double") * F.pow(
                    F.lit(2.0), F.lit(-float(depth))
                )
            else:
                inc = _popcount(F.col("bits")).cast("double") * depth
            delta = nxt.select(
                "id", _popcount(F.col("bits")).alias("r_inc"), inc.alias("d_inc")
            )
            acc = (
                acc.join(delta, "id", "left")
                .select(
                    "id",
                    (F.col("reachable") + F.coalesce("r_inc", F.lit(0))).alias("reachable"),
                    (F.col("dist_sum") + F.coalesce("d_inc", F.lit(0.0))).alias("dist_sum"),
                )
                .localCheckpoint(eager=True)
            )
            visited = (
                visited.join(nxt, "id", "outer")
                .select(
                    "id",
                    F.expr("coalesce(vbits, 0L) | coalesce(bits, 0L)").alias("vbits"),
                )
                .localCheckpoint(eager=True)
            )
            frontier = nxt
    edges.unpersist()
    nodes.unpersist()
    return acc


def closeness_centrality(
    graph: Graph, improved: bool = False, direction: str = "BOTH"
) -> DataFrame:
    """`algo.closeness` — MSClosenessCentrality semantics.

    Standard: C(v) = (n−1) / Σ d(v,·) over reachable targets.
    improved (Wasserman–Faust): scaled by (reachable / (n−1)).
    Unreachable/isolated → 0.
    """
    acc = msbfs_distance_sums(graph, direction=direction, mode="closeness")
    n = graph.nodes.count()
    base = F.when(
        F.col("dist_sum") > 0, (F.lit(float(n - 1))) / F.col("dist_sum")
    ).otherwise(0.0)
    if improved:
        score = F.when(
            F.col("dist_sum") > 0,
            (F.col("reachable").cast("double") / F.lit(float(max(n - 1, 1))))
            * (F.col("reachable").cast("double") / F.col("dist_sum")),
        ).otherwise(0.0)
    else:
        score = base
    return acc.select("id", score.alias("centrality"))


def harmonic_centrality(graph: Graph, direction: str = "BOTH") -> DataFrame:
    """`algo.closeness.harmonic` — C(v) = Σ 1/d(v,u) / (n−1)."""
    acc = msbfs_distance_sums(graph, direction=direction, mode="harmonic")
    n = graph.nodes.count()
    return acc.select(
        "id", (F.col("dist_sum") / F.lit(float(max(n - 1, 1)))).alias("centrality")
    )


def dangalchev_closeness(graph: Graph, direction: str = "BOTH") -> DataFrame:
    """`algo.closeness.dangalchev` — C(v) = Σ 2^−d(v,u)."""
    acc = msbfs_distance_sums(graph, direction=direction, mode="dangalchev")
    return acc.select("id", F.col("dist_sum").alias("centrality"))


def all_shortest_paths_stream(
    graph: Graph, direction: str = "BOTH", max_depth: int | None = None
) -> DataFrame:
    """`algo.allShortestPaths.stream` (unweighted) → (source, target, distance).

    MSBFS per 64-source batch; emits each reached (source,target) pair once
    at its BFS level.
    """
    if direction == "BOTH":
        edges = graph.undirected_edges().select("src", "dst")
    else:
        edges = graph.edges.select("src", "dst")
    edges = edges.filter(F.col("src") != F.col("dst")).persist()
    nodes = graph.nodes.select("id")
    ids = [r["id"] for r in nodes.collect()]
    spark = nodes.sparkSession
    outs = []
    for lo in range(0, len(ids), 64):
        batch = ids[lo : lo + 64]
        bits_df = spark.createDataFrame(
            [(int(node), _bit(j)) for j, node in enumerate(batch)], "id long, bits long"
        )
        src_map = spark.createDataFrame(
            [(j, int(node)) for j, node in enumerate(batch)], "bit int, source long"
        )
        visited = bits_df.withColumnRenamed("bits", "vbits")
        frontier = bits_df
        depth = 0
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            nxt = (
                edges.join(frontier, edges.src == frontier.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.expr("bit_or(bits)").alias("nbits"))
            )
            nxt = (
                nxt.join(visited, "id", "left")
                .select(
                    "id",
                    F.expr("nbits & ~coalesce(vbits, 0L)").alias("bits"),
                )
                .filter(F.col("bits") != 0)
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            hits = (
                nxt.select(
                    F.col("id").alias("target"),
                    F.explode(
                        F.expr(
                            "filter(transform(sequence(0, 63), "
                            "j -> CASE WHEN (bits & shiftleft(1L, j)) != 0 THEN j END), "
                            "x -> x IS NOT NULL)"
                        )
                    ).alias("bit"),
                )
                .join(src_map, "bit")
                .select("source", "target", F.lit(depth).cast("long").alias("distance"))
            )
            outs.append(hits.localCheckpoint(eager=True))
            visited = (
                visited.join(nxt, "id", "outer")
                .select(
                    "id",
                    F.expr("coalesce(vbits, 0L) | coalesce(bits, 0L)").alias("vbits"),
                )
                .localCheckpoint(eager=True)
            )
            frontier = nxt
    edges.unpersist()
    if not outs:
        return spark.createDataFrame([], "source long, target long, distance long")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
